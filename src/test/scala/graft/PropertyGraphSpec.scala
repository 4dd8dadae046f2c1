package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.PropertyGraph

/** Upsert idempotence (the invariant the reference's guards intend but
  * partially break, main.go:587-588/678-679), drop cascade, subgraph,
  * existence probes. */
class PropertyGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def g0 = PropertyGraph(
    Seq(
      (1L, "user", "a", Map("e" -> "a@x")),
      (2L, "group", "g1", Map.empty[String, String]),
      (3L, "role", "r1", Map.empty[String, String]))
      .toDF("id", "label", "key", "props"),
    Seq((1L, 2L, "in", 1), (2L, 3L, "in", 1)).toDF("src", "dst", "label", "weight"))

  test("upsertVertices is idempotent: same batch twice == once") {
    val batch = Seq(
      (1L, "user", "a", Map.empty[String, String]), // exists -> no-op
      (4L, "user", "b", Map.empty[String, String])) // fresh -> insert
      .toDF("id", "label", "key", "props")
    val once = g0.upsertVertices(batch)
    val twice = once.upsertVertices(batch)
    assert(once.vertices.count() == 4)
    assert(twice.vertices.count() == 4)
    // and the surviving row for (user,a) is the ORIGINAL, not the dup
    val props = twice.vertices.filter(col("key") === "a")
      .select("props").as[Map[String, String]].head()
    assert(props == Map("e" -> "a@x"))
  }

  test("upsertEdges is idempotent and keyed on (src,dst,label)") {
    val batch = Seq((1L, 2L, "in", 9), (1L, 3L, "in", 1)).toDF("src", "dst", "label", "weight")
    val once = g0.upsertEdges(batch)
    assert(once.edges.count() == 3)
    assert(once.upsertEdges(batch).edges.count() == 3)
    // existing (1,2,in) kept its original weight
    assert(once.edges.filter(col("src") === 1 && col("dst") === 2)
      .select("weight").as[Int].head() == 1)
  }

  test("dropVertices cascades incident edges, including NULL-pred rows") {
    val dropped = g0.dropVertices(col("props").getItem("e") === "a@x")
    assert(dropped.vertices.count() == 2) // NULL-pred rows kept
    assert(dropped.edges.count() == 1)    // 1->2 gone with vertex 1
  }

  test("subgraph keeps only edge-incident vertices") {
    val sg = g0.subgraph(col("src") === 1)
    assert(sg.vertices.select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(sg.edges.count() == 1)
  }

  test("existing/missing partition candidates by (label,key)") {
    val cand = Seq(("user", "a"), ("user", "zzz")).toDF("label", "key")
    assert(g0.existing(cand).count() == 1)
    assert(g0.missing(cand).count() == 1)
  }

  test("firstMatch is deterministic (min id)") {
    val g = PropertyGraph(
      Seq(
        (9L, "user", "x", Map("m" -> "v")),
        (4L, "user", "y", Map("m" -> "v")))
        .toDF("id", "label", "key", "props"),
      Seq.empty[(Long, Long, String, Int)].toDF("src", "dst", "label", "weight"))
    assert(g.firstMatch("user", "m", "v").select("id").as[Long].head() == 4L)
  }
}
