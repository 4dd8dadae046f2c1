package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.{PropertyGraph, Traversal}

/** Scratch verification driver (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Cycle A->B->C->A plus tail C->D; membership-cycle shape the reference
    // loops forever on (main.go:347).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst").withColumn("label", lit("in")).withColumn("weight", lit(1))
    val start = Seq(1L).toDF("id")
    println("== reachFix from {1} on cycle 1->2->3->1, 3->4 ==")
    Traversal.reachFix(edges, start).orderBy("origin", "node").show()
    println("== khop k=5 from {1} ==")
    Traversal.khop(edges, start, 5).orderBy("hop", "node").show()
    println("== reachFix maxIter=2 (must throw, not truncate) ==")
    try {
      Traversal.reachFix(edges, start, maxIter = 2).count()
      println("ERROR: no exception thrown")
    } catch { case e: IllegalStateException => println(s"OK threw: ${e.getMessage}") }

    // dropVertices with a NULL-producing predicate: vertex 2 lacks props key.
    val vs = Seq(
      (1L, "user", "a", Map("flag" -> "x")),
      (2L, "user", "b", Map.empty[String, String]),
      (3L, "user", "c", Map("flag" -> "y"))).toDF("id", "label", "key", "props")
    val es = Seq((1L, 2L, "in", 1), (2L, 3L, "in", 1)).toDF("src", "dst", "label", "weight")
    val g = PropertyGraph(vs, es).dropVertices(col("props").getItem("flag") === "x")
    println("== dropVertices(props['flag']='x'): kept vertices (want 2,3) ==")
    g.vertices.orderBy("id").show()
    println("== edges after cascade (want only 2->3) ==")
    g.edges.show()
    spark.stop()
  }
}
