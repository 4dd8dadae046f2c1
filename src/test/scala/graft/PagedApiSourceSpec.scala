package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 paginated-scan connector (B1). */
class PagedApiSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def read(pages: Int, pageSize: Int) =
    spark.read.format("graft.sources.PagedApiSource")
      .option("pages", pages).option("pageSize", pageSize).load()

  test("one partition per API page, pageSize rows each") {
    val df = read(pages = 8, pageSize = 25)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 200)
  }

  test("rows are deterministic and schema-complete") {
    val df = read(pages = 2, pageSize = 3)
    assert(df.columns.toSeq == Seq("email", "page", "idx", "isExternal"))
    val rows = df.orderBy("page", "idx").collect().map(r =>
      (r.getString(0), r.getInt(1), r.getInt(2), r.getBoolean(3))).toSeq
    assert(rows.head == ("user0@domain.example", 0, 0, true))
    assert(rows.last == ("user5@domain.example", 1, 2, false))
    assert(read(2, 3).orderBy("page", "idx").collect().toSeq ==
      df.orderBy("page", "idx").collect().toSeq)
  }

  test("feeds the standard upsert pipeline") {
    val users = read(2, 10).select(
      (lit(100L) + col("page") * 10 + col("idx")).as("id"),
      lit("user").as("label"), col("email").as("key"),
      map(lit("isExternal"), col("isExternal").cast("string")).as("props"))
    import spark.implicits._
    val g = graft.graph.PropertyGraph(
      Seq.empty[(Long, String, String, Map[String, String])].toDF("id", "label", "key", "props"),
      Seq.empty[(Long, Long, String, Int)].toDF("src", "dst", "label", "weight"))
      .upsertVertices(users)
    assert(g.vertices.count() == 20)
    assert(g.upsertVertices(users).vertices.count() == 20) // idempotent
  }
}
