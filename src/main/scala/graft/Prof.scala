package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.GraphStore

/** Scratch profiling main (not part of the driver contract). */
object Prof {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    sys.props("graft.verbose") = "1"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = GraphStore.get(spark, dir)
    val e = g.E.filter(col("label") === "in").select(col("src"), col("dst"))
    val frontier = g.V.select(col("id").as("origin"), col("id").as("node"))
    val j = frontier.join(e, frontier("node") === e("src"))
      .select(col("origin"), col("dst").as("node"))
    println("=== iter-1 hop join plan ===")
    j.explain("formatted")
    time("iter1 join count")(j.count())
    time("reachFix full")(g.reachFix(g.V, dedupStart = false).count())
    spark.stop()
  }
}
