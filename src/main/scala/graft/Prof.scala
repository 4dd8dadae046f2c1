package graft

import org.apache.spark.sql.SparkSession
import graft.graph.GraphStore

/** Scratch profiling main (not part of the driver contract).
  *
  * No args: the historical reachFix warm/cold timing loop.
  * `explain <gate> [<gate>…]`: print the formatted physical plan of the
  * named SparkEntry gates (the .explain audit loop — check broadcasts,
  * pushed filters, WholeStageCodegen spans).
  * `time <gate> [<gate>…]`: run the named gates 3× each, print seconds.
  */
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def resolve(names: List[String]): List[String] = {
      require(names.nonEmpty, "usage: explain|time <gate> [<gate>…]")
      val unknown = names.filterNot(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"unknown gate(s): ${unknown.mkString(", ")} " +
        s"(valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
      names
    }
    args.toList match {
      case "explain" :: names =>
        resolve(names).foreach { n =>
          println(s"\n========== $n ==========")
          SparkEntry.queries(n)(spark, dir).explain("formatted")
        }
      case "time" :: names =>
        resolve(names).foreach { n =>
          (1 to 3).foreach(i => time(s"$n run$i")(
            SparkEntry.queries(n)(spark, dir).count()))
        }
      case _ =>
        val g = GraphStore.get(spark, dir)
        (1 to 3).foreach { i =>
          time(s"reachFix run$i")(g.reachFix(g.V, dedupStart = false).count())
          spark.catalog.clearCache()
          GraphStore.invalidate(dir)
          GraphStore.get(spark, dir)
        }
    }
    spark.stop()
  }
}
