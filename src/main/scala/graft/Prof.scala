package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        if (dur > 1.0)
          println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%5d ${dur}%7.2f s  ${si.name.take(80)}")
      }
    })
    val g = time("GraphStore build+materialize")(GraphStore.get(spark, dir))
    val r = time("khop k=2 customers (store)")(g.reach(g.hasLabel("customer"), 2))
    time("khop count")(r.count())
    spark.stop()
  }
}
