package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner: exercises the driver's `SparkEntry.entry` contract
  * (flagship query on sf0.001, rows must be > 0) and prints a sample. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = false)
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
