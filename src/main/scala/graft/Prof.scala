package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Prof {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    time("d_ngram_jaccard fresh")(
      SparkEntry.queries("d_ngram_jaccard")(spark, dir).count())
    time("d_ngram_jaccard again")(
      SparkEntry.queries("d_ngram_jaccard")(spark, dir).count())
    time("d_minhash_lsh fresh")(
      SparkEntry.queries("d_minhash_lsh")(spark, dir).count())
    spark.stop()
  }
}
