package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // warm both paths once
    Similarity.cosineNearDup(emb, "vec_id", "embedding", "label", 0.3).count()
    Similarity.cosineNearDup(emb, "vec_id", "embedding", "label", 0.3, native = true).count()
    (1 to 3).foreach { i =>
      time(s"neardup fold   run$i")(
        Similarity.cosineNearDup(emb, "vec_id", "embedding", "label", 0.3).count())
      time(s"neardup native run$i")(
        Similarity.cosineNearDup(emb, "vec_id", "embedding", "label", 0.3, native = true).count())
    }
    spark.stop()
  }
}
