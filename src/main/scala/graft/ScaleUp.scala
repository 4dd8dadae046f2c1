package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main (not part of the driver contract): materializes an N×
  * key-shifted replica of a testdata SF directory, used by the SCALE.md
  * scaling-exponent runs (`Bench` pointed at the output via
  * `SPARK_GRAFT_SF_DIR`).
  *
  * Replica r shifts every KEY column by r·10⁷ — one uniform stride, so FK
  * pairs stay consistent within a replica and the result is a valid 10×
  * corpus (10 disjoint FK universes). That matches how this star schema
  * genuinely scales: facts (orders/lineitem/events) grow linearly against
  * near-constant-depth dimension chains, so a disjoint-replica scale-up
  * preserves the real join/traversal cardinality growth. Keys stay far
  * below the 2^56 graph-label stride.
  *
  * `documents.text` is additionally vowel/consonant-rotated per replica
  * (deterministic, length-preserving, replica 0 byte-identical): without
  * it the scaled corpus would be 90% exact cross-replica duplicates and
  * the dedup family would measure a degenerate corpus, not a 10× one.
  * Embeddings replicate as-is — cross-replica identical vectors are
  * legitimate near-dup load for the ANN family.
  *
  * Usage: runMain graft.ScaleUp <srcSfDir> <outDir> <n>
  */
object ScaleUp {

  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val stride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, nStr) = args
    val n = nStr.toInt
    require(n >= 1 && n <= 100, s"replica count out of range: $n")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$srcDir/$t.parquet")
      val reps = base.withColumn("__r", explode(typedLit((0 until n).toArray)))
      val shifted = keys.foldLeft(reps)((df, k) =>
        df.withColumn(k,
          (col(k).cast("long") + col("__r") * stride).cast(base.schema(k).dataType)))
      val varied =
        if (t != "documents") shifted
        else {
          // per-replica letter rotation over a 10-letter alphabet: unique
          // for r in 0..9 per cycle; replica 0 is the identity
          val alpha = "abcdefghij"
          val rot = (0 until n).map(r => alpha.drop(r % 10) + alpha.take(r % 10))
          shifted.withColumn("text",
            (0 until n).foldLeft(lit(null).cast("string")) { (acc, r) =>
              when(col("__r") === r, translate(col("text"), alpha, rot(r)))
                .otherwise(acc)
            })
        }
      varied.drop("__r")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaleup] $t -> ${n}x")
    }
    spark.stop()
  }
}
