package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.Hashing.md5Long

/** Engine-portable sketches. Spark's built-in approximations
  * (`approx_count_distinct` = HyperLogLog++) are fast but their results
  * depend on the engine's internal hash and register layout, so no other
  * system can reproduce them bit-for-bit. The sketches here trade a
  * little speed for determinism: they hash through md5 (see
  * [[graft.functions.Hashing]]) and use only order statistics + integer /
  * IEEE-double arithmetic, so any engine with md5 gets identical output —
  * the property the driver's DuckDB oracle (and any cross-system
  * validation pipeline) needs.
  */
object Sketch {

  /** Hash space size of [[md5Long]]: 2^60. (k-1)·M is exact in a double
    * whenever k-1 has ≤ 53 significant bits (63 has 6), so the estimator
    * below stays bit-deterministic for any practical k. */
  private val M: Double = math.pow(2, 60)

  /** The KMV estimate from a set of ≤ k smallest distinct hashes. Shared
    * by the Aggregator and declarative paths so both are bit-identical. */
  private def estimate(k: Int, nSeen: Int, hk: Long): Long =
    if (nSeen < k) nSeen.toLong
    else math.floor((k - 1).toDouble * M / hk.toDouble).toLong

  /** Sorted distinct k-minimum buffer. `vals` is ascending, length ≤ k. */
  case class KMinBuf(vals: Seq[Long])

  /** Typed Aggregator maintaining the k smallest DISTINCT hash values —
    * the scale path for [[kmvDistinct]]: partial aggregation keeps at most
    * k longs per (group, partition), so the exchange carries O(groups · k)
    * regardless of input size, and merge order cannot change the result
    * (the k-min set is order-independent). */
  class KMinDistinct(k: Int) extends Aggregator[Long, KMinBuf, Long] {
    override def zero: KMinBuf = KMinBuf(Vector.empty)

    override def reduce(b: KMinBuf, h: Long): KMinBuf = {
      val v = b.vals
      if (v.length >= k && h >= v.last) b // beyond the k-th min: irrelevant
      else {
        val i = insertionPoint(v, h)
        if (i < v.length && v(i) == h) b // duplicate hash: KMV is over distinct
        else {
          val grown = (v.take(i) :+ h) ++ v.drop(i)
          KMinBuf(if (grown.length > k) grown.take(k) else grown)
        }
      }
    }

    override def merge(a: KMinBuf, b: KMinBuf): KMinBuf =
      KMinBuf((a.vals ++ b.vals).distinct.sorted.take(k))

    override def finish(b: KMinBuf): Long =
      estimate(k, b.vals.length, if (b.vals.length < k) 0L else b.vals.last)

    override def bufferEncoder: Encoder[KMinBuf] = Encoders.product[KMinBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong

    private def insertionPoint(v: Seq[Long], h: Long): Int = {
      var lo = 0; var hi = v.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (v(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }
  }

  /** [[kmvDistinct]] via the bounded-state [[KMinDistinct]] Aggregator —
    * identical output (same k-min set ⇒ same estimate), but shuffle volume
    * is O(groups · k) instead of all distinct hashes: the form to run at
    * 100 TB. */
  def kmvDistinctAgg(df: DataFrame, groupCol: String, keyCol: String,
                     k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val kmv = udaf(new KMinDistinct(k), Encoders.scalaLong)
    df.select(col(groupCol), md5Long(col(keyCol)).as("__h"))
      .groupBy(col(groupCol))
      .agg(kmv(col("__h")).as("est_distinct"))
  }

  /** KMV (k-minimum-values) distinct-count estimate per group.
    *
    * The k-th smallest of n uniform hashes on [0, M) sits near k·M/n, so
    * n ≈ (k-1)·M / h₍ₖ₎ (the unbiased KMV estimator). Groups with fewer
    * than k distinct hashes report their exact distinct count — the
    * sketch is only approximate past its memory budget, like any KMV.
    *
    * Scale: the per-group state is the k smallest hashes, never the
    * distinct set. The `(group, hash)` dedup + rank is one exchange on
    * `group`; at 100 TB the dedup's partial aggregation collapses
    * repeats map-side, so the shuffle carries at most the distinct
    * hashes (a true implementation-at-scale would keep a bounded k-heap
    * per partition via an Aggregator; the plan here expresses the same
    * semantics declaratively and lets Tungsten aggregate).
    *
    * Estimator arithmetic is floor((k-1)·2^60 / h₍ₖ₎) computed in IEEE
    * doubles — both factors convert exactly or round identically in any
    * IEEE engine, so results are reproducible bit-for-bit. */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val hashed = df.select(col(groupCol).as("grp"), md5Long(col(keyCol)).as("h")).distinct()
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k) // everything past the k-th min is irrelevant
      .groupBy(col("grp"))
      .agg(max(col("rn")).as("n_seen"), max(when(col("rn") === k, col("h"))).as("hk"))
      .select(col("grp").as(groupCol),
        when(col("n_seen") < k, col("n_seen").cast("long"))
          .otherwise(floor(lit((k - 1).toDouble) * lit(M) / col("hk").cast("double")).cast("long"))
          .as("est_distinct"))
  }
}
