package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval × interval OVERLAP join for two LARGE interval sets — the
  * case `z2`'s broadcast range join cannot cover (there the band table is
  * dimension-sized; here both sides scale with the data, and the naive
  * overlap predicate `a.s <= b.e AND b.s <= a.e` plans as a
  * BroadcastNestedLoopJoin — O(|A|·|B|) comparisons).
  *
  * The standard distributed answer (genomics/ad-tech): fixed-width BIN
  * blocking. Every interval explodes to the bins it covers, candidates
  * equi-join on the bin (hash join, co-partitionable), duplicates from
  * pairs sharing several bins collapse via `distinct`, and the exact
  * overlap predicate filters bin-neighbors that don't actually touch.
  * Complete by construction: two overlapping intervals share at least one
  * bin that each covers.
  *
  * Scale notes:
  *   - `binWidth` trades explode factor (long intervals → many bins)
  *     against join fan-out (wide bins → more false candidates). Size it
  *     near the median interval length.
  *   - A HOT bin (many concurrent intervals) is not an LSH-style
  *     false-positive artifact: those pairs genuinely overlap, so the
  *     output itself is quadratic in peak concurrency. A cap would change
  *     the answer — if peak concurrency is unbounded, aggregate per bin
  *     instead of enumerating pairs.
  *   - Shuffle carries (bin, interval endpoints, payload) — intervals are
  *     scalars, so rows are narrow; both sides hash-partition on the bin.
  *
  * Contract: `a` carries (`aStart`, `aEnd`) plus payload columns, `b`
  * likewise; all column names must be disjoint across the two inputs.
  * Endpoints are inclusive longs in any consistent unit. Returns the
  * distinct joined rows (all columns of both sides) for every
  * genuinely-overlapping pair.
  */
object IntervalJoin {

  def overlapJoin(a: DataFrame, b: DataFrame, binWidth: Long,
                  aStart: String = "start", aEnd: String = "end",
                  bStart: String = "start2", bEnd: String = "end2"): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val dup = a.columns.toSet.intersect(b.columns.toSet)
    require(dup.isEmpty, s"input column names must be disjoint, both have: $dup")
    def binned(df: DataFrame, s: String, e: String) = df.withColumn("__bin",
      explode(sequence(expr(s"`$s` div $binWidth"), expr(s"`$e` div $binWidth"))))
    binned(a, aStart, aEnd)
      .join(binned(b, bStart, bEnd), Seq("__bin"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .drop("__bin")
      .distinct()
  }
}
