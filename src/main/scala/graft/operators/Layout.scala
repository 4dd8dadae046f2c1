package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * At 100 TB, scan pruning is the cheapest query optimization there is —
  * parquet row-group and file min/max stats skip data that was never
  * read. A sort on ONE column gives perfect pruning on that column and
  * none on any other; interleaving the bits of two columns into one
  * Z-value and sorting by it gives each file a small rectangle of BOTH
  * value spaces, so min/max pruning works on either predicate column
  * (the Delta/Iceberg `ZORDER BY` idea, computed with plain codegen'd
  * integer expressions — no UDF, no custom writer).
  *
  * All bit-twiddling is exact BIGINT arithmetic (shift/and/or on
  * non-negative 16-bit inputs), reproducible in any engine with integer
  * ops — including plain ANSI SQL.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (Morton spread):
    * bit i of the input lands at bit 2i. Classic magic-mask doubling —
    * 4 shift+mask rounds, all codegen'd integer ops on a BIGINT. Input
    * must be in [0, 65535] (caller clamps); masks are 64-bit-safe. */
  def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-value of two 16-bit dimensions: bits of `a` at even positions,
    * bits of `b` at odd — a 32-bit Morton code as BIGINT. Inputs are
    * clamped to [0, 65535] so out-of-range dimension values degrade to
    * edge cells instead of corrupting unrelated bits. */
  def zValue(a: Column, b: Column): Column = {
    def clamp(c: Column) = greatest(lit(0L), least(c.cast("long"), lit(65535L)))
    spread16(clamp(a)).bitwiseOR(shiftleft(spread16(clamp(b)), 1))
  }

  /** Z-order clustered write: range-partition on the Morton code, sort
    * inside each partition, write parquet — every output file then holds
    * a contiguous Z-interval, i.e. a small rectangle of BOTH dimension
    * spaces, and its parquet footer min/max prunes reads filtered on
    * EITHER column ([[zOrderCells]] is the pre-flight audit of exactly
    * these per-file ranges). `repartitionByRange` samples to pick the
    * boundaries — fine for a layout job (the written DATA is identical
    * regardless of where the cuts land; only file assignment varies).
    * The helper Z-column is projected away after the sort, so the files
    * carry the caller's schema untouched. */
  def zOrderWrite(df: DataFrame, dimA: Column, dimB: Column,
                  path: String, nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    df.withColumn("__z", zValue(dimA, dimB))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order layout audit: bucket rows by the high bits of their Z-value
    * (`cellBits` = number of low bits dropped; each surviving prefix is
    * one "file" under a `sortWithinPartitions(zval)` write) and report
    * each cell's row count and min/max of BOTH dimensions — exactly the
    * stats a parquet footer would carry. Tight per-cell ranges on both
    * columns = predicates on either dimension prune most cells; that the
    * ranges ARE tight is what this operator lets you verify before
    * committing a 100 TB rewrite. Output is one row per occupied cell,
    * all BIGINT, exact in any engine. */
  def zOrderCells(df: DataFrame, dimA: Column, dimB: Column,
                  cellBits: Int = 16): DataFrame = {
    require(cellBits >= 0 && cellBits <= 32, s"cellBits in [0,32], got $cellBits")
    df.select(dimA.cast("long").as("__a"), dimB.cast("long").as("__b"))
      .withColumn("zcell", shiftright(zValue(col("__a"), col("__b")), cellBits))
      .groupBy("zcell")
      .agg(count(lit(1)).as("n_rows"),
        min(col("__a")).as("min_a"), max(col("__a")).as("max_a"),
        min(col("__b")).as("min_b"), max(col("__b")).as("max_b"))
  }
}
