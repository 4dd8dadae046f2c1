package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, SparkSession => ClassicSparkSession}

/** Constraint-free rebuild of a (local)checkpointed DataFrame.
  *
  * `Dataset.localCheckpoint` copies the origin plan's constraints onto the
  * resulting `LogicalRDD`, rewriting them to the new output attributes —
  * but the rewrite can leave dangling references when the optimized plan's
  * attributes differ from the analyzed ones (non-nullable inputs make the
  * constraint set non-empty and expose it). Any later `Union` over such a
  * frame that an enclosing `Join` asks for constraints then dies in
  * `UnionBase.rewriteConstraints` with `key not found: <attr>`. Iterative
  * algorithms that union checkpointed per-round deltas and join against
  * the union (e.g. `graft.graph.Traversal.closureDoubling`) hit exactly
  * that shape.
  *
  * The rebuild wraps the checkpoint's already-materialized InternalRow RDD
  * in a fresh `LogicalRDD` with NO origin constraints/stats — zero copy,
  * no re-encoding — via `internalCreateDataFrame`, which is package-
  * private to `org.apache.spark.sql`; hence this shim lives in Spark's
  * namespace (the standard extension technique — no Spark internals are
  * modified).
  */
object CheckpointUtil {
  /** `df` must already be checkpoint/RDD-backed (its `queryExecution.toRdd`
    * must be the cached blocks, not a recomputation) — call directly on
    * the result of `localCheckpoint()`. */
  def dropConstraints(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession.asInstanceOf[ClassicSparkSession]
    spark.internalCreateDataFrame(classic.queryExecution.toRdd, df.schema)
  }
}
