package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/annotation evaluation statistics over labeled corpora —
  * the read-outs a training-data pipeline runs after scoring documents
  * with a quality model or collecting rater labels. Both are kept fully
  * rational (integer sufficient statistics, one floored micro division)
  * so the scores are order-free and engine-exact, the same discipline as
  * [[graft.graph.Traversal.modularity]].
  *
  * Reference scope note: the reference (salrashid123/gsuites_gcp_graphdb)
  * has no evaluation surface; these belong to the training-data-pipeline
  * brief alongside the kNN/ANN-recall evals.
  */
object Eval {

  /** Exact ROC-AUC via the Mann–Whitney rank statistic with midrank tie
    * handling — the standard "does the score order positives above
    * negatives" check for a quality classifier. With P positives, N
    * negatives, and R2 = 2·Σ_{i∈pos} avgrank(score_i) (doubled so
    * midranks stay integral):
    * AUC = (R2 − 2·P(P+1)/2) / (2·P·N), emitted as
    * auc_micro = ⌊(R2 − P(P+1))·10⁶ / (2PN)⌋.
    *
    * Plan: one map-side-combinable groupBy collapses the input to its
    * DISTINCT SCORE VALUES (quantized scores ⇒ bounded cardinality — the
    * 100 TB knob: quantize harder if the score is continuous), then a
    * cumulative-count window over that small table computes each value's
    * strictly-less count. The window is unpartitioned by construction
    * (a global rank needs a global order) but runs over distinct values,
    * not rows. The U numerator is exact while P·N < 2⁶³ (≈3·10⁹ rows a
    * side — past that, stratify-sample first; the require names it).
    *
    * `labelCol` must be boolean. Returns ONE row:
    * (n_pos, n_neg, rank2_sum, auc_micro); auc_micro = 0 when either
    * class is empty (AUC undefined). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val per = df.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("cnt"), sum(col(labelCol).cast("long")).as("pos"))
    val w = Window.orderBy(col("s")).rowsBetween(Window.unboundedPreceding, -1)
    val ranked = per.withColumn("c_less", coalesce(sum(col("cnt")).over(w), lit(0L)))
    ranked
      .agg(
        coalesce(sum(col("pos")), lit(0L)).as("n_pos"),
        coalesce(sum(col("cnt") - col("pos")), lit(0L)).as("n_neg"),
        // doubled midrank mass at score s: every tied row has
        // avgrank = c_less + (cnt+1)/2, so 2·Σ over the pos rows here
        // = pos · (2·c_less + cnt + 1) — integral by construction.
        coalesce(sum(col("pos") * (lit(2L) * col("c_less") + col("cnt") + lit(1L))),
          lit(0L)).as("rank2_sum"))
      .withColumn("auc_micro",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(rank2_sum - n_pos * (n_pos + 1)) * 1000000L div (2 * n_pos * n_neg)"))
          .otherwise(lit(0L)))
  }

  /** Reciprocal-rank read-out for ranked retrieval (the MRR building
    * block): `ranked` holds (query, doc, rank) rows — rank 1-based and
    * deterministic upstream (every ranker in this engine tie-breaks on
    * id) — and `relevant` holds (query, doc) relevance pairs. Per query
    * with at least one retrieved row: the FIRST relevant rank (0 when no
    * relevant doc was retrieved) and rr_micro = ⌊10⁶ / first_rank⌋,
    * exact. The corpus never enters: both inputs are top-k result
    * tables, so every join and aggregate is bounded by k·|queries|. The
    * mean over queries is one more tiny aggregate, left to the caller so
    * the per-query rows stay inspectable. */
  def mrr(ranked: DataFrame, relevant: DataFrame, queryCol: String,
          docCol: String, rankCol: String): DataFrame = {
    val firsts = ranked.join(relevant, Seq(queryCol, docCol), "left_semi")
      .groupBy(col(queryCol)).agg(min(col(rankCol)).cast("long").as("first_rank"))
    ranked.select(col(queryCol)).distinct()
      .join(firsts, Seq(queryCol), "left")
      .select(col(queryCol), coalesce(col("first_rank"), lit(0L)).as("first_rank"))
      .withColumn("rr_micro",
        when(col("first_rank") > 0, expr("1000000L div first_rank"))
          .otherwise(lit(0L)))
  }

  /** Precision@k / recall@k for ranked retrieval — [[mrr]]'s set-overlap
    * siblings, fully integral: per query, hits = |relevant ∩ top-k|,
    * p_at_k_micro = ⌊10⁶·hits/k⌋, recall_micro = ⌊10⁶·hits/n_rel⌋
    * (0 when the query has no relevant docs at all). `ranked` must
    * already be cut to the top `k` (this function trusts, it does not
    * re-rank); both inputs are result-table-sized, the corpus never
    * enters. Returns (query, n_rel, hits, p_at_k_micro, recall_micro)
    * for every query with ≥ 1 retrieved row. */
  def precisionRecallAtK(ranked: DataFrame, relevant: DataFrame,
                         queryCol: String, docCol: String, k: Int): DataFrame = {
    require(k >= 1, s"precisionRecallAtK needs k >= 1, got $k")
    val hits = ranked.join(relevant, Seq(queryCol, docCol), "left_semi")
      .groupBy(col(queryCol)).agg(count(lit(1)).as("hits"))
    val nrel = relevant.groupBy(col(queryCol)).agg(count(lit(1)).as("n_rel"))
    ranked.select(col(queryCol)).distinct()
      .join(hits, Seq(queryCol), "left")
      .join(nrel, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("p_at_k_micro", expr(s"hits * 1000000L div ${k}L"))
      .withColumn("recall_micro",
        when(col("n_rel") > 0, expr("hits * 1000000L div n_rel"))
          .otherwise(lit(0L)))
  }

  /** Decile lift/gains table — "how concentrated are the positives in
    * the top score deciles", the standard read-out for a quality model
    * used to RANK training documents rather than hard-threshold them.
    * Rows are split into `buckets` equal-frequency bins by
    * (score DESC, id) — the id tie-break makes the ntile deterministic,
    * so both engines assign identical bins. Per bucket, with corpus
    * totals N and P:
    * lift_micro = ⌊n_pos·N·10⁶ / (n·P)⌋ (1.0 ⇒ 10⁶ = no lift) and the
    * cumulative gain ⌊cum_pos·10⁶ / P⌋ — all integer sufficient
    * statistics, one floored division each.
    *
    * Plan: one unpartitioned ntile window (a global equal-frequency
    * split needs a global order — at 100 TB, pre-quantize the score and
    * use the [[Sketch.exactQuantiles]] thresholds instead of a window),
    * then a `buckets`-row aggregate and a tiny cumulative window. */
  def liftDeciles(df: DataFrame, scoreCol: String, labelCol: String,
                  idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"liftDeciles needs buckets >= 2, got $buckets")
    val w = Window.orderBy(col(scoreCol).desc, col(idCol))
    val binned = df.select(col(scoreCol), col(idCol),
        col(labelCol).cast("long").as("pos"))
      .withColumn("bucket", ntile(buckets).over(w).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
    val tot = binned.agg(sum(col("n")).as("n_total"),
      sum(col("n_pos")).as("p_total"))
    val cum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // n_pos·n_total·10⁶ wraps a BIGINT past ~3M rows — widen through
    // DECIMAL(38,0) (div on decimals still floors and returns LONG;
    // DuckDB's HUGEINT // does the same on the oracle side).
    binned.crossJoin(broadcast(tot))
      .withColumn("cum_pos", sum(col("n_pos")).over(cum))
      .select(col("bucket"), col("n"), col("n_pos"),
        when(col("p_total") > 0,
          expr("CAST(n_pos AS DECIMAL(38,0)) * n_total * 1000000" +
            " div (CAST(n AS DECIMAL(38,0)) * p_total)"))
          .otherwise(lit(0L)).as("lift_micro"),
        when(col("p_total") > 0,
          expr("CAST(cum_pos AS DECIMAL(38,0)) * 1000000 div p_total"))
          .otherwise(lit(0L)).as("cum_gain_micro"))
  }

  /** Per-class precision / recall / F1 from a confusion-cell table
    * (`truthCol`, `predCol`, `nCol` = cell count) — [[cohenKappa]]'s
    * class-resolved sibling, and fully integral: F1's 2pr/(p+r) algebra
    * reduces to 2·tp / (2·tp + fp + fn), so no float ever appears.
    * Classes are taken from the TRUTH margin (a predicted-only class has
    * recall undefined and no row here; its errors still count as fp=0
    * fn>0 on the true classes). Micro divisions floor; all-zero
    * denominators emit 0. */
  def f1PerClass(cells: DataFrame, truthCol: String, predCol: String,
                 nCol: String): DataFrame = {
    val tp = cells.filter(col(truthCol) === col(predCol))
      .groupBy(col(truthCol).as("clazz")).agg(sum(col(nCol)).as("tp"))
    val truthN = cells.groupBy(col(truthCol).as("clazz"))
      .agg(sum(col(nCol)).as("truth_n"))
    val predN = cells.groupBy(col(predCol).as("clazz"))
      .agg(sum(col(nCol)).as("pred_n"))
    truthN
      .join(tp, Seq("clazz"), "left")
      .join(predN, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("pred_n"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (col("truth_n") - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("prec_micro",
        when(col("tp") + col("fp") > 0, expr("tp * 1000000L div (tp + fp)"))
          .otherwise(lit(0L)))
      .withColumn("rec_micro",
        when(col("tp") + col("fn") > 0, expr("tp * 1000000L div (tp + fn)"))
          .otherwise(lit(0L)))
      .withColumn("f1_micro",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          expr("2 * tp * 1000000L div (2 * tp + fp + fn)"))
          .otherwise(lit(0L)))
  }

  /** Cohen's kappa from a confusion-cell table (`aCol` = one rater /
    * ground truth, `bCol` = the other rater / prediction, `nCol` = cell
    * count) — chance-corrected agreement for label-quality audits. With
    * total n, observed agreement A = Σ diag, and chance mass
    * C = Σ_k row_k·col_k:
    * κ = (n·A − C) / (n² − C), emitted as a sign-explicit micro division
    * (κ < 0 = worse-than-chance; truncation toward zero is spelled out
    * so Spark's `div` and an oracle's floor-division cannot disagree).
    *
    * Plan: two tiny marginal aggregates joined on the class key (classes
    * present on only one side contribute row·col = 0 and drop from the
    * inner join), one global aggregate — nothing scales past the class
    * count. Returns ONE row:
    * (n_total, agree, chance_num, kappa_num, kappa_den, kappa_micro);
    * kappa_micro = 0 when the denominator is 0 (a single class on both
    * sides — agreement is vacuous and κ undefined). */
  def cohenKappa(cells: DataFrame, aCol: String, bCol: String,
                 nCol: String): DataFrame = {
    val rows = cells.groupBy(col(aCol).as("k")).agg(sum(col(nCol)).as("row_n"))
    val cols = cells.groupBy(col(bCol).as("k")).agg(sum(col(nCol)).as("col_n"))
    val chance = rows.join(cols, Seq("k"))
      .agg(coalesce(sum(col("row_n") * col("col_n")), lit(0L)).as("chance_num"))
    cells
      .agg(
        coalesce(sum(col(nCol)), lit(0L)).as("n_total"),
        coalesce(sum(when(col(aCol) === col(bCol), col(nCol)).otherwise(0L)),
          lit(0L)).as("agree"))
      .crossJoin(broadcast(chance))
      .select(col("n_total"), col("agree"), col("chance_num"),
        (col("n_total") * col("agree") - col("chance_num")).as("kappa_num"),
        (col("n_total") * col("n_total") - col("chance_num")).as("kappa_den"))
      .withColumn("kappa_micro",
        when(col("kappa_den") === 0, lit(0L))
          .when(col("kappa_num") >= 0, expr("kappa_num * 1000000L div kappa_den"))
          .otherwise(-expr("(-kappa_num) * 1000000L div kappa_den")))
  }
}
