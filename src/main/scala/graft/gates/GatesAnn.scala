package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphBuilder, GraphStore, PropertyGraph}

/** Embedding similarity gates (brute-force/LSH/IVF/PQ ANN, quantization, k-means, recall evals, serving paths).
  *
  * Split from the former single-object SparkEntry (round 14) — a pure
  * refactor: every entry body is byte-identical, gate names and oracle
  * SQL unchanged; [[SparkEntry]] composes the family maps back together.
  */
private[graft] object GatesAnn extends GateFamily {
  import GateSupport._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force exact cosine top-5 for a small query set (ANN baseline).
    "e1_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // Hard-negative mining (DPR/SimCSE data prep): per query the 5
    // hardest in-band negatives — cos in [0.15, 0.35), i.e. above the
    // easy-negative floor (~p90 of this corpus's cosine mass, so ~90%
    // of pairs drop BEFORE the top-k shuffle) and below the suspected-
    // positive ceiling. Broadcast queries, one corpus pass, fused
    // native cosine.
    "e16_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.hardNegatives(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, floor = 0.15, ceil = 0.35, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // Binary-quantized ANN: sign-bit signatures (64 dims → two packed
    // 32-bit words, a 32× memory cut vs float32) generate 20 Hamming
    // candidates per query, exact cosine reranks to top 5 — the
    // candidate scan never touches a float vector, the scale path for a
    // RAM-resident index over a 100 TB embedding corpus. Hamming is kept
    // in-row so e10-style recall audits can see why a miss missed.
    "e22_binary_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.hammingRerank(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, candidates = 20, k = 5, native = true)
    }),

    // IVF recall-vs-nprobe curve: the SAME deterministic iters=0 index
    // probed at nprobe ∈ {1, 2, 4}, each sweep point summarized as
    // corpus recall vs the exact top-3 — the dial chart an operator
    // reads before picking the serving nprobe (e4b fixes one point;
    // this prices the whole dial). Index builds once; three probes
    // share it.
    "e24_nprobe_curve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 20)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 3, native = true)
      val (cent, lists) = operators.Similarity.buildIvfIndex(
        emb, "vec_id", "embedding", nlist = 8, iters = 0)
      Seq(1, 2, 4).map { np =>
        val ap = operators.Similarity.ivfQueryIndex(
          cent, lists, qs, "vec_id", "embedding", k = 3, nprobe = np,
          native = true)
        operators.Similarity.annRecall(exact, ap)
          .agg(coalesce(sum(col("n_exact")), lit(0L)).as("n_exact"),
            coalesce(sum(col("n_hit")), lit(0L)).as("n_hit"))
          .select(lit(np.toLong).as("nprobe"), col("n_exact"), col("n_hit"),
            expr("n_hit * 1000000L div n_exact").as("recall_ppm"))
      }.reduce(_ unionByName _)
    }),

    // The binary path's OTHER dial: recall vs candidate-pool size at
    // fixed 64 bits — candidates ∈ {10, 20, 40}, one corpus-recall row
    // per point. Completes the ANN price-chart trio (e21: descent
    // rounds, e24: IVF nprobe, e25: Hamming pool) — each dial costs
    // integer work only until the rerank, so widening the pool is the
    // cheap recall lever.
    "e25_candidates_curve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5, native = true)
      Seq(10, 20, 40).map { c =>
        val ap = operators.Similarity.hammingRerank(
          emb, qs, "vec_id", "embedding", dim = 64, candidates = c, k = 5,
          native = true)
        operators.Similarity.annRecall(exact, ap)
          .agg(coalesce(sum(col("n_exact")), lit(0L)).as("n_exact"),
            coalesce(sum(col("n_hit")), lit(0L)).as("n_hit"))
          .select(lit(c.toLong).as("candidates"), col("n_exact"), col("n_hit"),
            expr("n_hit * 1000000L div n_exact").as("recall_ppm"))
      }.reduce(_ unionByName _)
    }),

    // Recall audit of the binary-quantized path (the e10 pattern): e22's
    // sign-bit Hamming candidates + cosine rerank vs the exact top-5 —
    // the number that prices the 32× memory cut in recall. Per-query
    // (n_exact, n_hit, recall) over the same 10 queries.
    "e23_binary_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5, native = true)
      val approx = operators.Similarity.hammingRerank(
        emb, qs, "vec_id", "embedding", dim = 64, candidates = 20, k = 5,
        native = true)
      operators.Similarity.annRecall(exact, approx)
    }),

    // kNN classifier eval: majority label of the 5 nearest corpus
    // neighbors vs the true label, per-label accuracy over a
    // deterministic 20% eval slice — the training-free embedding-quality
    // probe (see Similarity.knnClassify).
    "e13_knn_classify" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.knnClassify(
        emb, emb.filter(col("vec_id") % 10 < 2), "vec_id", "embedding", "label",
        k = 5, native = true)
    }),

    // Random-hyperplane LSH ANN: bucketed candidates, top-3 per query.
    "e2_lsh_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.lshTopK(
        emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding", k = 3, bits = 4, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // NN-descent k-NN graph (graph-based ANN — the family HNSW lives in):
    // md5-block seed graph, ONE neighbors-of-neighbors refinement round,
    // exact rescoring. Deterministic end-to-end, so the oracle replays the
    // whole descent; O(N·k²) per round where all-pairs is O(N²).
    "e20_nn_descent" -> ((s, dir) => {
      operators.Similarity.nnDescentTopK(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 5, blocks = 16, rounds = 1, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // IVF ANN with the Lloyd-iterated float quantizer, SELF-EVALUATING
    // (the cd7 pattern): float centroid means make the per-query result
    // set engine-specific, so the gate scores it against the exact
    // brute-force top-k computed in the same plan and emits the recall
    // VERDICT — recall_ok flips (and the hash breaks) if probing 2 of 8
    // Lloyd cells ever recalls under 40% of the true top-3 (measured 55%
    // on the synthetic near-random embeddings at every SF; the bound
    // leaves 9 hits of float-summation-order slack). e4b keeps the
    // hash-exact per-row form on the seed-pinned (iters=0) quantizer.
    "e4_ivf_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 20)
      val approx = operators.Similarity.ivfTopK(
        emb, qs, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 2, native = true)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 3, native = true)
      operators.Similarity.annRecall(exact, approx)
        .agg(count(lit(1)).as("n_queries"), sum(col("n_exact")).as("n_exact"),
          (sum(col("n_hit")) * 5 >= sum(col("n_exact")) * 2).as("recall_ok"))
    }),

    // Deterministic IVF twin of e4 (the x2→x4 pattern): iters=0 pins the
    // coarse quantizer to the md5-seeded input vectors — exact doubles,
    // no float centroid means — so probe-and-rescore is hash-checkable
    // cross-engine while e4 keeps the Lloyd-iterated float form.
    "e4b_ivf_fixed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.ivfTopK(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 2, iters = 0, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // IVF index persisted AS TABLES and served from disk: build once
    // (iters=0 deterministic quantizer), write centroids + cid-
    // partitioned inverted lists to parquet, reload, query through the
    // reloaded index. Hash-matched against the SAME independent DuckDB
    // IVF replay as the in-memory e4b — proving the parquet round trip
    // (array<double> is lossless) and the partition-pruned serving path
    // (nprobe cells = nprobe directories) end to end.
    "e17_ivf_index_persist" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (centroids, lists) = operators.Similarity.buildIvfIndex(
        emb, "vec_id", "embedding", nlist = 8, iters = 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft-e17").toString
      centroids.write.mode("overwrite").parquet(s"$tmp/centroids")
      lists.write.mode("overwrite").partitionBy("cid").parquet(s"$tmp/lists")
      operators.Similarity.ivfQueryIndex(
        s.read.parquet(s"$tmp/centroids"), s.read.parquet(s"$tmp/lists"),
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, nprobe = 2, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // Product-quantization codes: m=4 subspaces x k=16 deterministic
    // (md5-seeded, iters=0) centroids — integer codes, hash-exact in any
    // engine; the compression half of the IVF+PQ serving architecture.
    // Gate emits the flat (vec_id, sub, code) triples (the e6 posexplode
    // convention: scalar rows at the gate boundary; pqCodes keeps the
    // array form for API callers).
    "e7_pq_codes" -> ((s, dir) => {
      operators.Similarity.pqCodesFlat(t(s, dir, "embeddings"), "vec_id", "embedding")
    }),

    // IVF + PQ asymmetric-distance search (FAISS IVFADC shape): probe 2
    // of 8 coarse cells, score candidates by query-subvector-to-codebook
    // reconstruction distance folded in subspace order (deterministic).
    "e8_ivfpq_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.ivfPqTopK(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", kTop = 3)
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
    }),

    // Nearest-class-centroid assignment: exact integer micro-unit class
    // means (labelCentroids) + argmin squared-L2 per vector — the
    // label-purity audit, engine-exact end to end.
    "e9_centroid_assign" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = operators.Clustering.labelCentroids(emb, "embedding", "label")
      operators.Clustering.nearestCentroid(emb, cents, "vec_id", "embedding", "label")
    }),

    // One deterministic Lloyd update step (integer micro-units): seed from
    // class means, re-assign, emit each predicted cluster's re-computed
    // centroid as (clabel, dim, cv) — the oracle-able core of IVF codebook
    // training (kmeansLite is the float production twin).
    "e12_lloyd_step" -> ((s, dir) => {
      operators.Clustering.lloydStep(t(s, dir, "embeddings"), "vec_id", "embedding", "label")
    }),

    // ANN recall@5: LSH (bits=4) top-5 measured against the exact
    // brute-force top-5 over the same queries — the index-quality
    // evaluation, one row per query.
    "e10_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5, native = true)
      val approx = operators.Similarity.lshTopK(
        emb, qs, "vec_id", "embedding", k = 5, bits = 4, native = true)
      operators.Similarity.annRecall(exact, approx)
    }),

    // Estimator-quality audit for the descent (the e10 pattern): the
    // descent runs over the FULL corpus; the exact ground truth is built
    // for a deterministic md5 quarter-sample of queries (the x22b
    // sampled-pivot precedent — exact all-queries ground truth is the one
    // O(N²) term in the audit, and a fixed-hash sample keeps the estimate
    // unbiased and engine-reproducible). One summary row in integer micro
    // units: the number that says whether one round of neighbors-of-
    // neighbors is enough at this corpus, or more rounds are worth their
    // shuffles.
    "e21_nnd_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(
        graft.functions.Hashing.md5Long(col("vec_id"), 101) % 4 === 0)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5, native = true)
      val approx = operators.Similarity.nnDescentTopK(
        emb, "vec_id", "embedding", k = 5, blocks = 16, rounds = 1, native = true)
      operators.Similarity.annRecall(exact, approx)
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_exact")).as("n_exact"), sum(col("n_hit")).as("n_hit"))
        .withColumn("recall_micro", expr("n_hit * 1000000L div n_exact"))
    }),

    // Embedding-cosine near-dup pairs within coarse clusters (IVF blocking).
    "e3_cosine_neardup" -> ((s, dir) => {
      operators.Similarity.cosineNearDup(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label", threshold = 0.3,
        native = true)
    }),

    // Matryoshka funnel ANN: coarse top-20 on the first 8 dims, exact
    // full-dim rescore to top-5 — the MRL coarse-to-fine serving shape
    // (prefix pass broadcast-joined, survivors-only full scoring).
    "e11_mrl_funnel" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.mrlFunnel(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dims = 8, coarseK = 20, k = 5, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // PQ reconstruction distortion: per-vector squared error of the
    // codebook reconstruction (floor-micro) — how much information the
    // m-byte codes actually lost; the eval that sizes a codebook.
    "e15_pq_distortion" -> ((s, dir) => {
      operators.Similarity.pqDistortion(t(s, dir, "embeddings"), "vec_id", "embedding")
    }),

    // Exact integer Gram matrix XᵀX over int8 codes in ONE aggregation
    // pass (bounded-state Aggregator: d(d+1)/2 longs per task) — the
    // sufficient statistic behind PCA/covariance; integer codes make it
    // order/partitioning-invariant and cross-engine exact.
    "e14_gram" -> ((s, dir) => {
      val q = operators.Similarity.quantizeInt8(
        t(s, dir, "embeddings"), "vec_id", "embedding")
      operators.Similarity.gramMatrix(q.select(col("q")), "q", d = 64)
    }),

    // Pairwise-cosine histogram over a deterministic md5 quarter-sample —
    // the embedding-space QA read-out (near-dup flooding spikes at 1.0,
    // anisotropy shifts the mass right); `mod` keeps the sampled pair
    // count ~constant as the corpus grows.
    "e19_sim_histogram" -> ((s, dir) => {
      operators.Similarity.cosineHistogram(
        t(s, dir, "embeddings"), "vec_id", "embedding")
    }),

    // Dominant principal direction of the embedding corpus by 3 exact
    // integer power-method rounds over the e14 Gram — the anisotropy /
    // rogue-common-direction probe behind PCA whitening. The corpus is
    // touched once (the Gram pass); iterations are d-row arithmetic.
    "e18_power_iteration" -> ((s, dir) => {
      val q = operators.Similarity.quantizeInt8(
        t(s, dir, "embeddings"), "vec_id", "embedding")
      operators.Similarity.powerIteration(
        operators.Similarity.gramMatrix(q.select(col("q")), "q", d = 64))
    }),

    // Matryoshka prefix truncation + L2 renormalize (16 of 64 dims),
    // exploded to scalar rows for the comparator.
    "e6_matryoshka" -> ((s, dir) => {
      operators.Similarity.matryoshka(t(s, dir, "embeddings"), "vec_id", "embedding", 16)
        .select(col("vec_id"), posexplode(col("mvec")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("val"))
    }),

    // Symmetric int8 embedding quantization (q vector + 6dp scale).
    // The gate projects the int8 vector to a CSV string: the driver's
    // comparator canonicalizes by lexsorting column values, which crashes
    // on array-typed cells, so arrays never cross the gate boundary.
    "e5_quantize_int8" -> ((s, dir) => {
      operators.Similarity.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"),
          concat_ws(",", transform(col("q"), _.cast("string"))).as("q_csv"),
          col("scale"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "e14_gram" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |q AS (SELECT vec_id,
        |  CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
        |       ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER))
        |  END AS q FROM m),
        |u AS (SELECT vec_id, i - 1 AS i, q[CAST(i AS INTEGER)] AS qi
        |  FROM q, unnest(generate_series(1, len(q))) AS g(i))
        |SELECT CAST(a.i AS INTEGER) AS i, CAST(b.i AS INTEGER) AS j,
        |  CAST(sum(CAST(a.qi AS BIGINT) * b.qi) AS BIGINT) AS dot
        |FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY 1, 2""".stripMargin,

    // Same md5 quarter-sample, same 6dp-rounded fold cosine, same bin
    // arithmetic (cos is DOUBLE, so the literals coerce to IEEE doubles).
    "e19_sim_histogram" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings
         |  WHERE ${md5i("CAST(vec_id AS VARCHAR)")} % 4 = 0),
         |sc AS (SELECT round(${cosSql("a.e", "b.e")}, 6) AS cos
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
         |SELECT CAST(least(floor((cos + 1.0) * 10.0), 19) AS BIGINT) AS bin,
         |  count(*) AS n_pairs
         |FROM sc GROUP BY 1""".stripMargin,

    // The e14 Gram rebuilt, expanded to its symmetric form, then the
    // identical 3 max-normalized integer power rounds unrolled.
    "e18_power_iteration" -> {
      def round(n: Int) =
        s"""w$n AS (SELECT f.i AS dim, CAST(sum(f.dot * v${n - 1}.v) AS BIGINT) AS w
           |  FROM f JOIN v${n - 1} ON f.j = v${n - 1}.dim GROUP BY f.i),
           |mx$n AS (SELECT max(abs(w)) AS mx FROM w$n),
           |v$n AS (SELECT dim, CASE WHEN mx > 0
           |  THEN CAST((1000 * w - (((1000 * w) % mx) + mx) % mx) // mx AS BIGINT)
           |  ELSE 0 END AS v
           |  FROM w$n, mx$n)""".stripMargin
      s"""WITH m AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |  FROM embeddings),
         |q AS (SELECT vec_id,
         |  CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
         |       ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER))
         |  END AS q FROM m),
         |u AS (SELECT vec_id, i - 1 AS i, q[CAST(i AS INTEGER)] AS qi
         |  FROM q, unnest(generate_series(1, len(q))) AS g(i)),
         |g AS (SELECT CAST(a.i AS INTEGER) AS i, CAST(b.i AS INTEGER) AS j,
         |  CAST(sum(CAST(a.qi AS BIGINT) * b.qi) AS BIGINT) AS dot
         |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i GROUP BY 1, 2),
         |f AS (SELECT i, j, dot FROM g
         |  UNION ALL SELECT j AS i, i AS j, dot FROM g WHERE i <> j),
         |v0 AS (SELECT DISTINCT i AS dim, CAST(1000 AS BIGINT) AS v FROM f),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT dim, v AS v_milli FROM v3""".stripMargin
    },

    "e15_pq_distortion" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
         |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
         |g AS (SELECT unnest(generate_series(0, 3)) AS sub),
         |cb AS (SELECT g.sub, CAST(sd.rn - 1 AS INT) AS cid, ${pqSubSql("sd.e", "g.sub")} AS cvec
         |  FROM sd CROSS JOIN g WHERE sd.rn <= 16),
         |sv AS (SELECT v.vec_id, g.sub, ${pqSubSql("v.e", "g.sub")} AS svec FROM v CROSS JOIN g),
         |d AS (SELECT sv.vec_id, sv.sub, min(${l2Sql("sv.svec", "cb.cvec")}) AS dsub
         |  FROM sv JOIN cb USING (sub) GROUP BY 1, 2),
         |p AS (SELECT vec_id,
         |  max(CASE WHEN sub = 0 THEN dsub END) AS d0,
         |  max(CASE WHEN sub = 1 THEN dsub END) AS d1,
         |  max(CASE WHEN sub = 2 THEN dsub END) AS d2,
         |  max(CASE WHEN sub = 3 THEN dsub END) AS d3
         |  FROM d GROUP BY vec_id)
         |SELECT vec_id, CAST(floor((((d0 + d1) + d2) + d3) * 1000000) AS BIGINT) AS err_micro
         |FROM p""".stripMargin,

    // Self-evaluating Lloyd-IVF gate: deterministic query/exact-pair
    // counts plus the constant recall verdict (the Spark side flips
    // recall_ok below 40% recall@3 — the cd7 pattern).
    "e4_ivf_ann" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(3 * count(*) AS BIGINT) AS n_exact, true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    "e1_cosine_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |q AS (SELECT vec_id, e FROM v WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         | round(${cosSql("q.e", "v.e")}, 6) AS cos
         | FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cos,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 5""".stripMargin,

    // e23's replay swept over three pool sizes from shared CTEs.
    "e25_candidates_curve" -> {
      def word(lo: Int, hi: Int) =
        s"list_reduce(list_transform(e[$lo:$hi], x -> CASE WHEN x >= 0 " +
          "THEN 1::BIGINT ELSE 0::BIGINT END), (a, b) -> a * 2 + b)"
      def rec(c: Int) =
        s"""SELECT CAST($c AS BIGINT) AS candidates,
           |  CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
           |  CAST(count(ap.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_ppm
           |FROM ex LEFT JOIN (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT sc.query_id, sc.neighbor_id,
           |      row_number() OVER (PARTITION BY sc.query_id ORDER BY sc.cos DESC, sc.neighbor_id) AS rk
           |    FROM (SELECT h.query_id, h.neighbor_id,
           |        round(${cosSql("h.qe", "h.ne")}, 6) AS cos
           |      FROM h WHERE h.hrank <= $c) sc) WHERE rk <= 5
           |) ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id""".stripMargin
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |w AS (SELECT vec_id, e, ${word(1, 32)} AS w0, ${word(33, 64)} AS w1 FROM v),
         |q AS (SELECT * FROM w WHERE vec_id < 10),
         |exsc AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |  round(${cosSql("q.e", "w.e")}, 6) AS cos
         |  FROM q JOIN w ON w.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM exsc) WHERE rk <= 5),
         |h AS (SELECT query_id, neighbor_id, qe, ne,
         |  row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS hrank
         |  FROM (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |    CAST(bit_count(xor(q.w0, w.w0)) + bit_count(xor(q.w1, w.w1)) AS BIGINT) AS hamming,
         |    q.e AS qe, w.e AS ne
         |    FROM q JOIN w ON w.vec_id <> q.vec_id))
         |${rec(10)}
         |UNION ALL
         |${rec(20)}
         |UNION ALL
         |${rec(40)}""".stripMargin
    },

    // e22's candidate/rerank replayed next to the brute-force top-5, the
    // e10 recall-overlap join on top.
    "e23_binary_recall" -> {
      def word(lo: Int, hi: Int) =
        s"list_reduce(list_transform(e[$lo:$hi], x -> CASE WHEN x >= 0 " +
          "THEN 1::BIGINT ELSE 0::BIGINT END), (a, b) -> a * 2 + b)"
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |w AS (SELECT vec_id, e, ${word(1, 32)} AS w0, ${word(33, 64)} AS w1 FROM v),
         |q AS (SELECT * FROM w WHERE vec_id < 10),
         |exsc AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |  round(${cosSql("q.e", "w.e")}, 6) AS cos
         |  FROM q JOIN w ON w.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM exsc) WHERE rk <= 5),
         |h AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |  CAST(bit_count(xor(q.w0, w.w0)) + bit_count(xor(q.w1, w.w1)) AS BIGINT) AS hamming,
         |  q.e AS qe, w.e AS ne
         |  FROM q JOIN w ON w.vec_id <> q.vec_id),
         |cand AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY hamming, neighbor_id) AS hrank FROM h) WHERE hrank <= 20),
         |apsc AS (SELECT query_id, neighbor_id,
         |  round(${cosSql("qe", "ne")}, 6) AS cos FROM cand),
         |ap AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM apsc) WHERE rk <= 5)
         |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  floor(CAST(count(ap.neighbor_id) AS DOUBLE) / count(*) * 10000) / 10000 AS recall
         |FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
         |GROUP BY ex.query_id""".stripMargin
    },

    // Same Horner sign-packing (two 32-bit words), Hamming candidates,
    // cosine rerank. DuckDB's ^ is power, so xor() is spelled out.
    "e22_binary_rerank" -> {
      def word(lo: Int, hi: Int) =
        s"list_reduce(list_transform(e[$lo:$hi], x -> CASE WHEN x >= 0 " +
          "THEN 1::BIGINT ELSE 0::BIGINT END), (a, b) -> a * 2 + b)"
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |w AS (SELECT vec_id, e, ${word(1, 32)} AS w0, ${word(33, 64)} AS w1 FROM v),
         |q AS (SELECT * FROM w WHERE vec_id < 10),
         |h AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |  CAST(bit_count(xor(q.w0, w.w0)) + bit_count(xor(q.w1, w.w1)) AS BIGINT) AS hamming,
         |  q.e AS qe, w.e AS ne
         |  FROM q JOIN w ON w.vec_id <> q.vec_id),
         |cand AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY hamming, neighbor_id) AS hrank FROM h) WHERE hrank <= 20),
         |sc AS (SELECT query_id, neighbor_id, hamming,
         |  round(${cosSql("qe", "ne")}, 6) AS cos FROM cand)
         |SELECT query_id, neighbor_id, hamming, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 5""".stripMargin
    },

    "e16_hard_negatives" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |q AS (SELECT vec_id, e FROM v WHERE vec_id < 20),
         |sc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         | round(${cosSql("q.e", "v.e")}, 6) AS cos
         | FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cos,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc WHERE cos >= 0.15 AND cos < 0.35 QUALIFY rank <= 5""".stripMargin,

    "e13_knn_classify" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e, label FROM embeddings),
         |q AS (SELECT vec_id, e, label FROM v WHERE vec_id % 10 < 2),
         |sc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, v.label AS nlabel,
         | round(${cosSql("q.e", "v.e")}, 6) AS cos
         | FROM q JOIN v ON v.vec_id <> q.vec_id),
         |top AS (SELECT query_id, nlabel FROM (
         |  SELECT query_id, nlabel,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r
         |  FROM sc) WHERE r <= 5),
         |votes AS (SELECT query_id, nlabel, count(*) AS votes FROM top GROUP BY 1, 2),
         |pred AS (SELECT query_id, nlabel AS pred FROM (
         |  SELECT query_id, nlabel,
         |    row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, nlabel) AS r
         |  FROM votes) WHERE r = 1)
         |SELECT q.label AS label, count(*) AS n_eval,
         |  CAST(sum(CASE WHEN q.label = pred.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |FROM q JOIN pred ON q.vec_id = pred.query_id
         |GROUP BY q.label""".stripMargin,

    "e2_lsh_ann" -> {
      val sig = (0 until 4).map { j =>
        val proj = s"list_reduce(list_transform(generate_series(1, len(e)), i -> CAST(e[i] AS DOUBLE) * " +
          s"(CASE WHEN ${md5i(s"'${j}_' || CAST(i AS VARCHAR)")} % 2 = 0 THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b)"
        s"(CASE WHEN $proj > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH v AS (SELECT vec_id, embedding AS e, CAST($sig AS BIGINT) AS sig FROM embeddings),
         |q AS (SELECT vec_id, e, sig FROM v WHERE vec_id < 50),
         |sc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         | round(${cosSql("q.e", "v.e")}, 6) AS cos
         | FROM q JOIN v ON q.sig = v.sig AND v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cos,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 3""".stripMargin
    },

    // Full NN-descent replay: TWO independent md5 blockings seed the
    // top-5 graph (one blocking alone is block-diagonal — see the
    // operator's scaladoc), undirected 2-hop candidate expansion, exact
    // rescore — same 6dp-rounded sequential-fold cosine and (cos desc,
    // id) ties, so the hash proves the whole descent, not just one
    // round's scores.
    "e20_nn_descent" ->
      s"""WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         |  ${md5i("CAST(vec_id AS VARCHAR) || '|1'")} % 16 AS b1,
         |  ${md5i("CAST(vec_id AS VARCHAR) || '|2'")} % 16 AS b2 FROM embeddings),
         |sp AS (SELECT a.id AS query_id, b.id AS neighbor_id, round(${cosSql("a.e", "b.e")}, 6) AS cos
         |  FROM v a JOIN v b ON (a.b1 = b.b1 OR a.b2 = b.b2) AND a.id <> b.id),
         |seed AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r FROM sp)
         |  WHERE r <= 5),
         |und AS (SELECT query_id AS u, neighbor_id AS w FROM seed
         |  UNION SELECT neighbor_id, query_id FROM seed),
         |two AS (SELECT a.u, b.w FROM und a JOIN und b ON a.w = b.u WHERE a.u <> b.w),
         |cand AS (SELECT u AS query_id, w AS neighbor_id FROM und
         |  UNION SELECT u, w FROM two),
         |sc AS (SELECT c.query_id, c.neighbor_id, round(${cosSql("qa.e", "qb.e")}, 6) AS cos
         |  FROM cand c JOIN v qa ON qa.id = c.query_id JOIN v qb ON qb.id = c.neighbor_id)
         |SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 5""".stripMargin,

    // e20's descent replayed in full, scored against the brute-force
    // top-5 of the md5 quarter-sample of queries, reduced to one
    // integer-micro summary row.
    "e21_nnd_recall" ->
      s"""WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         |  ${md5i("CAST(vec_id AS VARCHAR) || '|1'")} % 16 AS b1,
         |  ${md5i("CAST(vec_id AS VARCHAR) || '|2'")} % 16 AS b2 FROM embeddings),
         |qs AS (SELECT id, e FROM v WHERE ${md5i("CAST(id AS VARCHAR) || '|101'")} % 4 = 0),
         |exsc AS (SELECT a.id AS query_id, b.id AS neighbor_id, round(${cosSql("a.e", "b.e")}, 6) AS cos
         |  FROM qs a JOIN v b ON a.id <> b.id),
         |ex AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM exsc)
         |  WHERE rk <= 5),
         |sp AS (SELECT a.id AS query_id, b.id AS neighbor_id, round(${cosSql("a.e", "b.e")}, 6) AS cos
         |  FROM v a JOIN v b ON (a.b1 = b.b1 OR a.b2 = b.b2) AND a.id <> b.id),
         |seed AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r FROM sp)
         |  WHERE r <= 5),
         |und AS (SELECT query_id AS u, neighbor_id AS w FROM seed
         |  UNION SELECT neighbor_id, query_id FROM seed),
         |two AS (SELECT a.u, b.w FROM und a JOIN und b ON a.w = b.u WHERE a.u <> b.w),
         |cand AS (SELECT u AS query_id, w AS neighbor_id FROM und
         |  UNION SELECT u, w FROM two),
         |sc AS (SELECT c.query_id, c.neighbor_id, round(${cosSql("qa.e", "qb.e")}, 6) AS cos
         |  FROM cand c JOIN v qa ON qa.id = c.query_id JOIN v qb ON qb.id = c.neighbor_id),
         |ap AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM sc)
         |  WHERE rk <= 5)
         |SELECT CAST(count(DISTINCT ex.query_id) AS BIGINT) AS n_queries,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(count(ap.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_micro
         |FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id""".stripMargin,

    // iters=0 IVF: centroids are the 8 corpus vectors with smallest
    // md5(vec_id); assignment/probing argmin over sequential-fold L2 —
    // identical doubles in both engines, ties broken by cid.
    "e4b_ivf_fixed" -> ivfFixedOracleSql,

    // The e4b index replayed at three probe depths; shared CTEs, one
    // summary row per nprobe.
    "e24_nprobe_curve" -> {
      def rec(np: Int) =
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
           |  CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
           |  CAST(count(ap.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_ppm
           |FROM ex LEFT JOIN (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT sc.query_id, sc.neighbor_id,
           |      row_number() OVER (PARTITION BY sc.query_id ORDER BY sc.cos DESC, sc.neighbor_id) AS rk
           |    FROM (SELECT pr.query_id, a.vec_id AS neighbor_id,
           |        round(${cosSql("pr.qv", "a.e")}, 6) AS cos
           |      FROM pra pr JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.query_id
           |      WHERE pr.r <= $np) sc) WHERE rk <= 3
           |) ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id""".stripMargin
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
         |cent AS (SELECT CAST(rn - 1 AS INT) AS cid, e AS cvec FROM sd WHERE rn <= 8),
         |asg AS (SELECT vec_id, e, cid FROM (
         |  SELECT v.vec_id, v.e, c.cid,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY ${l2Sql("v.e", "c.cvec")}, c.cid) AS r
         |  FROM v CROSS JOIN cent c) WHERE r = 1),
         |q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 20),
         |exsc AS (SELECT q.query_id, v.vec_id AS neighbor_id,
         |  round(${cosSql("q.qv", "v.e")}, 6) AS cos
         |  FROM q JOIN v ON v.vec_id <> q.query_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM exsc) WHERE rk <= 3),
         |pra AS (SELECT query_id, qv, cid, r FROM (
         |  SELECT q.query_id, q.qv, c.cid,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY ${l2Sql("q.qv", "c.cvec")}, c.cid) AS r
         |  FROM q CROSS JOIN cent c))
         |${rec(1)}
         |UNION ALL
         |${rec(2)}
         |UNION ALL
         |${rec(4)}""".stripMargin
    },

    // The persisted-index gate serves the SAME deterministic IVF from
    // reloaded parquet tables — one oracle proves both paths (and that
    // the round trip changed nothing).
    "e17_ivf_index_persist" -> ivfFixedOracleSql,

    // PQ codes: codebook (sub, cid) = subspace sub of the cid-th
    // md5-seeded vector; integer codes — exact in any engine.
    "e7_pq_codes" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
         |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
         |g AS (SELECT unnest(generate_series(0, 3)) AS sub),
         |cb AS (SELECT g.sub, CAST(sd.rn - 1 AS INT) AS cid, ${pqSubSql("sd.e", "g.sub")} AS cvec
         |  FROM sd CROSS JOIN g WHERE sd.rn <= 16),
         |sv AS (SELECT v.vec_id, g.sub, ${pqSubSql("v.e", "g.sub")} AS svec FROM v CROSS JOIN g),
         |asg AS (SELECT vec_id, sub, cid FROM (
         |  SELECT sv.vec_id, sv.sub, cb.cid,
         |    row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY ${l2Sql("sv.svec", "cb.cvec")}, cb.cid) AS r
         |  FROM sv JOIN cb USING (sub)) WHERE r = 1)
         |SELECT vec_id, CAST(sub AS INTEGER) AS sub, cid AS code FROM asg""".stripMargin,

    // IVF+PQ ADC: coarse cells = e4b's iters=0 quantizer (rn<=8 seeds);
    // candidate distance = sum over subspaces of L2²(query subvector,
    // candidate's codebook centroid), folded in subspace order.
    "e8_ivfpq_ann" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
         |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
         |g AS (SELECT unnest(generate_series(0, 3)) AS sub),
         |cent AS (SELECT CAST(rn - 1 AS INT) AS ccid, e AS ccv FROM sd WHERE rn <= 8),
         |cb AS (SELECT g.sub, CAST(sd.rn - 1 AS INT) AS cid, ${pqSubSql("sd.e", "g.sub")} AS cvec
         |  FROM sd CROSS JOIN g WHERE sd.rn <= 16),
         |asgc AS (SELECT vec_id, ccid FROM (
         |  SELECT v.vec_id, c.ccid,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY ${l2Sql("v.e", "c.ccv")}, c.ccid) AS r
         |  FROM v CROSS JOIN cent c) WHERE r = 1),
         |pqa AS (SELECT vec_id, sub, cid FROM (
         |  SELECT sv.vec_id, sv.sub, cb.cid,
         |    row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY ${l2Sql("sv.svec", "cb.cvec")}, cb.cid) AS r
         |  FROM (SELECT v.vec_id, g.sub, ${pqSubSql("v.e", "g.sub")} AS svec FROM v CROSS JOIN g) sv
         |  JOIN cb USING (sub)) WHERE r = 1),
         |q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 20),
         |pr AS (SELECT query_id, qv, ccid FROM (
         |  SELECT q.query_id, q.qv, c.ccid,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY ${l2Sql("q.qv", "c.ccv")}, c.ccid) AS r
         |  FROM q CROSS JOIN cent c) WHERE r <= 2),
         |cand AS (SELECT pr.query_id, pr.qv, a.vec_id AS neighbor_id
         |  FROM pr JOIN asgc a ON a.ccid = pr.ccid AND a.vec_id <> pr.query_id),
         |terms AS (SELECT c.query_id, c.neighbor_id, p.sub,
         |  ${l2Sql(pqSubSql("c.qv", "p.sub"), "cb.cvec")} AS t
         |  FROM cand c JOIN pqa p ON p.vec_id = c.neighbor_id
         |  JOIN cb ON cb.sub = p.sub AND cb.cid = p.cid),
         |ad AS (SELECT query_id, neighbor_id,
         |  round(list_reduce(list(t ORDER BY sub), (a, b) -> a + b), 6) AS adist
         |  FROM terms GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, adist,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS INTEGER) AS rank
         |FROM ad QUALIFY rank <= 3""".stripMargin,

    // Nearest-class-centroid: micro-unit quantization (floor(x·1e6+0.5)),
    // exact BIGINT sums, ONE floored division per centroid element, exact
    // integer squared-L2 — every intermediate engine-portable.
    "e9_centroid_assign" ->
      """WITH q AS (SELECT vec_id, label,
        |  list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |x AS (SELECT label AS clabel, unnest(qv) AS v, unnest(range(1, len(qv) + 1)) AS dim FROM q),
        |m AS (SELECT clabel, dim, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
        |  FROM x GROUP BY clabel, dim),
        |c AS (SELECT clabel, list(cv ORDER BY dim) AS cvec FROM m GROUP BY clabel),
        |s AS (SELECT vec_id, label, clabel, CAST(sum((a - b) * (a - b)) AS BIGINT) AS dist
        |  FROM (SELECT q.vec_id, q.label, c.clabel, unnest(q.qv) AS a, unnest(c.cvec) AS b
        |        FROM q CROSS JOIN c)
        |  GROUP BY vec_id, label, clabel)
        |SELECT vec_id, label, clabel AS pred_label, dist FROM (
        |  SELECT vec_id, label, clabel, dist,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rk
        |  FROM s) WHERE rk = 1""".stripMargin,

    // e9's assignment chain + one Lloyd update: the predicted clusters'
    // re-computed integer centroids, (clabel, dim, cv) rows.
    "e12_lloyd_step" ->
      """WITH q AS (SELECT vec_id, label,
        |  list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |x AS (SELECT label AS clabel, unnest(qv) AS v, unnest(range(1, len(qv) + 1)) AS dim FROM q),
        |m AS (SELECT clabel, dim, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
        |  FROM x GROUP BY clabel, dim),
        |c AS (SELECT clabel, list(cv ORDER BY dim) AS cvec FROM m GROUP BY clabel),
        |s AS (SELECT vec_id, label, clabel, CAST(sum((a - b) * (a - b)) AS BIGINT) AS dist
        |  FROM (SELECT q.vec_id, q.label, c.clabel, unnest(q.qv) AS a, unnest(c.cvec) AS b
        |        FROM q CROSS JOIN c)
        |  GROUP BY vec_id, label, clabel),
        |asg AS (SELECT vec_id, clabel FROM (
        |  SELECT vec_id, clabel, row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rk
        |  FROM s) WHERE rk = 1),
        |u AS (SELECT asg.clabel, unnest(q.qv) AS v, unnest(range(1, len(q.qv) + 1)) AS dim
        |  FROM q JOIN asg ON q.vec_id = asg.vec_id)
        |SELECT clabel, CAST(dim AS BIGINT) AS dim,
        |  CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
        |FROM u GROUP BY clabel, dim""".stripMargin,

    // ANN recall@5: exact side = e1's ranking, approx side = e2's
    // signature-bucket ranking, both at k=5 over vec_id < 10; recall is
    // the per-query intersection share, floor-4dp.
    "e10_ann_recall" -> {
      val sig = (0 until 4).map { j =>
        val proj = s"list_reduce(list_transform(generate_series(1, len(e)), i -> CAST(e[i] AS DOUBLE) * " +
          s"(CASE WHEN ${md5i(s"'${j}_' || CAST(i AS VARCHAR)")} % 2 = 0 THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b)"
        s"(CASE WHEN $proj > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH v AS (SELECT vec_id, embedding AS e, CAST($sig AS BIGINT) AS sig FROM embeddings),
         |q AS (SELECT vec_id, e, sig FROM v WHERE vec_id < 10),
         |exsc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |  round(${cosSql("q.e", "v.e")}, 6) AS cos
         |  FROM q JOIN v ON v.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM exsc) WHERE rk <= 5),
         |apsc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |  round(${cosSql("q.e", "v.e")}, 6) AS cos
         |  FROM q JOIN v ON q.sig = v.sig AND v.vec_id <> q.vec_id),
         |ap AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM apsc) WHERE rk <= 5)
         |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  floor(CAST(count(ap.neighbor_id) AS DOUBLE) / count(*) * 10000) / 10000 AS recall
         |FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
         |GROUP BY ex.query_id""".stripMargin
    },

    "e3_cosine_neardup" ->
      s"""WITH v AS (SELECT vec_id, label, embedding AS e FROM embeddings),
         |sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | round(${cosSql("a.e", "b.e")}, 6) AS cos
         | FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM sc WHERE cos >= 0.3""".stripMargin,

    "e6_matryoshka" ->
      """WITH m AS (SELECT vec_id,
        |  list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS p FROM embeddings),
        |n AS (SELECT vec_id, p,
        |  sqrt(list_reduce(list_transform(p, x -> x * x), (a, b) -> a + b)) AS nrm FROM m)
        |SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
        |  CASE WHEN nrm = 0 THEN 0.0 ELSE floor(p[i] / nrm * 1000000) / 1000000 END AS val
        |FROM n, generate_series(1, 16) AS g(i)""".stripMargin,

    // MRL funnel: coarse rank on the 8-dim prefix slice (rounded 6dp,
    // ties by neighbor_id), full-dim rescore of the top-20 survivors.
    "e11_mrl_funnel" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |q AS (SELECT vec_id, e FROM v WHERE vec_id < 10),
         |co AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, q.e AS qe, v.e AS ne,
         | round(${cosSql("q.e[1:8]", "v.e[1:8]")}, 6) AS ccos
         | FROM q JOIN v ON v.vec_id <> q.vec_id),
         |sv AS (SELECT query_id, neighbor_id, qe, ne FROM (
         |  SELECT query_id, neighbor_id, qe, ne,
         |    row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, neighbor_id) AS cr
         |  FROM co) WHERE cr <= 20),
         |sc AS (SELECT query_id, neighbor_id, round(${cosSql("qe", "ne")}, 6) AS cos FROM sv)
         |SELECT query_id, neighbor_id, cos,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 5""".stripMargin,

    "e5_quantize_int8" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(
        |    CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER))
        |    END, ',') AS q_csv,
        |  CASE WHEN mx = 0 THEN 0.0 ELSE floor(mx / 127.0 * 1000000) / 1000000 END AS scale
        |FROM m""".stripMargin,
  )
}
