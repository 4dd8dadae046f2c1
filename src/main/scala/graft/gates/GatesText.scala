package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphBuilder, GraphStore, PropertyGraph}

/** Text-analysis gates (language-ID, quality scoring, tokenizers, TF-IDF/BM25, DSIR, perplexity, fingerprinting).
  *
  * Split from the former single-object SparkEntry (round 14) — a pure
  * refactor: every entry body is byte-identical, gate names and oracle
  * SQL unchanged; [[SparkEntry]] composes the family maps back together.
  */
private[graft] object GatesText extends GateFamily {
  import GateSupport._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // M6 — text analysis: token count per document.
    "t_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => x =!= lit(""))).cast("long").as("n_tokens"))
    }),

    // Lexical diversity per document: type-token ratio, Simpson index,
    // top-token dominance — the exact-arithmetic entropy surrogates (see
    // TextAnalysis.wordDiversity for why entropy itself is a libm trap).
    "t_word_diversity" -> ((s, dir) => {
      operators.TextAnalysis.wordDiversity(t(s, dir, "documents"), "doc_id", "text")
    }),

    // WordPiece greedy longest-match segmentation (BERT inference, the
    // other mainstream subword family next to BPE): corpus-derived
    // vocab (substrings ≥100 weighted occurrences + all single chars —
    // full coverage), per-doc word and wordpiece-token counts. The
    // greedy loop advances over DISTINCT words only; oracle unrolls
    // all 8 steps.
    "t_wordpiece" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = operators.TextAnalysis.wordpieceVocab(docs, "text")
      operators.TextAnalysis.wordpieceCount(docs, "doc_id", "text", vocab,
        maxSteps = 8)
    }),

    // Collocation mining (word2phrase): consecutive-token bigrams scored
    // by exact-integer lift (the monotone surrogate for PMI — same
    // ranking, no libm log), min count 5, deterministic top 50.
    "t_collocations" -> ((s, dir) => {
      operators.TextAnalysis.collocations(t(s, dir, "documents"), "text")
    }),

    // Flesch reading ease per doc (micro units) with the vowel-group
    // syllable surrogate — the sentence/word-complexity quality signal
    // next to t_gopher_quality's form checks.
    "t_readability" -> ((s, dir) => {
      operators.TextAnalysis.readability(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Unigram-LM Viterbi segmentation (SentencePiece inference) — the
    // third production tokenizer next to BPE and WordPiece: per-word
    // min-cost segmentation under integer-quantized ⌊log₂⌋ piece costs,
    // ties toward fewer pieces via one packed objective key. The oracle
    // replays the identical DP as a recursive-CTE over (word, pos).
    "t_unigram_segment" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = operators.TextAnalysis.unigramVocab(docs, "text")
      operators.TextAnalysis.unigramSegment(docs, "doc_id", "text", vocab)
    }),

    // χ² term–class feature selection: per language, the 10 terms whose
    // document frequency is most dependent on the class. Counts stay
    // exact int64; the statistic runs in engine-identical IEEE doubles
    // (the t_collocations floor-micro convention).
    "t_chi2_terms" -> ((s, dir) => {
      operators.TextAnalysis.chi2Terms(t(s, dir, "documents"),
        "doc_id", "text", "lang", minDf = 5, k = 10)
    }),

    // TextRank keywords: the x4 integer fixed-point PageRank over the
    // adjacent-word co-occurrence graph (pairs seen ≥2×, symmetrized,
    // deduplicated), top 50 words by (rank desc, word) — graph-on-text,
    // the corpus-level keyword extractor.
    "t_textrank" -> ((s, dir) => {
      operators.TextAnalysis.textrankKeywords(t(s, dir, "documents"), "text",
        iters = 3, minCount = 2, k = 50)
    }),

    // Bigram-LM log-probability per doc (perplexity filtering): add-one
    // smoothed corpus bigram model, per-bigram ⌊10⁶·ln p⌋ summed exactly
    // — the t_bm25 ln-parity convention.
    "t_perplexity" -> ((s, dir) => {
      operators.TextAnalysis.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Zipf rank–frequency slope over the top vocabulary ranks — the
    // power-law corpus diagnostic, one integer regression row.
    "t_zipf_slope" -> ((s, dir) => {
      operators.TextAnalysis.zipfSlope(t(s, dir, "documents"), "text", r = 1000)
    }),

    // Language-ID heuristic (marker-word scoring).
    "t_langid" -> ((s, dir) => {
      operators.TextAnalysis.languageId(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Language-ID eval against the labeled lang column: (labeled,
    // predicted, count) confusion cells — the t_langid heuristic scored
    // against ground truth (zh has no marker list, so its row shows
    // where unsupported languages land).
    "t_lang_confusion" -> ((s, dir) => {
      operators.TextAnalysis.langConfusion(t(s, dir, "documents"), "doc_id", "text", "lang")
    }),

    // Quality signals + blended score.
    "t_quality_score" -> ((s, dir) => {
      operators.TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")
    }),

    // BPE-ish sub-word token count (letter runs / digit runs / punct marks).
    "t_bpe_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        size(operators.TextAnalysis.bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"),
        size(array_distinct(operators.TextAnalysis.bpeTokens(col("text"))))
          .cast("long").as("n_unique"))
    }),

    // Order-sensitive rolling fingerprint.
    "t_rolling_fingerprint" -> ((s, dir) => {
      operators.TextAnalysis.rollingFingerprint(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Gopher repetition filters: duplicate word / 3-gram occurrence
    // fractions + most-frequent-3-gram share (floor-4dp).
    "t_repetition" -> ((s, dir) => {
      operators.TextAnalysis.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Gopher quality flags: word-count band, mean word length, symbol /
    // bullet / ellipsis ratios, alphabetic-word fraction + pass verdict.
    "t_gopher_quality" -> ((s, dir) => {
      operators.TextAnalysis.gopherQuality(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Corpus bigram LM count table (KenLM-ingest shape): top-1000 grams
    // with context totals and floor-4dp conditional probabilities.
    "t_ngram_lm" -> ((s, dir) => {
      operators.TextAnalysis.ngramLm(t(s, dir, "documents"), "text")
    }),

    // Sliding-window chunking with overlap (window 16, overlap 4): the
    // RAG/embedding preprocessing step — pure projection+explode, chunks
    // emitted map-side, zero shuffles.
    "t_chunk_windows" -> ((s, dir) => {
      operators.TextAnalysis.chunkWindows(t(s, dir, "documents"), "doc_id", "text",
        window = 16, overlap = 4)
    }),

    // LM-coverage scoring: each document scored against the corpus's own
    // top-K bigram table — the OOV-rate / perplexity-proxy keep-drop
    // signal. The LM is broadcast; text never shuffles.
    "t_lm_coverage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.lmCoverage(
        docs, operators.TextAnalysis.ngramLm(docs, "text"), "doc_id", "text")
    }),

    // DSIR-style importance weight: every document scored by the ratio of
    // its bigram hit mass against a TARGET-domain LM (the lang='en'
    // slice) vs the whole-corpus background LM — the domain-adaptation
    // resampling signal. Both LMs broadcast; text never shuffles.
    "t_dsir_weight" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.dsirWeight(
        docs,
        operators.TextAnalysis.ngramLm(docs.filter(col("lang") === "en"), "text"),
        operators.TextAnalysis.ngramLm(docs, "text"),
        "doc_id", "text")
    }),

    // Vocabulary-coverage table: top-K tokens with rank, exact cumulative
    // count, and floor-6dp cumulative corpus share — the vocab-sizing
    // artifact a tokenizer trainer reads.
    "t_vocab_coverage" -> ((s, dir) => {
      operators.TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text")
    }),

    // Percentile-based dynamic quality cutoff: drop the bottom quintile
    // by blended quality score — exact percentile (the oracle-able twin
    // of the production approx_percentile path), threshold broadcast, no
    // global sort.
    "t_quality_cut" -> ((s, dir) => {
      val q = operators.TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      operators.Dedup.percentileCut(q, "quality", 0.2, exact = true)
        .select(col("doc_id"), col("quality"), col("threshold"), col("kept"))
    }),

    // Per-LANGUAGE quality cut: each language's bottom quintile dropped
    // against its OWN exact-percentile bar (the fairness fix over the
    // corpus-wide t_quality_cut; thresholds broadcast back per group).
    "t_quality_cut_by_lang" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val q = operators.TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality"))
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      operators.Dedup.groupPercentileCut(q, "quality", "lang", 0.2, exact = true)
        .select(col("doc_id"), col("lang"), col("quality"),
          col("threshold"), col("kept"))
    }),

    // CCNet-style head/middle/tail bucketing: per-language exact coverage
    // terciles over the corpus's own bigram LM — the language-fair
    // keep/demote/drop partition a CCNet pipeline trains from.
    "t_ccnet_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.coverageBuckets(
        docs, operators.TextAnalysis.ngramLm(docs, "text"),
        "doc_id", "text", "lang")
    }),

    // BM25 lexical retrieval: global top-20 documents for a fixed query
    // over the corpus, integer micro-unit scores (see TextAnalysis.bm25TopK
    // — exact, addition-order-invariant). Query mixes the one rare term
    // ('dup', df≈25/500) with two stop-ish terms, so idf does real work.
    "t_bm25" -> ((s, dir) => {
      operators.TextAnalysis.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        query = Seq("dup", "query", "data"), k = 20)
    }),

    // The dataset card: per-source corpus report (docs, tokens, mean
    // quality, Gopher pass rate, language count) — one grouped agg over
    // the composed scoring operators, means in exact 1e-4 integer units
    // so no float-summation order can flip a digit.
    "t_corpus_card" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val q = operators.TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("quality") * 10000).cast("long").as("__qu"))
      val g = operators.TextAnalysis.gopherQuality(docs, "doc_id", "text")
        .select(col("doc_id"), col("passes").cast("long").as("__gp"))
      val l = operators.TextAnalysis.languageId(docs, "doc_id", "text")
        .select(col("doc_id"), col("pred_lang"))
      docs.select(col("doc_id"), col("source"))
        .join(q, Seq("doc_id")).join(g, Seq("doc_id")).join(l, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          expr("sum(__qu) div count(1)").as("mean_quality_x10000"),
          expr("sum(__gp) * 10000 div count(1)").as("gopher_pass_x10000"),
          countDistinct(col("pred_lang")).as("n_langs"))
    }),

    // BPE tokenizer-training inner loop: top-20 adjacent char pairs
    // weighted by word frequency, computed over the VOCABULARY (corpus
    // collapses to (word, n) first — the explode never touches corpus
    // scale).
    "t_bpe_pair_freq" -> ((s, dir) => {
      operators.TextAnalysis.bpePairFreq(t(s, dir, "documents"), "text", topK = 20)
    }),

    // BPE merge LEARNING: 5 rounds of the tokenizer-training loop (count
    // weighted adjacent pairs → adopt argmax merge → rewrite vocabulary),
    // engine-exact via greedy left-to-right replace semantics. The oracle
    // unrolls the same 5 rounds in SQL (see bpeLearnOracleSql).
    "t_bpe_learn" -> ((s, dir) => {
      operators.TextAnalysis.bpeLearn(t(s, dir, "documents"), "text", rounds = 5)
    }),

    // BPE APPLY — tokenize with the learned merges: per-doc character vs
    // BPE token counts (the compression-ratio fit signal). Segmentation
    // runs vocabulary-sized; docs get totals back via one word join.
    "t_bpe_apply" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.bpeApply(docs, "doc_id", "text",
        operators.TextAnalysis.bpeLearn(docs, "text", rounds = 5), rounds = 5)
    }),

    // TF-IDF: top-3 terms per document.
    "t_tfidf" -> ((s, dir) => {
      operators.TextAnalysis.tfidfTopK(t(s, dir, "documents"), "doc_id", "text", k = 3)
    }),

    // PII-style redaction scrub (emails, long digit runs).
    "t_redact" -> ((s, dir) => {
      operators.TextAnalysis.redact(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Heaps'-law vocabulary growth: V(N) at fixed token checkpoints over
    // the corpus in (doc_id, position) order — the curve that sizes
    // tokenizer vocabularies and flags template-flooded corpora. Global
    // positions come from per-doc offsets (only the |docs|-row count
    // table crosses a single-partition window, never tokens).
    "t_heaps" -> ((s, dir) => {
      operators.TextAnalysis.vocabGrowth(t(s, dir, "documents"), "doc_id", "text",
        Seq(1000L, 2000L, 4000L, 8000L, 16000L, 32000L))
    }),

    // Unicode NFC canonicalization (native codegen'd expression — no
    // built-in expresses it): decomposed combining sequences compose to
    // their precomposed forms, so every downstream hash (dedup
    // fingerprints, shingles, contamination n-grams) sees ONE spelling.
    // Input mixes each doc's prefix with deterministic decomposed
    // suffixes; lengths prove composition happened (5 chars → 4).
    "t_nfc_normalize" -> ((s, dir) => {
      val raw = concat(substring(col("text"), 1, 8),
        lit(" cafe\u0301 A\u030Angstro\u0308m")) // decomposed combining marks
      t(s, dir, "documents").select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          length(col("raw")).as("raw_len"),
          call_function("nfc_normalize", col("raw")).as("nfc"),
          length(call_function("nfc_normalize", col("raw"))).as("nfc_len"))
    }),

    // Concat-and-chunk sequence packing: 512-token context windows over
    // 8 deterministic shards (per-shard prefix-sum window — no global
    // single-reducer ordering at any corpus size).
    "t_pack_chunks" -> ((s, dir) => {
      operators.TextAnalysis.packChunks(t(s, dir, "documents"), "doc_id", "text", budget = 512)
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // Same bigram table, same add-one smoothing, same one-IEEE-divide
    // ln argument, same floor — summed per doc; <2-word docs keep a
    // (0, 0) row on both sides.
    "t_perplexity" ->
      s"""$WORDS_CTE,
         |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
         |    i -> [w[i], w[i + 1]])) AS p FROM t WHERE len(w) >= 2),
         |g AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
         |cc2 AS (SELECT w1, w2, count(*) AS c2 FROM g GROUP BY w1, w2),
         |cc1 AS (SELECT w1, count(*) AS c1
         |  FROM (SELECT unnest(w) AS w1 FROM t) GROUP BY w1),
         |vs AS (SELECT count(*) AS vsz FROM cc1),
         |sc AS (SELECT g.doc_id,
         |  CAST(floor(ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + vsz AS DOUBLE))
         |    * 1000000.0) AS BIGINT) AS lp
         |  FROM g JOIN cc2 USING (w1, w2) JOIN cc1 USING (w1) CROSS JOIN vs),
         |ag AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS logprob_micro
         |  FROM sc GROUP BY doc_id)
         |SELECT t.doc_id, CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(logprob_micro, 0) AS BIGINT) AS logprob_micro
         |FROM t LEFT JOIN ag ON t.doc_id = ag.doc_id""".stripMargin,

    // Same (freq desc, word) rank order, same milli-ln floors, same
    // integer regression, same sign-explicit truncation.
    "t_zipf_slope" ->
      s"""$WORDS_CTE,
         |fq AS (SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(w) AS word FROM t) GROUP BY word
         |  ORDER BY freq DESC, word LIMIT 1000),
         |rk AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, word) AS rank FROM fq),
         |xy AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
         |  CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000.0) AS BIGINT) AS y FROM rk),
         |ag AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |  sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy)
         |SELECT CAST(n AS BIGINT) AS n_ranks,
         |  CAST(n * sxy - sx * sy AS BIGINT) AS sxy_num,
         |  CAST(n * sxx - sx * sx AS BIGINT) AS sxx_den,
         |  CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
         |    WHEN n * sxy - sx * sy >= 0
         |      THEN (n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx)
         |    ELSE -((sx * sy - n * sxy) * 1000 // (n * sxx - sx * sx))
         |    END AS BIGINT) AS slope_milli
         |FROM ag""".stripMargin,

    "t_heaps" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM documents),
        |c AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n FROM t),
        |o AS (SELECT doc_id, coalesce(sum(n) OVER (ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM c),
        |u AS (SELECT t.doc_id, i, w[CAST(i AS INTEGER)] AS word
        |  FROM t, unnest(generate_series(1, len(w))) AS g(i)),
        |p AS (SELECT u.word, o.off + u.i AS pos FROM u JOIN o USING (doc_id)),
        |f AS (SELECT word, min(pos) AS fp FROM p GROUP BY word),
        |n AS (SELECT CAST(nt AS BIGINT) AS n_tokens FROM (VALUES
        |  (1000), (2000), (4000), (8000), (16000), (32000)) v(nt))
        |SELECT n_tokens, count(*) AS vocab FROM n JOIN f ON f.fp <= n.n_tokens
        |GROUP BY n_tokens""".stripMargin,

    // DuckDB's nfc_normalize uses the same Unicode composition tables as
    // java.text.Normalizer — byte-identical canonical forms
    "t_nfc_normalize" ->
      """WITH r AS (SELECT doc_id,
        |  substr(text, 1, 8) || ' cafe' || chr(769) || ' A' || chr(778)
        |    || 'ngstro' || chr(776) || 'm' AS raw
        |  FROM documents)
        |SELECT doc_id, length(raw) AS raw_len, nfc_normalize(raw) AS nfc,
        |  length(nfc_normalize(raw)) AS nfc_len FROM r""".stripMargin,

    "t_bpe_learn" -> bpeLearnOracleSql(rounds = 5),

    "t_bpe_apply" -> bpeApplyOracleSql(rounds = 5),

    "t_bm25" ->
      s"""$WORDS_CTE,
         |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |u AS (SELECT doc_id, unnest(w) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM u
         |  WHERE term IN ('dup', 'query', 'data') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id,
         |  CAST(floor(ln((n - df + 0.5) / (df + 0.5) + 1.0)
         |    * (tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
         |    * 1000000) AS BIGINT) AS m
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
         |agg AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS score_micro FROM sc GROUP BY doc_id)
         |SELECT doc_id, score_micro,
         |  CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank
         |FROM agg QUALIFY rank <= 20""".stripMargin,

    "t_token_count" ->
      """SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
        |FROM documents""".stripMargin,

    // Same corpus-derived vocab, 8 greedy longest-match steps unrolled
    // (max word length is 8 and single-char coverage advances ≥ 1/step).
    "t_wordpiece" -> {
      def step(n: Int) =
        s"""c$n AS (SELECT s.word, s.pos, s.toks, v.plen,
           |    row_number() OVER (PARTITION BY s.word ORDER BY v.plen DESC) AS r
           |  FROM s${n - 1} s JOIN vocab v ON substr(s.word, s.pos + 1, v.plen) = v.piece
           |  WHERE s.pos < length(s.word)),
           |s$n AS (SELECT word, pos + plen AS pos, toks + 1 AS toks FROM c$n WHERE r = 1
           |  UNION ALL SELECT word, pos, toks FROM s${n - 1} WHERE pos >= length(word))"""
          .stripMargin
      s"""WITH wd AS (SELECT doc_id,
         |    unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
         |  FROM documents),
         |wc AS (SELECT doc_id, w, count(*) AS k FROM wd GROUP BY doc_id, w),
         |gw AS (SELECT w, sum(k) AS k FROM wc GROUP BY w),
         |pieces AS (SELECT substr(gw.w, CAST(i.i AS INTEGER), CAST(l.l AS INTEGER)) AS piece, gw.k
         |  FROM gw
         |  CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS i) i
         |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS l) l
         |  WHERE i.i <= length(gw.w) AND l.l <= length(gw.w) - i.i + 1),
         |vocab AS (SELECT piece, CAST(length(piece) AS INTEGER) AS plen FROM (
         |  SELECT piece, sum(k) AS n FROM pieces GROUP BY piece)
         |  WHERE n >= 100 OR length(piece) = 1),
         |s0 AS (SELECT w AS word, 0 AS pos, 0 AS toks FROM (SELECT DISTINCT w FROM gw)),
         |${(1 to 8).map(step).mkString(",\n")}
         |SELECT wc.doc_id, CAST(sum(wc.k) AS BIGINT) AS n_words,
         |  CAST(sum(wc.k * s8.toks) AS BIGINT) AS n_wp_tokens
         |FROM wc JOIN s8 ON s8.word = wc.w GROUP BY wc.doc_id""".stripMargin
    },

    // The Viterbi DP as a recursive CTE: dp enumerates every (word,
    // prefix-length, packed-key) state reachable by appending vocab
    // pieces; min(key) at pos = len(word) is exactly the engine's
    // packed (total cost, piece count) argmin. Path count is bounded by
    // compositions of ≤8-char words into ≤4-char pieces — trivial at
    // oracle SF.
    "t_unigram_segment" ->
      s"""WITH RECURSIVE wd AS (SELECT doc_id,
         |    unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
         |  FROM documents),
         |wc AS (SELECT doc_id, w, count(*) AS k FROM wd GROUP BY doc_id, w),
         |gw AS (SELECT w, sum(k) AS k FROM wc GROUP BY w),
         |pieces AS (SELECT substr(gw.w, CAST(i.i AS INTEGER), CAST(l.l AS INTEGER)) AS piece, gw.k
         |  FROM gw
         |  CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS i) i
         |  CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS l) l
         |  WHERE i.i <= length(gw.w) AND l.l <= length(gw.w) - i.i + 1),
         |vocab AS (SELECT piece,
         |    CAST((64 - length(bin(CAST(n AS BIGINT)))) * 1000 AS BIGINT) AS cost_micro
         |  FROM (SELECT piece, sum(k) AS n FROM pieces GROUP BY piece)
         |  WHERE n >= 100 OR length(piece) = 1),
         |dp AS (
         |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS key FROM (SELECT DISTINCT w FROM gw)
         |  UNION ALL
         |  SELECT dp.w, dp.pos + length(v.piece) AS pos,
         |    dp.key + v.cost_micro * 64 + 1 AS key
         |  FROM dp JOIN vocab v ON substr(dp.w, dp.pos + 1, length(v.piece)) = v.piece
         |  WHERE dp.pos < length(dp.w)),
         |best AS (SELECT w, min(key) AS key FROM dp WHERE pos = length(w) GROUP BY w)
         |SELECT wc.doc_id, CAST(sum(wc.k) AS BIGINT) AS n_words,
         |  CAST(sum(wc.k * (best.key % 64)) AS BIGINT) AS n_pieces,
         |  CAST(sum(wc.k * (best.key // 64)) AS BIGINT) AS cost_micro
         |FROM wc JOIN best ON best.w = wc.w GROUP BY wc.doc_id""".stripMargin,

    "t_word_diversity" ->
      s"""$WORDS_CTE,
         |u AS (SELECT doc_id, unnest(w) AS word FROM t),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM u GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words, count(*) AS n_unique,
         |  floor(CAST(count(*) AS DOUBLE) / sum(tf) * 10000) / 10000 AS ttr,
         |  floor((1.0 - CAST(sum(tf * tf) AS DOUBLE) / (sum(tf) * sum(tf))) * 10000) / 10000 AS simpson,
         |  floor(CAST(max(tf) AS DOUBLE) / sum(tf) * 10000) / 10000 AS top_share
         |FROM tf GROUP BY doc_id""".stripMargin,

    // Same bigram/unigram count tables, the identical left-assoc double
    // product for the lift, the identical (lift, count, bigram) order.
    "t_collocations" ->
      s"""$WORDS_CTE,
         |bg AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i + 1])) AS bigram
         |  FROM t WHERE len(w) >= 2),
         |bc AS (SELECT bigram, count(*) AS n_xy FROM bg GROUP BY bigram
         |  HAVING count(*) >= 5),
         |uc AS (SELECT word, count(*) AS n FROM (SELECT unnest(w) AS word FROM t)
         |  GROUP BY word),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM uc)
         |SELECT bigram, n_xy, nx.n AS n_x, ny.n AS n_y,
         |  CAST(floor(1000000.0 * n_xy * n_total
         |    / (CAST(nx.n AS DOUBLE) * ny.n)) AS BIGINT) AS lift_micro
         |FROM bc
         |JOIN uc nx ON split_part(bigram, ' ', 1) = nx.word
         |JOIN uc ny ON split_part(bigram, ' ', 2) = ny.word
         |CROSS JOIN tot
         |ORDER BY lift_micro DESC, n_xy DESC, bigram LIMIT 50""".stripMargin,

    // Vowel-group syllable surrogate + [.!?]+ sentence runs; the two
    // floor terms pin the micro score to the identical IEEE divides.
    "t_readability" ->
      """WITH m AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w,
        |  greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
        |    s -> trim(s) <> '')), 1) AS n_sents
        |FROM documents),
        |s AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(n_sents AS BIGINT) AS n_sents,
        |  CAST(coalesce(list_sum(list_transform(w, x ->
        |    len(list_filter(string_split(regexp_replace(lower(x), '[^aeiouy]+', ' ', 'g'), ' '),
        |      p -> p <> '')))), 0) AS BIGINT) AS n_syllables
        |FROM m WHERE len(w) > 0)
        |SELECT doc_id, n_words, n_sents, n_syllables,
        |  206835000 - CAST(floor(1015000.0 * n_words / n_sents) AS BIGINT)
        |            - CAST(floor(84600000.0 * n_syllables / n_words) AS BIGINT) AS flesch_micro
        |FROM s""".stripMargin,

    // Same sparse observed grid (a ≥ 1, df ≥ 5, degenerate marginals
    // dropped), identical left-assoc IEEE expression tree for the
    // statistic, identical (χ² desc, term) top-10 per class.
    "t_chi2_terms" ->
      s"""$WORDS_CTE,
         |dt AS (SELECT d.lang AS cls, t.doc_id, unnest(list_distinct(w)) AS term
         |  FROM t JOIN documents d ON t.doc_id = d.doc_id),
         |aa AS (SELECT term, cls, count(*) AS a FROM dt GROUP BY term, cls),
         |dfq AS (SELECT term, sum(a) AS df FROM aa GROUP BY term HAVING sum(a) >= 5),
         |cn AS (SELECT lang AS cls, count(*) AS n_cls FROM documents GROUP BY lang),
         |tot AS (SELECT count(*) AS n_docs FROM documents),
         |g AS (SELECT aa.cls, aa.term, aa.a, dfq.df - aa.a AS b,
         |    cn.n_cls - aa.a AS c, tot.n_docs - cn.n_cls - (dfq.df - aa.a) AS d,
         |    dfq.df, cn.n_cls, tot.n_docs
         |  FROM aa JOIN dfq USING (term) JOIN cn USING (cls) CROSS JOIN tot
         |  WHERE dfq.df < tot.n_docs AND cn.n_cls < tot.n_docs),
         |sc AS (SELECT cls, term, a, b, c, d,
         |  CAST(floor(1000000.0 * CAST(n_docs AS DOUBLE)
         |    * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
         |    * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
         |    / (CAST(df AS DOUBLE) * CAST(n_docs - df AS DOUBLE)
         |       * CAST(n_cls AS DOUBLE) * CAST(n_docs - n_cls AS DOUBLE))) AS BIGINT)
         |    AS chi2_micro FROM g)
         |SELECT cls, term, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         |  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d, chi2_micro FROM (
         |  SELECT *, row_number() OVER (PARTITION BY cls
         |    ORDER BY chi2_micro DESC, term) AS rk FROM sc)
         |WHERE rk <= 10""".stripMargin,

    // Identical edge construction (adjacent pairs ≥2×, self-loops cut,
    // symmetrized distinct) and the x4 oracle's integer PR rounds.
    "t_textrank" -> {
      val iters = (1 to 3).map { i =>
        s"""p$i AS (
           |  SELECT v.id, 150000 + (17 * coalesce(c.m, 0)) // 20 AS rank_micro
           |  FROM v LEFT JOIN (
           |    SELECT und.dst AS id, sum(p${i - 1}.rank_micro // d.outdeg) AS m
           |    FROM und JOIN p${i - 1} ON und.src = p${i - 1}.id JOIN d ON d.src = und.src
           |    GROUP BY und.dst) c ON v.id = c.id)""".stripMargin
      }.mkString(",\n")
      s"""$WORDS_CTE,
         |bg AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
         |    i -> [w[i], w[i + 1]])) AS p FROM t WHERE len(w) >= 2),
         |pe AS (SELECT p[1] AS src, p[2] AS dst FROM bg),
         |ec AS (SELECT src, dst FROM (
         |  SELECT src, dst, count(*) AS n FROM pe GROUP BY src, dst)
         |  WHERE n >= 2 AND src <> dst),
         |und AS (SELECT src, dst FROM ec UNION SELECT dst, src FROM ec),
         |d AS (SELECT src, count(*) AS outdeg FROM und GROUP BY src),
         |v AS (SELECT src AS id FROM und UNION SELECT dst FROM und),
         |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_micro FROM v),
         |$iters
         |SELECT id AS word, CAST(rank_micro AS BIGINT) AS rank_micro FROM p3
         |ORDER BY rank_micro DESC, word LIMIT 50""".stripMargin
    },

    "t_langid" -> {
      val scores = Seq(
        "en" -> Seq("the", "and", "of", "a", "is"),
        "de" -> Seq("der", "die", "und", "das", "ist"),
        "es" -> Seq("el", "la", "de", "y", "es"),
        "fr" -> Seq("le", "la", "et", "les", "est")).map { case (lang, ms) =>
        val inList = ms.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter(w, x -> x IN ($inList))) AS BIGINT) AS s_$lang"
      }.mkString(",\n ")
      s"""$WORDS_CTE,
         |sc AS (SELECT doc_id,
         | $scores
         | FROM t)
         |SELECT doc_id,
         | CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |      WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |      WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
         |      WHEN s_fr > 0 THEN 'fr'
         |      ELSE 'und' END AS pred_lang
         |FROM sc""".stripMargin
    },

    // The t_langid prediction joined back to the labeled column,
    // aggregated to confusion cells.
    "t_lang_confusion" -> {
      val scores = Seq(
        "en" -> Seq("the", "and", "of", "a", "is"),
        "de" -> Seq("der", "die", "und", "das", "ist"),
        "es" -> Seq("el", "la", "de", "y", "es"),
        "fr" -> Seq("le", "la", "et", "les", "est")).map { case (lang, ms) =>
        val inList = ms.map(m => s"'$m'").mkString(", ")
        s"CAST(len(list_filter(w, x -> x IN ($inList))) AS BIGINT) AS s_$lang"
      }.mkString(",\n ")
      s"""$WORDS_CTE,
         |sc AS (SELECT doc_id,
         | $scores
         | FROM t),
         |pr AS (SELECT doc_id,
         | CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |      WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         |      WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
         |      WHEN s_fr > 0 THEN 'fr'
         |      ELSE 'und' END AS pred_lang
         |FROM sc)
         |SELECT d.lang, pr.pred_lang, CAST(count(*) AS BIGINT) AS cnt
         |FROM pr JOIN documents d ON pr.doc_id = d.doc_id
         |GROUP BY d.lang, pr.pred_lang""".stripMargin
    },

    "t_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  (CAST(length(text) AS DOUBLE) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
         |    / CAST(length(text) AS DOUBLE) AS punct,
         |  CAST(len(list_filter(w, x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
         |    / greatest(len(w), 1) AS stop,
         |  CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)), (a,b) -> a + b) AS DOUBLE)
         |    / greatest(len(w), 1) AS meanlen
         | FROM t)
         |SELECT doc_id, n_tokens,
         | floor(punct * 10000) / 10000 AS punct_ratio,
         | floor(stop * 10000) / 10000 AS stopword_ratio,
         | floor(meanlen * 10000) / 10000 AS mean_word_len,
         | floor(least(greatest(0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct)
         |   + 0.3 * least(meanlen / 8.0, 1.0), 0.0), 1.0) * 10000) / 10000 AS quality
         |FROM m""".stripMargin,

    // Dynamic quality cutoff: the same quality formula as t_quality_score
    // (only the terms quality uses), exact interpolated p20 via
    // quantile_cont (== Spark's exact percentile — the f5 recipe),
    // threshold identical-IEEE on both engines.
    "t_quality_cut" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  (CAST(length(text) AS DOUBLE) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
         |    / CAST(length(text) AS DOUBLE) AS punct,
         |  CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)), (a,b) -> a + b) AS DOUBLE)
         |    / greatest(len(w), 1) AS meanlen
         | FROM t),
         |q AS (SELECT doc_id,
         |  floor(least(greatest(0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct)
         |    + 0.3 * least(meanlen / 8.0, 1.0), 0.0), 1.0) * 10000) / 10000 AS quality
         |  FROM m),
         |th AS (SELECT quantile_cont(quality, 0.2) AS threshold FROM q)
         |SELECT doc_id, quality, threshold, quality >= threshold AS kept
         |FROM q CROSS JOIN th""".stripMargin,

    "t_bpe_token_count" ->
      """SELECT doc_id,
        |CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |CAST(len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS n_unique
        |FROM documents""".stripMargin,

    "t_rolling_fingerprint" ->
      s"""$WORDS_CTE
         |SELECT doc_id, CAST(list_reduce(list_transform(generate_series(1, len(w)),
         |  i -> (${md5i(s"w[i]")} % 1000003) * i), (a,b) -> a + b) AS BIGINT) AS fingerprint
         |FROM t""".stripMargin,

    // the three scoring formulae verbatim (each pinned by its own gate),
    // rolled up per source with integer-unit means.
    "t_corpus_card" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w,
        |  string_split_regex(text, '\r?\n') AS ln FROM documents),
        |q AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(floor(least(greatest(
        |    0.4 * least(len(w) / 100.0, 1.0)
        |    + 0.3 * (1.0 - (CAST(length(text) AS DOUBLE)
        |        - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE))
        |    + 0.3 * least((CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
        |        (a, b) -> a + b) AS DOUBLE) / greatest(len(w), 1)) / 8.0, 1.0),
        |    0.0), 1.0) * 10000) AS BIGINT) AS qu
        |  FROM t),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 50 AND len(w) <= 100000
        |    AND (CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
        |        (a, b) -> a + b) AS DOUBLE) / len(w)) >= 3.0
        |    AND (CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
        |        (a, b) -> a + b) AS DOUBLE) / len(w)) <= 10.0
        |    AND (CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g'))
        |        + 3 * len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
        |        / greatest(length(text), 1)) < 0.1
        |    AND (CAST(len(list_filter(ln, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
        |        / greatest(len(ln), 1)) <= 0.9
        |    AND (CAST(len(list_filter(ln, l -> regexp_matches(trim(l), '\.\.\.$'))) AS DOUBLE)
        |        / greatest(len(ln), 1)) <= 0.3
        |    AND (CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
        |        / len(w)) >= 0.8
        |  THEN 1 ELSE 0 END AS gp FROM t WHERE len(w) > 0
        |  UNION ALL SELECT doc_id, 0 FROM t WHERE len(w) = 0),
        |sc AS (SELECT doc_id,
        |  CAST(len(list_filter(w, x -> x IN ('the', 'and', 'of', 'a', 'is'))) AS BIGINT) AS s_en,
        |  CAST(len(list_filter(w, x -> x IN ('der', 'die', 'und', 'das', 'ist'))) AS BIGINT) AS s_de,
        |  CAST(len(list_filter(w, x -> x IN ('el', 'la', 'de', 'y', 'es'))) AS BIGINT) AS s_es,
        |  CAST(len(list_filter(w, x -> x IN ('le', 'la', 'et', 'les', 'est'))) AS BIGINT) AS s_fr
        |  FROM t),
        |l AS (SELECT doc_id,
        |  CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |       WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |       WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
        |       WHEN s_fr > 0 THEN 'fr'
        |       ELSE 'und' END AS pred_lang FROM sc)
        |SELECT t.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(q.qu) // count(*) AS BIGINT) AS mean_quality_x10000,
        |  CAST(sum(g.gp) * 10000 // count(*) AS BIGINT) AS gopher_pass_x10000,
        |  CAST(count(DISTINCT l.pred_lang) AS BIGINT) AS n_langs
        |FROM t JOIN q USING (doc_id) JOIN g USING (doc_id) JOIN l USING (doc_id)
        |GROUP BY t.source""".stripMargin,

    "t_bpe_pair_freq" ->
      """WITH v AS (SELECT w, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
        |  FROM documents) GROUP BY w),
        |p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, n
        |  FROM v, unnest(generate_series(1, length(w) - 1)) AS g(i)
        |  WHERE length(w) >= 2),
        |c AS (SELECT pair, CAST(sum(n) AS BIGINT) AS cnt FROM p GROUP BY pair)
        |SELECT pair, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INTEGER) AS rank
        |FROM c QUALIFY rank <= 20""".stripMargin,

    "t_tfidf" ->
      s"""$WORDS_CTE,
         |u AS (SELECT doc_id, unnest(w) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM u GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n FROM documents),
         |sc AS (SELECT doc_id, term,
         |  floor(tf * ln((n + 1.0) / (df + 1.0)) * 1000000) / 1000000 AS score
         |  FROM tf JOIN dfq USING (term) CROSS JOIN n)
         |SELECT doc_id, term, score,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 3""".stripMargin,

    "t_redact" ->
      """SELECT doc_id,
        |regexp_replace(
        |  regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |  '\d{4,}', '<NUM>', 'g') AS redacted
        |FROM documents""".stripMargin,

    "t_pack_chunks" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         |  ${md5i("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM documents),
         |o AS (SELECT doc_id, shard, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset" FROM t)
         |SELECT doc_id, shard, n_tokens, "offset",
         |  CAST(floor("offset" / 512) AS BIGINT) AS chunk,
         |  (n_tokens > 0 AND
         |   CAST(floor(("offset" + n_tokens - 1) / 512) AS BIGINT) > CAST(floor("offset" / 512) AS BIGINT)) AS straddles
         |FROM o""".stripMargin,

    // Gopher repetition filters: per-doc word/3-gram repeat fractions +
    // top-3-gram share. Ratios floor-truncated to 4dp (engine-portable);
    // docs with <3 words have no 3-grams → fractions 0 via LEFT JOIN +
    // coalesce, mirroring repetitionStats exactly.
    "t_repetition" ->
      s"""$SHINGLE_CTES,
         |g AS (SELECT doc_id, unnest(sh) AS gram FROM s),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
         |ng AS (SELECT doc_id, sum(cnt) AS tot, count(*) AS dst, max(cnt) AS top
         |  FROM c GROUP BY 1),
         |d AS (SELECT doc_id,
         |  CASE WHEN len(w) > 0
         |    THEN floor((1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 10000) / 10000
         |    ELSE 0.0 END AS dup_word_frac FROM t)
         |SELECT d.doc_id, d.dup_word_frac,
         |  coalesce(floor((1.0 - CAST(dst AS DOUBLE) / tot) * 10000) / 10000, 0.0) AS dup_ngram_frac,
         |  coalesce(floor(CAST(top AS DOUBLE) / tot * 10000) / 10000, 0.0) AS top_ngram_frac
         |FROM d LEFT JOIN ng USING (doc_id)""".stripMargin,

    // Gopher quality flags: integer counts → IEEE-identical doubles in any
    // engine; reported ratios floor-4dp, the pass verdict on UNtruncated
    // values — both mirror gopherQuality term for term.
    "t_gopher_quality" ->
      s"""$GOPHER_CTES
         |SELECT doc_id, n_words,
         |  floor(mean_len * 10000) / 10000 AS mean_word_len,
         |  floor(sym_ratio * 10000) / 10000 AS symbol_ratio,
         |  floor(bullet_ratio * 10000) / 10000 AS bullet_ratio,
         |  floor(ellipsis_ratio * 10000) / 10000 AS ellipsis_ratio,
         |  floor(alpha_frac * 10000) / 10000 AS alpha_word_frac,
         |  ($GOPHER_PASS) AS passes
         |FROM m""".stripMargin,

    // Bigram LM: contexts are the first word of the space-joined gram;
    // HUGEINT sums cast back; ties in the global top-K break on gram.
    "t_ngram_lm" ->
      s"""$WORDS_CTE,
         |s AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(w) - 1, 0)),
         |  i -> w[i] || ' ' || w[i+1]) AS sh FROM t),
         |g AS (SELECT unnest(sh) AS gram FROM s),
         |c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1),
         |x AS (SELECT gram, cnt, (string_split(gram, ' '))[1] AS ctx FROM c),
         |ct AS (SELECT ctx, CAST(sum(cnt) AS BIGINT) AS ctx_cnt FROM x GROUP BY 1),
         |r AS (SELECT x.gram, x.ctx, CAST(x.cnt AS BIGINT) AS cnt, ct.ctx_cnt,
         |  CAST(row_number() OVER (ORDER BY x.cnt DESC, x.gram) AS INTEGER) AS rank
         |  FROM x JOIN ct USING (ctx))
         |SELECT gram, ctx, cnt, ctx_cnt,
         |  floor(CAST(cnt AS DOUBLE) / ctx_cnt * 10000) / 10000 AS cond_p, rank
         |FROM r WHERE rank <= 1000""".stripMargin,

    // Sliding windows: all-integer start/index/size arithmetic; both
    // engines' series and slices are 1-based inclusive.
    "t_chunk_windows" ->
      s"""$WORDS_CTE,
         |s AS (SELECT doc_id, w, unnest(generate_series(1, len(w), 12)) AS start
         |  FROM t WHERE len(w) > 0)
         |SELECT doc_id, (start - 1) // 12 AS chunk_idx,
         |  CAST(least(16, len(w) - start + 1) AS BIGINT) AS chunk_tokens,
         |  array_to_string(list_slice(w, start, start + 15), ' ') AS chunk_text
         |FROM s""".stripMargin,

    // LM coverage: the t_ngram_lm table as a CTE, left-joined per doc
    // gram; integer counts + integer hit mass + ONE floored division
    // (IEEE division is correctly rounded — identical in both engines).
    "t_lm_coverage" ->
      s"""$WORDS_CTE,
         |s AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(w) - 1, 0)),
         |  i -> w[i] || ' ' || w[i+1]) AS sh FROM t),
         |g AS (SELECT doc_id, unnest(sh) AS gram FROM s),
         |c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1),
         |r AS (SELECT gram, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(row_number() OVER (ORDER BY cnt DESC, gram) AS INTEGER) AS rank FROM c),
         |lm AS (SELECT gram, cnt FROM r WHERE rank <= 1000),
         |a AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(count(lm.cnt) AS BIGINT) AS n_known,
         |  CAST(coalesce(sum(lm.cnt), 0) AS BIGINT) AS hit_weight
         |  FROM g LEFT JOIN lm USING (gram) GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams,
         |  coalesce(a.n_known, 0) AS n_known,
         |  coalesce(a.hit_weight, 0) AS hit_weight,
         |  CASE WHEN coalesce(a.n_grams, 0) > 0
         |    THEN floor(CAST(a.n_known AS DOUBLE) / a.n_grams * 10000) / 10000
         |    ELSE 0.0 END AS coverage
         |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,

    // DSIR weight: the t_ngram_lm table twice — once over the lang='en'
    // slice (target), once over the corpus (background); integer hit
    // masses, add-one smoothing, ONE floored division (both engines
    // divide the same BIGINTs, so the 6dp floor is identical).
    "t_dsir_weight" ->
      s"""$WORDS_CTE,
         |s AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(w) - 1, 0)),
         |  i -> w[i] || ' ' || w[i+1]) AS sh FROM t),
         |g AS (SELECT doc_id, unnest(sh) AS gram FROM s),
         |tc AS (SELECT gram, count(*) AS cnt
         |  FROM g JOIN documents d USING (doc_id) WHERE d.lang = 'en' GROUP BY 1),
         |tr AS (SELECT gram, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(row_number() OVER (ORDER BY cnt DESC, gram) AS INTEGER) AS rank FROM tc),
         |tlm AS (SELECT gram, cnt FROM tr WHERE rank <= 1000),
         |bc AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1),
         |br AS (SELECT gram, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(row_number() OVER (ORDER BY cnt DESC, gram) AS INTEGER) AS rank FROM bc),
         |blm AS (SELECT gram, cnt FROM br WHERE rank <= 1000),
         |a AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(coalesce(sum(tlm.cnt), 0) AS BIGINT) AS target_mass,
         |  CAST(coalesce(sum(blm.cnt), 0) AS BIGINT) AS background_mass
         |  FROM g LEFT JOIN tlm USING (gram) LEFT JOIN blm USING (gram) GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams,
         |  coalesce(a.target_mass, 0) AS target_mass,
         |  coalesce(a.background_mass, 0) AS background_mass,
         |  floor(CAST(coalesce(a.target_mass, 0) + 1 AS DOUBLE)
         |    / (coalesce(a.background_mass, 0) + 1) * 1000000) / 1000000 AS weight
         |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin,

    // Vocabulary coverage: exact integer counts → identical rank /
    // prefix-sum on any engine; cum_share is ONE floored division.
    "t_vocab_coverage" ->
      """WITH t AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY term),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        |r AS (SELECT term, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INTEGER) AS rank
        |  FROM c QUALIFY rank <= 1000)
        |SELECT term, cnt, rank,
        |  CAST(sum(cnt) OVER (ORDER BY rank) AS BIGINT) AS cum_cnt,
        |  floor(CAST(sum(cnt) OVER (ORDER BY rank) AS DOUBLE) / total * 1000000) / 1000000 AS cum_share
        |FROM r CROSS JOIN tot""".stripMargin,

    // Per-language quintile cut: the t_quality_cut quality formula with
    // quantile_cont PER LANG (== Spark's exact percentile, the f5 recipe).
    "t_quality_cut_by_lang" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM documents),
        |m AS (SELECT doc_id, lang,
        |  CAST(len(w) AS BIGINT) AS n_tokens,
        |  (CAST(length(text) AS DOUBLE) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |    / CAST(length(text) AS DOUBLE) AS punct,
        |  CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)), (a,b) -> a + b) AS DOUBLE)
        |    / greatest(len(w), 1) AS meanlen
        | FROM t),
        |q AS (SELECT doc_id, lang,
        |  floor(least(greatest(0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct)
        |    + 0.3 * least(meanlen / 8.0, 1.0), 0.0), 1.0) * 10000) / 10000 AS quality
        |  FROM m),
        |th AS (SELECT lang, quantile_cont(quality, 0.2) AS threshold FROM q GROUP BY 1)
        |SELECT doc_id, q.lang AS lang, quality, threshold, quality >= threshold AS kept
        |FROM q JOIN th ON q.lang = th.lang""".stripMargin,

    // CCNet buckets: the t_lm_coverage coverage computation + per-lang
    // quantile_cont terciles and the head/middle/tail case.
    "t_ccnet_buckets" ->
      s"""$WORDS_CTE,
         |s AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(w) - 1, 0)),
         |  i -> w[i] || ' ' || w[i+1]) AS sh FROM t),
         |g AS (SELECT doc_id, unnest(sh) AS gram FROM s),
         |c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1),
         |r AS (SELECT gram, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(row_number() OVER (ORDER BY cnt DESC, gram) AS INTEGER) AS rank FROM c),
         |lm AS (SELECT gram, cnt FROM r WHERE rank <= 1000),
         |a AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(count(lm.cnt) AS BIGINT) AS n_known
         |  FROM g LEFT JOIN lm USING (gram) GROUP BY 1),
         |cov AS (SELECT d.doc_id, d.lang,
         |  CASE WHEN coalesce(a.n_grams, 0) > 0
         |    THEN floor(CAST(a.n_known AS DOUBLE) / a.n_grams * 10000) / 10000
         |    ELSE 0.0 END AS coverage
         |  FROM documents d LEFT JOIN a USING (doc_id)),
         |th AS (SELECT lang, quantile_cont(coverage, 0.33) AS th_low,
         |  quantile_cont(coverage, 0.67) AS th_high FROM cov GROUP BY 1)
         |SELECT cov.doc_id, cov.lang AS lang, coverage, th_low, th_high,
         |  CASE WHEN coverage >= th_high THEN 'head'
         |    WHEN coverage >= th_low THEN 'middle' ELSE 'tail' END AS bucket
         |FROM cov JOIN th ON cov.lang = th.lang""".stripMargin,
  )
}
