package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing.md5Long

/** Deduplication operators for large-scale text corpora.
  *
  * Everything is expressed with codegen'd built-ins (split / transform /
  * aggregate / array_* higher-order functions) — no UDFs, no explode where
  * an array fold suffices, so per-document work stays inside one
  * whole-stage-codegen span and the only shuffles are the ones the
  * algorithm inherently needs (the LSH bucket join, the final dedup).
  *
  * Scale notes (100 TB):
  *   - minhash signatures are computed in a single map pass (k array-min
  *     folds per doc), no shuffle;
  *   - LSH banding shuffles only (band, bucket-hash, doc_id) triples —
  *     ~k/r rows of 3 longs per document, independent of document size;
  *   - the candidate self-join is per-bucket; pathological buckets (all
  *     boilerplate docs identical) are capped at `maxBucket` members by
  *     [[Skew.capBuckets]] (exact below the bound, deterministic
  *     hash-sample above it) so per-task join input stays bounded, with
  *     [[lshOverflow]] reporting what was truncated;
  *   - exact dedup is a hash groupBy on a 128-bit fingerprint, the cheapest
  *     possible shuffle key.
  */
object Dedup {

  /** Whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= lit(""))

  /** Word n-gram shingles as an array column (empty if doc has < n words).
    * NOTE: Spark's `sequence(1, 0)` yields a DESCENDING [1,0] — not the
    * empty list SQL engines produce — so short docs need an explicit guard.
    *
    * The tokenized array is LET-BOUND once per row via a single-element
    * outer transform: higher-order-function lambdas evaluate interpreted,
    * so referencing the tokenize subtree directly inside the per-element
    * lambda re-runs the regex split once per shingle — O(words²) regex
    * work per document (measured 2.8 s vs 0.37 s for the corpus bigram
    * explode at sf0.1). */
  def shingles(text: Column, n: Int = 3): Column =
    element_at(
      transform(array(tokens(text)), w =>
        when(size(w) >= n,
          transform(
            sequence(lit(1), size(w) - (n - 1)),
            i => concat_ws(" ", slice(w, i, lit(n)))))
          .otherwise(array().cast("array<string>"))),
      1)

  /** MinHash signature: k independent 60-bit min-hashes over shingles.
    * Returns the input plus columns h1..hk (NULL when no shingles). */
  def minhashSignature(docs: DataFrame, textCol: String, k: Int = 8, n: Int = 3): DataFrame = {
    val sh = shingles(col(textCol), n)
    val withSh = docs.withColumn("__sh", sh)
    (1 to k).foldLeft(withSh) { (df, i) =>
      df.withColumn(s"h$i", array_min(transform(col("__sh"), s => md5Long(s, i))))
    }.drop("__sh")
  }

  /** LSH banding: (id, band, bucket) rows from a minhash signature with
    * `bands` bands of `rowsPerBand` hashes each. */
  def lshBuckets(sig: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val hs = (1 to rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}").cast("string"))
      // concat (not concat_ws): a NULL hash must NULL the bucket, exactly
      // like SQL || — concat_ws would silently skip it.
      val joined = hs.init.flatMap(h => Seq(h, lit("_"))) :+ hs.last
      struct(lit(b).as("band"), md5Long(concat(joined: _*)).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate near-duplicate pairs: docs sharing at least one LSH bucket.
    * Returns distinct (id_a, id_b) with id_a < id_b.
    *
    * Hot buckets (all-identical boilerplate docs) are capped at `maxBucket`
    * members via [[Skew.capBuckets]] — exact below the cap, deterministic
    * hash-sample above it, so per-task self-join input is bounded by
    * maxBucket² however skewed the corpus. Audit the truncation with
    * [[lshOverflow]]. */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
                    bands: Int = 4, rowsPerBand: Int = 2, n: Int = 3,
                    maxBucket: Int = 8192): DataFrame = {
    val sig = minhashSignature(docs, textCol, bands * rowsPerBand, n)
    // Persist the RAW bucket table: the size count, and both sides of the
    // self-join, read it — recomputing would re-hash every shingle of the
    // corpus per consumer. One row per (doc, band) — negligible next to
    // the corpus at any scale. The capped view stays derived (a cheap join
    // against the cached table + cached sizes). The cache lives until LRU
    // eviction — the returned frame still reads it lazily, so this
    // function cannot unpersist; a long-lived session composing many of
    // these calls reclaims them with spark.catalog.clearCache() (same
    // contract at the substringSpans and keepBest persists).
    val raw = lshBuckets(sig, idCol, bands, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = Skew.capBuckets(raw, Seq("band", "bucket"), idCol, maxBucket)
    val l = b.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val r = b.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Incremental snapshot dedup: screen a `delta` batch (a new crawl
    * snapshot / ingest increment) against an existing `base` corpus and
    * keep only delta docs with no verified near-duplicate already in
    * base. THE production dedup pattern at 100 TB — a full-corpus
    * self-join per ingest is unpayable, so each increment probes the
    * corpus's LSH band-bucket index instead:
    *
    *   1. PROBE: delta band-buckets join base band-buckets. In
    *      production the base side is the PERSISTED index (written
    *      bucketed on (band, bucket) by the previous run — the
    *      [[GraphStorage]] layout trick); only the delta (snapshot-sized,
    *      not corpus-sized) is hashed fresh, and the join touches just
    *      the index partitions delta's buckets land in. Hot boilerplate
    *      buckets on the base side are capped at `maxBucket` exactly like
    *      [[lshCandidates]]'s self-join.
    *   2. VERIFY: exact n-gram Jaccard, but only for colliding pairs —
    *      base text is semi-join-pruned to the hit ids BEFORE shingling,
    *      so corpus text is neither re-shingled nor shuffled for the
    *      non-colliding overwhelming majority.
    *   3. VERDICT: per delta doc, `keep` = no verified match at
    *      `tau`; `dup_of` = the smallest matching base id (the canonical
    *      pointer), `max_jaccard` = the strongest evidence. Jaccard is
    *      floor-4dp ([[ngramJaccard]]'s quantization), so verdicts are
    *      engine-portable.
    *
    * Returns one row per delta doc: (id, dup_of, max_jaccard, keep). */
  def incrementalDedup(base: DataFrame, delta: DataFrame, idCol: String,
                       textCol: String, tau: Double = 0.5,
                       bands: Int = 4, rowsPerBand: Int = 2, n: Int = 3,
                       maxBucket: Int = 8192): DataFrame = {
    val k = bands * rowsPerBand
    val baseBuckets = Skew.capBuckets(
      lshBuckets(minhashSignature(base, textCol, k, n), idCol, bands, rowsPerBand),
      Seq("band", "bucket"), idCol, maxBucket)
      .select(col("band"), col("bucket"), col(idCol).as("base_id"))
    val deltaBuckets =
      lshBuckets(minhashSignature(delta, textCol, k, n), idCol, bands, rowsPerBand)
        .select(col("band"), col("bucket"), col(idCol).as("delta_id"))
    val cand = deltaBuckets.join(baseBuckets, Seq("band", "bucket"))
      .select(col("delta_id"), col("base_id")).distinct()
    val deltaSh = delta.select(col(idCol).as("delta_id"),
      array_distinct(shingles(col(textCol), n)).as("sh_d"))
    // Prune base to the colliding ids BEFORE computing shingles: the
    // shingle+md5 work and the text shuffle happen only for actual hits.
    val baseHit = base.select(col(idCol).as("base_id"), col(textCol))
      .join(cand.select(col("base_id")).distinct(), Seq("base_id"), "left_semi")
      .select(col("base_id"), array_distinct(shingles(col(textCol), n)).as("sh_b"))
    val verified = cand.join(deltaSh, Seq("delta_id")).join(baseHit, Seq("base_id"))
      .select(col("delta_id"), col("base_id"),
        (floor(size(array_intersect(col("sh_d"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_d"), col("sh_b"))) * 10000) / 10000).as("jaccard"))
      .filter(col("jaccard") >= tau)
    val dup = verified.groupBy(col("delta_id"))
      .agg(min(col("base_id")).as("dup_of"), max(col("jaccard")).as("max_jaccard"))
    delta.select(col(idCol).as("delta_id"))
      .join(dup, Seq("delta_id"), "left")
      .select(col("delta_id").as(idCol), col("dup_of"), col("max_jaccard"),
        col("dup_of").isNull.as("keep"))
  }

  /** LSH buckets exceeding `maxBucket`, with estimated dropped pairs —
    * the audit twin of [[lshCandidates]]'s cap. */
  def lshOverflow(docs: DataFrame, idCol: String, textCol: String,
                  bands: Int = 4, rowsPerBand: Int = 2, n: Int = 3,
                  maxBucket: Int = 8192): DataFrame = {
    val sig = minhashSignature(docs, textCol, bands * rowsPerBand, n)
    Skew.bucketOverflow(lshBuckets(sig, idCol, bands, rowsPerBand),
      Seq("band", "bucket"), maxBucket)
  }

  /** LSH candidate-quality evaluation: exact n-gram Jaccard computed for
    * every [[lshCandidates]] pair, reduced to ONE audit row —
    * (n_candidates, n_true, precision) at the given Jaccard threshold.
    * The dedup-tuning twin of `Similarity.annRecall`'s retrieval eval:
    * it answers "how many of the pairs my band/row configuration
    * surfaces are real near-dups", the number you turn `bands` ×
    * `rowsPerBand` against before a full-corpus run. Both sides compare
    * the SAME floor-4dp Jaccard (the [[ngramJaccard]] quantization), so
    * the verdict is engine-portable.
    *
    * Scale: the pair table is hot-bucket capped (candidate-sized, never
    * corpus²); the distinct-shingle sets join it by id twice — shingle
    * arrays shuffle once per side, text never does; the final agg is a
    * 1-row map-side-combinable reduction. */
  def lshPrecision(docs: DataFrame, idCol: String, textCol: String,
                   bands: Int = 4, rowsPerBand: Int = 2, n: Int = 3,
                   threshold: Double = 0.5, maxBucket: Int = 8192): DataFrame = {
    val pairs = lshCandidates(docs, idCol, textCol, bands, rowsPerBand, n, maxBucket)
    val sets = docs.select(col(idCol), array_distinct(shingles(col(textCol), n)).as("sh"))
    val jac = floor(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))) * 10000) / 10000
    pairs
      .join(sets.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(jac.as("jaccard"))
      .agg(count(lit(1)).cast("long").as("n_candidates"),
        coalesce(sum(when(col("jaccard") >= threshold, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_true"))
      .withColumn("precision", when(col("n_candidates") > 0,
        floor(col("n_true").cast("double") / col("n_candidates") * 10000) / 10000)
        .otherwise(lit(0.0)))
  }

  /** 16-bit SimHash over word unigrams (bit-vote fingerprint).
    * Single map pass: 16 array folds per doc, no shuffle. */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    // The md5-per-word array is let-bound once per row (see [[shingles]]):
    // all `bits` vote folds reference the bound lambda variable, not the
    // tokenize+md5 subtree — which would otherwise re-hash every word
    // `bits` times per document.
    val hsExpr = transform(tokens(col(textCol)), w => md5Long(w))
    val fp = element_at(
      transform(array(hsExpr), hs => {
        val votes = (0 until bits).map { b =>
          aggregate(hs, lit(0L),
            (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1L).otherwise(-1L))
        }
        votes.zipWithIndex.map { case (v, b) =>
          when(v > 0, lit(1L << b)).otherwise(lit(0L))
        }.reduce(_ + _)
      }),
      1)
    docs.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash near-duplicate join (the Manku–Jain–Sarma WWW'07 web-crawl
    * dedup): all pairs whose [[simhash]] fingerprints differ in at most
    * `maxHamming` bits. The fingerprint splits into `maxHamming + 1`
    * equal bit-bands; by pigeonhole a pair inside the Hamming ball agrees
    * EXACTLY on at least one band, so candidates come from per-band
    * equi-joins on the band value — never an all-pairs scan — deduped and
    * exact-filtered by the popcount of the XOR. Unlike MinHash banding
    * the blocking is lossless: recall within the Hamming radius is 1.
    * Output: (id_a, id_b, hamming) with id_a < id_b.
    *
    * Defaults are sized for the banding to discriminate: 48-bit
    * fingerprints give 4 bands of 12 bits (4096 values per band), so
    * bucket population stays ~|corpus|/4096 per band and the pair join is
    * candidate-sized. 16-bit fingerprints (the [[simhash]] gate default)
    * would put a whole corpus into 16 buckets per band — fine for a
    * fingerprint COLUMN, useless as a blocking key. Hot bands (boilerplate
    * fingerprints) are capped via [[Skew.capBuckets]] like every blocking
    * join here — exact below the cap, audited above it. Only (id,
    * fingerprint, band) rows ever shuffle; the text is consumed map-side
    * by the fingerprint fold. */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     bits: Int = 48, maxHamming: Int = 3,
                     maxBucket: Int = 8192): DataFrame = {
    require(bits >= 2 && bits <= 63, s"bits must be in 2..63, got $bits")
    hammingNearDup(simhash(docs, idCol, textCol, bits), idCol, "simhash",
      bits, maxHamming, maxBucket)
  }

  /** Banded hamming-ball self-join over ANY precomputed fingerprint
    * column (text simhash, image aHash, audio fingerprints …): pigeonhole
    * the `bits` into maxHamming+1 equal bands — a pair within the ball
    * must agree exactly on at least one band — equi-join per band, then
    * the exact popcount filter. Recall 1 within the radius; per-task join
    * input is O(maxBucket²) via [[Skew.capBuckets]]. Only (id,
    * fingerprint, band-value) longs shuffle. `bits` may be the full 64
    * (the sign bit participates like any other; band masks strip
    * arithmetic-shift sign extension). */
  def hammingNearDup(fps: DataFrame, idCol: String, fpCol: String,
                     bits: Int = 48, maxHamming: Int = 3,
                     maxBucket: Int = 8192): DataFrame = {
    require(bits >= 2 && bits <= 64, s"bits must be in 2..64, got $bits")
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    require(bits % (maxHamming + 1) == 0,
      s"bits ($bits) must divide into maxHamming + 1 (${maxHamming + 1}) equal bands")
    val bandBits = bits / (maxHamming + 1)
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val fp = fps.select(col(idCol), col(fpCol).as("simhash"))
    val bandVals = array((0 to maxHamming).map(b =>
      shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))): _*)
    // Persist the banded table (the lshCandidates pattern): the cap's
    // size count and BOTH self-join sides scan it, and each uncached scan
    // re-runs the `bits` vote folds over the whole corpus — the dominant
    // cost of this operator (measured 3× fingerprint recompute ≈ 5 s vs
    // ~1.5 s cached at sf0.1). (id, fingerprint, band) longs only.
    val banded = fp.select(col(idCol), col("simhash"),
        posexplode(bandVals).as(Seq("band", "bval")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = Skew.capBuckets(banded, Seq("band", "bval"), idCol, maxBucket)
    val l = b.select(col("band"), col("bval"), col(idCol).as("id_a"),
      col("simhash").as("fp_a"))
    val r = b.select(col("band"), col("bval"), col(idCol).as("id_b"),
      col("simhash").as("fp_b"))
    l.join(r, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Cap-precondition audit for [[simhashNearDup]]: the (band, band-value)
    * buckets whose membership exceeds `maxBucket` — non-empty means the
    * capped join is sampling and the uncapped oracle would diverge. */
  def simhashOverflow(docs: DataFrame, idCol: String, textCol: String,
                      bits: Int = 48, maxHamming: Int = 3,
                      maxBucket: Int = 8192): DataFrame = {
    val bandBits = bits / (maxHamming + 1)
    val mask = (1L << bandBits) - 1
    val fp = simhash(docs, idCol, textCol, bits)
    val bandVals = array((0 to maxHamming).map(b =>
      shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))): _*)
    Skew.bucketOverflow(
      fp.select(col(idCol), posexplode(bandVals).as(Seq("band", "bval"))),
      Seq("band", "bval"), maxBucket)
  }

  /** Cap-precondition audit for [[hammingNearDup]] over ANY precomputed
    * fingerprint column — the fingerprint-generic twin of
    * [[simhashOverflow]]. The image/audio near-dup gates run the capped
    * join against uncapped oracles, and degenerate fingerprints are
    * common in those modalities (a uniform image aHashes to 0, short
    * audio leaves the high bands all-zero), so one hot (band, bval)
    * bucket can silently cross the cap at a larger corpus — non-empty
    * output means the capped join is sampling where the oracle is not. */
  def hammingOverflow(fps: DataFrame, idCol: String, fpCol: String,
                      bits: Int = 64, maxHamming: Int = 3,
                      maxBucket: Int = 8192): DataFrame = {
    val bandBits = bits / (maxHamming + 1)
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val bandVals = array((0 to maxHamming).map(b =>
      shiftright(col(fpCol), b * bandBits).bitwiseAND(lit(mask))): _*)
    Skew.bucketOverflow(
      fps.select(col(idCol), posexplode(bandVals).as(Seq("band", "bval"))),
      Seq("band", "bval"), maxBucket)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs that share the
    * first minhash (a 1-hash LSH prefilter), rounded to 4 decimals.
    * The prefilter bucket is capped like [[lshCandidates]]'s (same hot-key
    * failure mode: every boilerplate doc shares one h1). */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
                   maxBucket: Int = 8192): DataFrame = {
    // Persist the RAW shingle table: the cap's size count and both join
    // sides scan it, and the shingle set + hash are the expensive part
    // (one md5 per shingle). One row per doc; the capped view is a cheap
    // derived join against it.
    val pre = docs.select(col(idCol), array_distinct(shingles(col(textCol), n)).as("sh"),
      array_min(transform(shingles(col(textCol), n), s => md5Long(s, 1))).as("h1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = Skew.capBuckets(pre, Seq("h1"), idCol, maxBucket)
    val l = base.select(col("h1"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val r = base.select(col("h1"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("h1")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // floor-truncate, not round: ratios of small ints (7/32) land on
        // exact .xxxx5 ties where Spark and other engines round apart.
        (floor(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))) * 10000) / 10000).as("jaccard"))
      .distinct()
  }

  /** Asymmetric n-gram CONTAINMENT for the same 1-hash-prefilter candidate
    * pairs as [[ngramJaccard]]: cont_ab = |A∩B|/|A| and cont_ba = |A∩B|/|B|
    * (Broder's containment, the quote/subset detector). A short doc quoted
    * wholly inside a much larger one scores cont≈1.0 while its Jaccard
    * dilutes toward |A|/|B| — symmetric scores systematically miss
    * boilerplate-inclusion and excerpt duplicates, which is why dedup
    * stacks track both. Same skew bound and floor-4dp engine-portable
    * quantization as [[ngramJaccard]]; one exchange on h1, text never
    * shuffles past the shingle projection. */
  def ngramContainment(docs: DataFrame, idCol: String, textCol: String, n: Int = 3,
                       maxBucket: Int = 8192): DataFrame = {
    val pre = docs.select(col(idCol), array_distinct(shingles(col(textCol), n)).as("sh"),
      array_min(transform(shingles(col(textCol), n), s => md5Long(s, 1))).as("h1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = Skew.capBuckets(pre, Seq("h1"), idCol, maxBucket)
    val l = base.select(col("h1"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val r = base.select(col("h1"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    l.join(r, Seq("h1")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (floor(inter / size(col("sh_a")) * 10000) / 10000).as("cont_ab"),
        (floor(inter / size(col("sh_b")) * 10000) / 10000).as("cont_ba"))
      .distinct()
  }

  /** Signature-only containment ESTIMATE over LSH candidate pairs — the
    * 100 TB twin of [[ngramContainment]]: the verification join ships k
    * signature longs and ONE exact set-size scalar per doc, never the
    * shingle sets (which are document-sized — at corpus scale the exact
    * verifier's exchange is the corpus again; this one's is k+1 longs).
    *
    * Math, all engine-portable integers until the final floor-4dp:
    * positional agreement m of k minhashes estimates Ĵ = m/k, and the
    * inclusion–exclusion identity J = I/(|A|+|B|−I) inverts to
    * I_est = m·(|A|+|B|) div (k+m); containments divide I_est by the
    * exact |A| / |B|. Output: (id_a, id_b, matches, cont_ab_est,
    * cont_ba_est). Same cap + NULL-signature (<n-word docs) exclusions
    * as [[lshCandidates]]. */
  def containmentEstimate(docs: DataFrame, idCol: String, textCol: String,
                          bands: Int = 4, rowsPerBand: Int = 2, n: Int = 3,
                          maxBucket: Int = 8192): DataFrame = {
    val k = bands * rowsPerBand
    val sig = minhashSignature(docs, textCol, k, n)
      .withColumn("__sz", size(array_distinct(shingles(col(textCol), n))).cast("long"))
      .select(col(idCol) +: (1 to k).map(i => col(s"h$i")) :+ col("__sz"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = Skew.capBuckets(
      lshBuckets(sig, idCol, bands, rowsPerBand), Seq("band", "bucket"), idCol, maxBucket)
    val cand = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
      .join(buckets.select(col("band"), col("bucket"), col(idCol).as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    def side(as: String) = sig.select(
      col(idCol).as(as),
      array((1 to k).map(i => col(s"h$i")): _*).as(s"sig_$as"),
      col("__sz").as(s"sz_$as"))
    cand.join(side("id_a"), Seq("id_a")).join(side("id_b"), Seq("id_b"))
      .withColumn("matches", aggregate(
        zip_with(col("sig_id_a"), col("sig_id_b"),
          (x, y) => when(x.isNotNull && x === y, 1L).otherwise(0L)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("__i", expr(s"matches * (sz_id_a + sz_id_b) div ($k + matches)"))
      .select(col("id_a"), col("id_b"), col("matches"),
        (floor(col("__i").cast("double") / col("sz_id_a") * 10000) / 10000).as("cont_ab_est"),
        (floor(col("__i").cast("double") / col("sz_id_b") * 10000) / 10000).as("cont_ba_est"))
  }

  /** Train↔benchmark contamination scan: for every (train doc, bench
    * doc) pair sharing at least `minShared` distinct word n-grams,
    * the count of shared n-grams — the decontamination pass run before
    * training so eval sets aren't memorized. One shuffle on the 60-bit
    * shingle hash (never the text). Shingle hashes are md5 — any engine
    * reproduces the counts exactly.
    *
    * Hot-shingle bound: the h-join produces |train postings| × |bench
    * postings| rows PER SHINGLE, and a stopword n-gram ("of the and")
    * appears in nearly every document — at corpus scale one such key is a
    * near-cartesian blowup on a single reducer. Shingles whose document
    * frequency (across train ∪ bench) exceeds `maxDf` are dropped before
    * the join: they carry no contamination signal (sharing a universal
    * n-gram is not evidence of copying), and the filter is a deterministic
    * exact count, so any engine mirrors it bit-for-bit. The surviving
    * per-shingle fan-out is ≤ maxDf². Set `maxDf = 0` to disable. */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, minShared: Int = 3,
                    maxDf: Int = 8192): DataFrame = {
    def sh(df: DataFrame, as: String) = df.select(
      col(idCol).as(as),
      explode(array_distinct(transform(shingles(col(textCol), n), s => md5Long(s)))).as("h"))
    val tr = sh(train, "train_id")
    val be = sh(bench, "bench_id")
    val (trB, beB) =
      if (maxDf <= 0) (tr, be)
      else {
        // Hot set is ≤ |postings|/maxDf keys — small but NOT always
        // broadcastable at corpus scale, so a shuffle-hash anti-join (the
        // sides are already exchanged on h for the main join; AQE reuses
        // the partitioning).
        val hot = tr.select(col("h")).unionByName(be.select(col("h")))
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("h"))
        (tr.join(hot.hint("shuffle_hash"), Seq("h"), "left_anti"),
         be.join(hot.hint("shuffle_hash"), Seq("h"), "left_anti"))
      }
    trB.join(beB, Seq("h"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Bloom-filter decontamination probe: flag corpus rows whose `keyCol`
    * (e.g. a text fingerprint) MAY be in the benchmark set, using a
    * Bloom bitset instead of a corpus×benchmark join — the constant-space
    * membership screen a 100 TB pipeline runs map-side before (or instead
    * of) the exact pass. Each benchmark key sets `kHashes` md5-seeded bit
    * positions in an `mBits`-slot bitset; a corpus row is flagged iff ALL
    * of its positions are set (classic Bloom semantics: no false
    * negatives, tunable false positives). Output: one row per corpus row,
    * (id, bloom_hit, exact_hit) — exact_hit is the ground-truth equi-join
    * flag, so the false-positive rows are exactly bloom_hit ∧ ¬exact_hit
    * and the no-false-negative invariant (exact_hit → bloom_hit) is
    * visible in the result.
    *
    * Scale: the bitset is ≤ min(mBits, kHashes·|bench|) distinct set
    * positions, collected to ONE array row and broadcast — benchmark
    * sets are eval-suite sized, so this is kilobytes where a distributed
    * anti-join would shuffle the corpus's key column; the probe is then a
    * pure map-side `forall(array_contains)` over the broadcast array
    * (O(kHashes · log |bits|) per row, no exchange). The exact_hit join
    * broadcasts the same benchmark-sized key list. The corpus is never
    * shuffled and text never moves. Everything is md5-derived —
    * bit-reproducible in any engine. */
  def bloomDecontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                         keyCol: String, mBits: Int = 1 << 20,
                         kHashes: Int = 3): DataFrame = {
    require(mBits >= 2, s"mBits must be >= 2, got $mBits")
    require(kHashes >= 1 && kHashes <= 16, s"kHashes must be 1..16, got $kHashes")
    def positions(c: Column): Column =
      array((0 until kHashes).map(i => pmod(md5Long(c, i), lit(mBits.toLong))): _*)
    val bits = bench
      .select(explode(positions(col(keyCol))).as("bit")).distinct()
      .agg(sort_array(collect_list(col("bit"))).as("__bits"))
    val exactKeys = bench.select(col(keyCol)).distinct()
      .withColumn("__exact", lit(true))
    corpus.select(col(idCol), col(keyCol))
      .crossJoin(broadcast(bits))
      .withColumn("bloom_hit",
        forall(positions(col(keyCol)), p => array_contains(col("__bits"), p)))
      .join(broadcast(exactKeys), Seq(keyCol), "left")
      .select(col(idCol), col("bloom_hit"),
        coalesce(col("__exact"), lit(false)).as("exact_hit"))
  }

  /** Exact substring-duplication spans — the distributed re-expression of
    * suffix-array exact-substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better": mask any ≥k-token span
    * that recurs verbatim in the corpus). Every k-token window is hashed
    * at its position; windows whose hash occurs in ≥ `minDocs` distinct
    * documents are flagged. Output one row per flagged span:
    * (id, start, span_hash, df) with `start` the 1-based token offset —
    * the span list a dedup pass masks or cuts before training.
    *
    * Scale: window strings hash map-side from the let-bound token array
    * (O(tokens) regex work per doc); the document-frequency count moves
    * only (span_hash, id) longs through a two-level aggregation (distinct
    * pairs, then counts — no count-distinct single-reducer); the flag
    * join re-shuffles (id, start, span_hash) triples on the hash key —
    * document text never crosses an exchange. Unlike pair enumeration
    * (LSH/Jaccard), flagging is linear in posting-list size — no O(df²)
    * hot-bucket blowup, so no cap is needed. */
  def substringSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minDocs: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // Persist the hashed windows (the [[lshCandidates]] raw-bucket
    // pattern): both the df branch and the flag join read them, and
    // recomputing would re-tokenize and re-hash every window of the
    // corpus per branch. Three longs per window — negligible next to the
    // text it replaces at any scale. Cache lifetime is the session's (LRU
    // evictable; the lazy return means no in-function unpersist is
    // possible) — reclaim with spark.catalog.clearCache(), as at the
    // lshCandidates persist.
    val spans = docs.select(col(idCol), posexplode(shingles(col(textCol), k)))
      .select(col(idCol), (col("pos") + 1).cast("long").as("start"),
        md5Long(col("col")).as("span_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = spans.select(col("span_hash"), col(idCol)).distinct()
      .groupBy(col("span_hash")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
    spans.join(dfreq, Seq("span_hash"))
      .select(col(idCol), col("start"), col("span_hash"), col("df"))
  }

  /** Cross-corpus exact-substring decontamination — the probe half of
    * [[substringSpans]]: flags each k-token window of `corpus` whose hash
    * occurs ANYWHERE in `probe` ("this training span appears verbatim in
    * the benchmark"), at its position. Span-level, so a single leaked
    * question inside an otherwise-clean document is found and cuttable —
    * [[contamination]]'s doc-level verdict can only drop the whole doc.
    * Returns (id, start, span_hash, n_probe_docs); compose with
    * [[spanIntervals]] for the maximal per-doc cut list.
    *
    * Scale: text never shuffles — only (id, pos, hash) triples move. The
    * probe side reduces to DISTINCT span hashes with a per-hash probe-doc
    * count (benchmark-sized, orders smaller than the corpus), so AQE
    * broadcasts the join whenever the benchmark fits an executor; the
    * corpus side streams map-side with no self-join anywhere — linear in
    * corpus postings, no pair enumeration, no hot-bucket cap needed. */
  def crossSpans(corpus: DataFrame, probe: DataFrame, idCol: String,
                 textCol: String, k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def windows(df: DataFrame) =
      df.select(col(idCol), posexplode(shingles(col(textCol), k)))
        .select(col(idCol), (col("pos") + 1).cast("long").as("start"),
          md5Long(col("col")).as("span_hash"))
    val probeHashes = windows(probe)
      .select(col("span_hash"), col(idCol)).distinct()
      .groupBy(col("span_hash")).agg(count(lit(1)).as("n_probe_docs"))
    windows(corpus).join(probeHashes, Seq("span_hash"))
      .select(col(idCol), col("start"), col("span_hash"), col("n_probe_docs"))
  }

  /** Maximal duplicated intervals per document — the apply half of
    * exact-substring dedup: merges [[substringSpans]]' overlapping or
    * adjacent k-token windows into (id, span_start, span_end, n_windows)
    * token intervals, the actual cut list (Lee et al. cut the UNION of
    * recurring spans, not each window separately). Classic
    * gaps-and-islands: with equal-length windows sorted by start, a new
    * island begins where the gap to the previous start exceeds k; island
    * bounds are min(start) / max(start)+k-1. All-integer arithmetic.
    *
    * Scale: ONE window pass partitioned by document over the flagged
    * spans only (already orders smaller than the corpus); per-document
    * state is the spans of that document, bounded by its token count. */
  def spanIntervals(spans: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("start"))
    spans.select(col(idCol), col("start"))
      .withColumn("__brk",
        when(col("start") - lag(col("start"), 1).over(byDoc) > k || lag(col("start"), 1).over(byDoc).isNull, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("start")).as("span_start"),
        (max(col("start")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** The final apply step of exact-substring dedup: rebuild each document
    * with the cut-list token intervals REMOVED — [[substringSpans]] finds
    * the recurring windows, [[spanIntervals]] merges them into maximal
    * intervals, and this cuts them out of the text (Lee et al. 2021 drop
    * the duplicated span, not the document). Output is
    * (id, clean_text, n_removed): surviving tokens re-joined with single
    * spaces (tokenization is the canonical form — original inter-token
    * whitespace is not preserved), plus the removed-token count.
    * Documents with no intervals pass through with n_removed = 0.
    *
    * Scale: intervals aggregate to one row per CUT document (orders
    * smaller than the corpus — per-doc state is bounded by the doc's own
    * token count), so AQE broadcasts the left join and the text column
    * itself never shuffles; the token filter is one map-side pass per
    * row. No UDF — positions come from `sequence`/`flatten`, the keep
    * decision is an index-lambda `filter`. */
  def applyCuts(docs: DataFrame, intervals: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val cuts = intervals
      .select(col(idCol),
        sequence(col("span_start"), col("span_end")).as("__pos"))
      .groupBy(col(idCol)).agg(flatten(collect_list(col("__pos"))).as("__cut"))
    val cut = coalesce(col("__cut"), array().cast("array<long>"))
    docs.join(cuts, Seq(idCol), "left")
      .withColumn("__w", tokens(col(textCol)))
      .withColumn("__kept",
        filter(col("__w"), (_, i) => !array_contains(cut, (i + 1).cast("long"))))
      .select(col(idCol), array_join(col("__kept"), " ").as("clean_text"),
        (size(col("__w")) - size(col("__kept"))).cast("long").as("n_removed"))
  }

  /** Percentile-threshold selection — "keep the top (1-p) share by
    * score" without a global sort: the corpus-wide p-quantile of
    * `valueCol` is ONE aggregate, broadcast back over the corpus as a
    * 1-row cross join inside the same lazy plan (no driver action), and
    * every row is flagged `kept` = value >= `threshold` — the dynamic
    * cutoff a quality-filtering pipeline applies ("drop the bottom
    * quintile") when a fixed threshold would drift with the corpus.
    *
    * Scale: the default `approx_percentile` path carries bounded sketch
    * state per partition — the production setting at any corpus size.
    * `exact = true` switches to Spark's exact `percentile`, whose
    * aggregation state is the value multiset (fine to ~1e8 rows) and
    * which is REQUIRED for cross-engine verification — approx sketches
    * differ across engines, exact interpolation does not (the f5 /
    * e4-vs-e4b deterministic-twin pattern). Either way the corpus is
    * never sorted or shuffled: only the aggregate's partial states
    * move. */
  def percentileCut(df: DataFrame, valueCol: String, p: Double,
                    exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    require(accuracy >= 100, s"accuracy must be >= 100, got $accuracy")
    val fn = if (exact) s"percentile(`$valueCol`, $p)"
             else s"approx_percentile(`$valueCol`, $p, $accuracy)"
    val th = df.agg(expr(fn).cast("double").as("threshold"))
    df.crossJoin(broadcast(th))
      .withColumn("kept", col(valueCol) >= col("threshold"))
  }

  /** Per-GROUP percentile cutoff — [[percentileCut]] partitioned by a
    * domain column (language, source): each group gets its OWN threshold,
    * the fairness fix for corpus-wide cuts (a global quality bar silently
    * deletes whole low-resourced languages; CCNet cuts per language for
    * exactly this reason). Adds (threshold, kept) — kept means the row
    * clears ITS group's bar.
    *
    * Scale: the threshold table is one row per group (languages/domains —
    * tens, not millions, by construction) and is broadcast back, so the
    * corpus never re-shuffles: the only exchange is the per-group
    * aggregation, which moves (group, value) pairs — never text. The
    * production path is approx_percentile (a mergeable sketch with
    * map-side partial state, bounded by `accuracy`); `exact = true` is
    * the oracle-able twin (exact percentile collects per-group values —
    * fine at gate scale, sketch at corpus scale). */
  def groupPercentileCut(df: DataFrame, valueCol: String, groupCol: String,
                         p: Double, exact: Boolean = false,
                         accuracy: Int = 10000): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    require(accuracy >= 100, s"accuracy must be >= 100, got $accuracy")
    require(!df.columns.exists(Set("threshold", "kept")),
      "groupPercentileCut adds threshold/kept columns; input already has one — rename it first")
    val fn = if (exact) s"percentile(`$valueCol`, $p)"
             else s"approx_percentile(`$valueCol`, $p, $accuracy)"
    val th = df.groupBy(col(groupCol)).agg(expr(fn).cast("double").as("threshold"))
    df.join(broadcast(th), Seq(groupCol))
      .withColumn("kept", col(valueCol) >= col("threshold"))
  }

  /** Quality-aware canonical selection: within each dup cluster keep the
    * HIGHEST-scoring member, not the smallest id — the representative rule
    * production dedup actually wants ("of these 40 near-identical pages,
    * keep the cleanest one"), applied after [[lshCandidates]] +
    * `Traversal.minLabel` have labeled the clusters. Ties (common when the
    * score is quantized) break to the smallest id, so the choice is total
    * and deterministic. Emits every member as
    * (id, canonical, score, keep) — keep marks the chosen representative,
    * exactly one true per cluster.
    *
    * Scale: NO per-cluster sort window. A web corpus has boilerplate
    * clusters of 10⁵-10⁶ near-identical docs; `row_number over (partition
    * by label order by score)` would hand one task the whole mega-cluster
    * to sort, while the argmax here is two hash AGGREGATES (max score per
    * label, then min id among the maximal members) — both with map-side
    * partial combine, one row per cluster out, skew-proof. The score
    * equality in step two compares a value against a max OF the same
    * values, so it is bit-exact even for floating-point scores. Ids are
    * never cast or negated (no `max_by` struct trick), so string and
    * numeric keys order the same way here as in `minLabel` — the whole
    * cluster→canonical chain is type-generic. */
  def keepBest(members: DataFrame, scores: DataFrame, idCol: String,
               labelCol: String, scoreCol: String): DataFrame = {
    // Persist the (id, label, score) triple (the [[substringSpans]]
    // hashed-window pattern): all three argmax branches read it, and
    // without the persist each branch re-runs the members⋈scores join —
    // at corpus scale that is three reads of the scoring pipeline for
    // one. Three narrow columns, negligible next to the text upstream.
    // Cache lifetime is the session's (LRU evictable; the lazy return
    // means no in-function unpersist is possible) — reclaim with
    // spark.catalog.clearCache(), as at the lshCandidates persist.
    val m = members.select(col(idCol), col(labelCol))
      .join(scores.select(col(idCol), col(scoreCol)), Seq(idCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val best = m.groupBy(col(labelCol)).agg(max(col(scoreCol)).as("__best"))
    val winner = m.join(best, Seq(labelCol))
      .filter(col(scoreCol) === col("__best"))
      .groupBy(col(labelCol)).agg(min(col(idCol)).as("__keep_id"))
    m.join(winner, Seq(labelCol))
      .select(col(idCol), col(labelCol).as("canonical"), col(scoreCol),
        (col(idCol) === col("__keep_id")).as("keep"))
  }

  /** Deterministic hash sampling: keep rows whose md5 key-bucket (0..99)
    * falls below `pct`. Unlike `rand()`-based sampling this is
    * reproducible across engines, runs, retries, and partitionings — the
    * property a training-data pipeline needs so a resampled shard is the
    * SAME shard. Returns the input rows plus the `bucket` column. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    df.withColumn("bucket", md5Long(col(keyCol)) % 100).filter(col("bucket") < pct)
  }

  /** Edit-distance-≤1 fuzzy key self-join via deletion-neighborhood
    * blocking (the FastSS trick): candidate pairs are strings sharing a
    * DELETION VARIANT — the string itself, or the string with one
    * character deleted. That blocking is SOUND for Levenshtein ≤ 1:
    * equal strings share the identity variant, an insert/delete pair
    * (t = del_i(s)) shares t's identity with s's i-th deletion, and a
    * substitution pair shares del_i(s) = del_i(t). Exact levenshtein
    * verifies candidates only, so the corpus is never cross-joined —
    * per-string work is |s|+1 variant rows and a variant bucket groups
    * only near-identical keys (hot degenerate buckets capped by
    * [[Skew.capBuckets]] like every other blocking join here).
    *
    * The entity-resolution / data-cleaning primitive: typo'd emails and
    * member strings (the reference's B7 member parse meets real-world
    * dirt), near-identical doc ids, OCR'd keys.
    *
    * Returns (id_a, id_b, dist) with id_a < id_b and dist ∈ {0, 1}. */
  def editNeighbors(df: DataFrame, idCol: String, strCol: String,
                    maxBucket: Int = 8192): DataFrame = {
    val s = col("__s")
    val dels = transform(sequence(lit(1), length(s)), i =>
      concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s))))
    val variants = df
      .select(col(idCol).as("__id"), col(strCol).as("__s"))
      .select(col("__id"), col("__s"),
        explode(concat(array(s), dels)).as("__v"))
      .dropDuplicates("__id", "__v") // adjacent equal chars repeat a variant
    // persisted (the lshCandidates contract: evictable MEMORY_AND_DISK,
    // no in-function unpersist on a lazily-returned result): BOTH sides
    // of the self-join read this frame — without the cache the variant
    // explode and the cap's count aggregate execute twice per run
    val capped = Skew.capBuckets(variants, Seq("__v"), "__id", maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = capped.select(col("__v"), col("__id").as("id_a"), col("__s").as("s_a"))
    val b = capped.select(col("__v"), col("__id").as("id_b"), col("__s").as("s_b"))
    a.join(b, Seq("__v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b")).distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Deterministic pre-training shuffle + shard assignment: order documents
    * by the md5 hash of their key (a reproducible "random" permutation —
    * same order on every engine, run, retry, and partitioning, unlike
    * `rand()` or `shuffle()`), split them across `nShards` output shards by
    * hash, and stamp each document's position within its shard. The
    * (shard, pos) pair is exactly the bookkeeping a distributed example
    * writer needs: shard i, position p is the same document forever.
    *
    * Scale: one shuffle, partitioned BY SHARD — no global total order
    * exists at any corpus size; each shard's window sorts |docs|/nShards
    * rows, and nShards is the write parallelism knob (thousands at corpus
    * scale). md5 ties are broken by the key itself, so the order is total
    * and the output reproducible. */
  def shuffleShard(df: DataFrame, keyCol: String, nShards: Int = 8): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.select(col(keyCol), md5Long(col(keyCol)).as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select(col(keyCol), col("shard"), col("pos"))
  }

  /** [[shuffleShard]] with the shard count DERIVED from the corpus: one
    * count() pass, then `nShards = max(minShards, ceil(count /
    * maxShardRows))`. Each shard's window sort is a single task over its
    * rows, so an un-sized `nShards` on a billion-doc corpus would
    * serialize into a handful of giant sorts — this keeps per-shard rows
    * near `maxShardRows` (a TARGET, not a bound: md5 splits shards evenly
    * in expectation, so a shard can exceed it by the usual hash variance).
    * Audit the realized sizes with [[shardOverflow]].
    *
    * Unlike the rest of this file, the sizing count() is EAGER and the
    * input plan evaluates twice (once counted, once sharded) — persist
    * `df` around the call if its upstream is expensive. */
  def shuffleShardAuto(df: DataFrame, keyCol: String,
                       maxShardRows: Long = 1000000L, minShards: Int = 8): DataFrame = {
    require(maxShardRows >= 1, s"maxShardRows must be >= 1, got $maxShardRows")
    val n = df.count()
    val derived = math.max(minShards.toLong, (n + maxShardRows - 1) / maxShardRows)
    // A shard is one window-sort task, so > Int.MaxValue shards is a
    // mis-sized maxShardRows, not something to clamp silently past the
    // Int cast.
    require(derived <= Int.MaxValue.toLong,
      s"derived shard count $derived exceeds Int.MaxValue — raise maxShardRows")
    shuffleShard(df, keyCol, derived.toInt)
  }

  /** Audit twin of [[shuffleShard]]: shards whose realized row count
    * exceeds `maxShardRows` — i.e. window-sort tasks bigger than the
    * caller planned for. Non-empty means nShards was sized too small for
    * the corpus (or the md5 split is improbably skewed); resize with
    * [[shuffleShardAuto]]. */
  def shardOverflow(df: DataFrame, keyCol: String, nShards: Int,
                    maxShardRows: Long): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.select(pmod(md5Long(col(keyCol)), lit(nShards.toLong)).as("shard"))
      .groupBy(col("shard")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") > maxShardRows)
  }

  /** Temperature-scaled domain sampling weights (the UniMax / multilingual
    * mixing rule: w_d ∝ n_d^τ, here at τ = 1/2): square-root scaling
    * upweights small domains relative to proportional sampling without
    * letting a giant domain drown the mixture — the standard fix for
    * long-tailed source/language distributions. Emits one row per domain:
    * (domain, n_docs, weight), Σ weight ≈ 1 (6dp floors).
    *
    * τ is fixed at 1/2 because sqrt is the one power IEEE 754 requires to
    * be CORRECTLY rounded — `pow(x, τ)` for general τ is libm-dependent
    * and differs across engines, which would break cross-engine
    * reproducibility. Each sqrt is quantized to micro-units
    * (`floor(sqrt(n)·10⁶)`, a long) BEFORE the normalization sum, so the
    * sum is integer arithmetic — exact and order-independent, immune to
    * float-summation reorder across partitions — and the weight is then
    * ONE correctly-rounded IEEE division, floor-truncated to 6dp.
    * Feed the weights to [[mixtureSample]] as rates (scaled by the epoch
    * budget) to realize the mixture.
    *
    * Scale: one map-side-combinable count per domain (rows out = number
    * of domains — tens), one broadcast 1-row total; the corpus itself is
    * never re-shuffled and text never moves. */
  def temperatureWeights(df: DataFrame, domainCol: String): DataFrame = {
    require(!df.columns.exists(Set("n_docs", "weight")),
      "temperatureWeights emits n_docs/weight columns; input already has one — rename it first")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("__q", floor(sqrt(col("n_docs").cast("double")) * 1000000).cast("long"))
    val tot = counts.agg(sum(col("__q")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("weight",
        floor(col("__q").cast("double") / col("__tot").cast("double") * 1000000) / 1000000)
      .select(col(domainCol), col("n_docs"), col("weight"))
  }

  /** Deterministic domain-mixture realization (the DoReMi/data-mixing
    * epoch step): each domain samples at its target `rate` — every doc
    * appears `floor(rate)` times (epochs 0..floor(rate)-1) plus one more
    * epoch with probability frac(rate), decided by the same md5 bucket
    * coin as [[hashSample]] keyed on (doc, epoch). Reproducible across
    * engines/runs/retries/partitionings, and a doc's epochs never change
    * when the corpus grows (membership depends only on its own key).
    *
    * Rates are quantized to basis points as `floor(rate * 10000 + 0.5)`:
    * NOT bare floor (0.3 is 2999.999… in IEEE double — floor alone
    * quantizes it to 2999 bp while a decimal-arithmetic engine gets
    * 3000), and not `round` either (engines disagree on exact-.5 tie
    * modes; floor(x+0.5) is the same IEEE arithmetic everywhere). Rate 0
    * drops the domain. Output: input columns + `epoch` (int).
    *
    * Scale: a pure in-row projection + explode — NO shuffle, no join; the
    * rate table rides in as a map literal. */
  def mixtureSample(df: DataFrame, keyCol: String, domainCol: String,
                    rates: Map[String, Double],
                    defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1000),
      "rates must be in [0, 1000]")
    require(!df.columns.contains("epoch"),
      "mixtureSample adds an `epoch` column; input already has one — rename it first")
    val rate = coalesce(element_at(typedLit(rates), col(domainCol)), lit(defaultRate))
    val bp = floor(rate * 10000 + 0.5).cast("long")
    val full = (bp / 10000).cast("int")
    val fracBp = bp % 10000
    val coin = md5Long(concat(col(keyCol).cast("string"), lit("#"),
      full.cast("string"))) % 10000
    val epochs = concat(
      when(full >= 1, sequence(lit(0), full - 1)).otherwise(array().cast("array<int>")),
      when(coin < fracBp, array(full)).otherwise(array().cast("array<int>")))
    df.withColumn("epoch", explode(epochs))
  }

  /** Deterministic per-domain quota: the `n` docs of each domain with the
    * smallest (md5(key), key) — a balanced "random" head for eval sets,
    * stable under reruns and engine changes. One shuffle on the domain;
    * the per-domain sort is windowed top-k (rank pushdown keeps state at
    * n rows per partition, no full sort materializes). */
  def stratifiedHead(df: DataFrame, keyCol: String, domainCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(!df.columns.exists(Set("__h", "__r")),
      "stratifiedHead uses temp columns __h/__r; input already has one — rename it first")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol)).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", md5Long(col(keyCol)))
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= n)
      .drop("__h", "__r")
  }

  /** Deterministic train/val/test split on the same md5 key-buckets as
    * [[hashSample]]: a document lands in the same split on every engine,
    * run, and partitioning — and stays there when the corpus grows, since
    * membership depends only on its own key. Adds a `split` column. */
  def trainValTestSplit(df: DataFrame, keyCol: String,
                        trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split: train=$trainPct val=$valPct")
    val bucket = md5Long(col(keyCol)) % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Stratified EXACT-proportion split: within each stratum, rows order
    * by (md5(key), key) and the first ⌊trainBp·n/10⁴⌋ are train, the
    * next slice val, the rest test — the eval-set builder's form.
    * [[trainValTestSplit]] is per-row independent (stable as the corpus
    * grows, but a 90/5/5 TARGET lands only in expectation and a small
    * stratum can miss a split entirely); this one hits the proportions
    * exactly per stratum at the cost of re-assignment when the stratum
    * changes. One window per stratum — the parallelism unit is the
    * stratum, the standard shape for per-domain eval carving. */
  def stratifiedSplit(df: DataFrame, keyCol: String, stratumCol: String,
                      trainBp: Int = 8000, valBp: Int = 1000): DataFrame = {
    require(trainBp >= 0 && valBp >= 0 && trainBp + valBp <= 10000,
      s"invalid split basis points: train=$trainBp val=$valBp")
    require(!df.columns.contains("__h") && !df.columns.contains("__rn") &&
      !df.columns.contains("__n"),
      "stratifiedSplit uses temp columns __h/__rn/__n; rename them first")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", md5Long(col(keyCol)))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(stratumCol))))
      .withColumn("split",
        when(col("__rn") * 10000 <= col("__n") * trainBp, lit("train"))
          .when(col("__rn") * 10000 <= col("__n") * (trainBp + valBp), lit("val"))
          .otherwise(lit("test")))
      .drop("__h", "__rn", "__n")
  }

  /** Deterministic weighted sampling: `draws` independent draws WITH
    * replacement, P(key wins a draw) = weight / Σweights EXACTLY — via
    * the ticket/min-hash construction: a row of integer weight w holds w
    * virtual tickets, every ticket gets a seeded md5, and the draw's
    * winner owns the globally smallest ticket hash. Exchangeable hashes
    * make each ticket equally likely to be the minimum, so a row's win
    * probability is exactly its ticket share — no floating-point
    * exponentiation (the A-ES `u^(1/w)` key), hence bit-reproducible in
    * any engine with md5.
    *
    * The per-row ticket minimum folds INSIDE whole-stage codegen
    * (`array_min ∘ transform ∘ sequence` — w hashes per row per draw, no
    * explode, nothing row-multiplying leaves the task), and the global
    * argmin per draw is a `min(struct)` aggregate whose map-side partial
    * collapses each task to `draws` rows — the exchange carries
    * O(tasks × draws) structs however large the corpus. Rows with
    * weight < 1 hold no tickets and cannot win. Weights are capped only
    * by compute: w md5 calls per row per draw — cap upstream (e.g.
    * `least(w, 1024)`) when weights are unbounded.
    *
    * Output: (draw, <keyCol>) — the winning key per draw. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     draws: Int): DataFrame = {
    require(draws >= 1, s"draws must be >= 1, got $draws")
    val perDraw = df
      .select(col(keyCol).as("__k"), col(weightCol).cast("long").as("__w"))
      .filter(col("__w") >= 1)
      .select(col("__k"), col("__w"),
        explode(sequence(lit(1L), lit(draws.toLong))).as("draw"))
      .select(col("draw"), col("__k"),
        array_min(transform(sequence(lit(1L), col("__w")),
          tk => md5Long(concat(col("__k").cast("string"), lit("#t"),
            tk.cast("string"), lit("#d"), col("draw").cast("string"))))).as("__h"))
    perDraw.groupBy(col("draw"))
      .agg(min(struct(col("__h"), col("__k"))).as("__m"))
      .select(col("draw"), col("__m.__k").as(keyCol))
  }

  /** SCD-2 history build: collapse N tagged snapshot versions of a corpus
    * into per-key validity intervals — one row per maximal run of
    * consecutive versions in which the key existed with an unchanged
    * fingerprint. Deletion (absence in a version) closes the run;
    * reappearance opens a new one even if the content returns unchanged.
    * The slowly-changing-dimension record a lakehouse keeps instead of N
    * full copies.
    *
    * Input: (key, version, fp) rows — presence of a row is presence of
    * the key in that version (build fps with the same length-prefixed
    * hash as [[snapshotDiff]]). Output: (key, fp, valid_from, valid_to,
    * is_current) with closed version intervals; `is_current` marks runs
    * reaching `latest`.
    *
    * Plan: one exchange on the key for the lag window; run-ids are a
    * running sum of change-points over that same window, and the
    * interval aggregate groups on (key, run) — hash-partitioning by key
    * already clusters it, no second exchange of the data. */
  def scdHistory(snaps: DataFrame, keyCol: String, versionCol: String,
                 fpCol: String, latest: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    val marked = snaps.select(col(keyCol), col(versionCol).cast("long").as("__v"),
        col(fpCol).as("__fp"))
      .withColumn("__newrun",
        when(lag(col("__v"), 1).over(w).isNull, lit(1L))
          .when(col("__v") =!= lag(col("__v"), 1).over(w) + 1, lit(1L))
          .when(!(col("__fp") <=> lag(col("__fp"), 1).over(w)), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("__run", sum(col("__newrun")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col(keyCol), col("__run"))
      .agg(min(col("__v")).as("valid_from"), max(col("__v")).as("valid_to"),
        first(col("__fp")).as("fp"))
      .select(col(keyCol), col("fp"), col("valid_from"), col("valid_to"),
        (col("valid_to") === latest).as("is_current"))
  }

  /** Snapshot change detection: classify every key of two corpus snapshots
    * as `added` / `removed` / `changed` / `same` — the crawl-over-crawl
    * audit that decides what an incremental pipeline actually reprocesses
    * (re-ingest `added` + `changed`, tombstone `removed`, skip `same`).
    *
    * The payload columns are reduced to one 60-bit md5 fingerprint per
    * side BEFORE the join, so the full-outer join shuffles (key, long)
    * pairs — never the document text. One exchange per side, both hashed
    * on the key; at 100 TB the fingerprints are ~1% of corpus bytes, and
    * a bucketed layout on the key makes the join exchange-free.
    *
    * Returns (key, status, old_fp, new_fp) with NULL fingerprints on the
    * absent side. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "snapshotDiff needs at least one payload column")
    def fp(df: DataFrame, out: String): DataFrame = {
      // NULL-safe, unambiguous concat: length-prefix each stringified
      // payload column so ("ab","c") never collides with ("a","bc").
      // The NUL sentinel is spelled as an escape (the lexer substitutes
      // it) so the source file stays plain text for grep/diff tooling.
      val parts = payloadCols.map { c =>
        val s = coalesce(col(c).cast("string"), lit("\u0000null"))
        concat(length(s).cast("string"), lit(":"), s)
      }
      df.select(col(keyCol).as("key"), md5Long(concat(parts: _*)).as(out))
    }
    fp(oldSnap, "old_fp").join(fp(newSnap, "new_fp"), Seq("key"), "full_outer")
      .select(col("key"),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("new_fp"), lit("same"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  /** Content-defined chunking dedup (the FastCDC/rsync idea at token
    * granularity): split every document at content-derived boundaries —
    * after any word whose md5 ≡ 0 (mod `avgLen`), expected chunk length
    * `avgLen` words — and measure, per document, how many of its chunks
    * recur anywhere else in the corpus. Because boundaries depend only
    * on LOCAL content, an insertion early in a document shifts chunk
    * positions without changing the chunks after it — the property that
    * lets this catch shared boilerplate blocks that whole-document
    * fingerprints ([[simhash]], exact md5) and fixed-stride windows both
    * miss. The substring-dedup complement to [[substringSpans]]: spans
    * find EXACT cross-doc n-grams at a fixed n, CDC finds variable-length
    * shared blocks at ~avgLen granularity for 1/avgLen the explode cost.
    *
    * Plan: chunking is ONE left-to-right in-row `aggregate` fold (no
    * shuffle, no UDF) — the accumulator carries (closed chunks, open
    * chunk) and each word costs exactly one md5. The obvious spelling —
    * boundary positions via `filter(sequence(...))`, then a `transform`
    * slicing per chunk — is the documented HOF trap (see wordDiversity):
    * every lambda reference to the positions array RE-EVALUATES its
    * whole defining expression, turning n words into O(n²/avgLen) md5
    * calls (measured 316 s vs 1.4 s at sf0.1). Then one explode to
    * (doc, chunk-hash) rows; chunk-hash counts are one map-side-
    * combinable aggregate; the membership join keys on the hash. Only
    * (id, 32-char hash) pairs ever shuffle — text stays in the scan.
    * Output: (id, n_chunks, n_dup_chunks, dup_micro), empty-text
    * documents excluded (no chunks to measure). */
  def cdcChunkDedup(docs: DataFrame, idCol: String, textCol: String,
                    avgLen: Int = 8): DataFrame = {
    require(avgLen >= 2, s"cdcChunkDedup needs avgLen >= 2, got $avgLen")
    val w = tokens(col(textCol))
    val noChunks = array().cast("array<string>")
    val chunks = aggregate(
      w,
      struct(noChunks.as("done"), lit("").as("cur")),
      (acc, word) => {
        val cur2 = when(acc.getField("cur") === "", word)
          .otherwise(concat(acc.getField("cur"), lit(" "), word))
        val boundary = md5Long(word) % avgLen === 0
        struct(
          when(boundary, concat(acc.getField("done"), array(cur2)))
            .otherwise(acc.getField("done")).as("done"),
          when(boundary, lit("")).otherwise(cur2).as("cur"))
      },
      // the final word always closes its chunk (the forced last cut)
      acc => when(acc.getField("cur") === "", acc.getField("done"))
        .otherwise(concat(acc.getField("done"), array(acc.getField("cur")))))
    val chunked = docs.filter(size(w) > 0)
      .select(col(idCol).as("id"), explode(chunks).as("chunk"))
      .select(col("id"), md5(col("chunk")).as("h"))
    val counts = chunked.groupBy("h").agg(count(lit(1)).as("cnt"))
    chunked.join(counts, "h")
      .groupBy("id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_micro",
        expr("1000000L * n_dup_chunks div n_chunks"))
  }

  /** EXACT threshold set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08):
    * every document pair whose shingle-set Jaccard is ≥ thetaNum/thetaDen,
    * with NO false negatives. The deterministic exact complement of
    * [[lshCandidates]]: LSH banding is probabilistic (a true near-dup can
    * miss every band), prefix filtering is a proof — if J(a,b) ≥ θ then
    * |a∩b| ≥ ⌈θ·max(|a|,|b|)⌉ ≥ ⌈θ·|s|⌉ for each side s, and two sets
    * sharing ≥ t elements must collide within their first |s| − t + 1
    * elements under ANY global total order, so prefixes of length
    * |s| − ⌈θ|s|⌉ + 1 are a lossless blocking key.
    *
    * The order that makes this FAST is rarest-token-first (ascending
    * global document frequency): prefixes then hold each document's
    * least-common shingles, so the candidate join fans out least where
    * tokens are hottest. The worst case — a corpus of near-identical
    * boilerplate whose every prefix lands on one token — is exactly the
    * case where the true output is all-pairs anyway: prefix-filter
    * candidate volume tracks RESULT size, not corpus size, which is the
    * 100 TB argument. Shuffles: shingle-df aggregate, the df join, one
    * per-doc window for prefix ranks, the candidate self-join keyed on
    * prefix shingle, and the verify join back to the (persisted) set
    * table — each moving (id, hash-sized) rows only; full shingle arrays
    * cross the wire once, into the verify join.
    *
    * Verification is exact integer math: thetaDen·|a∩b| ≥ thetaNum·|a∪b|.
    * Output: (id_a, id_b, inter, uni, jaccard_micro), id_a < id_b. */
  def prefixFilterJoin(docs: DataFrame, idCol: String, textCol: String,
                       thetaNum: Int = 8, thetaDen: Int = 10,
                       n: Int = 3): DataFrame = {
    require(thetaNum > 0 && thetaNum <= thetaDen,
      s"theta must be in (0, 1]: got $thetaNum/$thetaDen")
    import org.apache.spark.sql.expressions.Window
    // Canonical distinct shingle set per doc; persisted because the
    // verify join reads it twice (same cache contract as lshCandidates).
    val sets = docs
      .select(col(idCol).as("id"),
        array_sort(array_distinct(shingles(col(textCol), n))).as("shd"))
      .filter(size(col("shd")) > 0)
      .withColumn("sz", size(col("shd")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Global document frequency — the rarest-first total order (ties
    // broken by the shingle string itself, so the order is total and
    // both join sides rank identically).
    val df = sets.select(col("id"), explode(col("shd")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    // Per-doc prefix: rank shingles by (df asc, sh asc), keep the first
    // sz − ⌈θ·sz⌉ + 1. ⌈θ·sz⌉ in exact integer math.
    val need = expr(s"(sz * $thetaNum + ${thetaDen - 1}) div $thetaDen")
    val rk = row_number().over(Window.partitionBy("id").orderBy("df", "sh"))
    val prefix = sets.select(col("id"), col("sz"), explode(col("shd")).as("sh"))
      .join(df, "sh")
      .withColumn("rk", rk)
      .filter(col("rk") <= col("sz") - need + 1)
      .select(col("sh"), col("id"), col("sz"))
    // Candidates: shared prefix shingle + the size filter (J ≥ θ forces
    // θ·max(|a|,|b|) ≤ min(|a|,|b|)). distinct BEFORE the verify join so
    // a pair sharing many prefix shingles verifies once.
    val l = prefix.select(col("sh"), col("id").as("id_a"), col("sz").as("sz_a"))
    val r = prefix.select(col("sh"), col("id").as("id_b"), col("sz").as("sz_b"))
    val cand = l.join(r, Seq("sh"))
      .filter(col("id_a") < col("id_b") &&
        greatest(col("sz_a"), col("sz_b")) * thetaNum <=
          least(col("sz_a"), col("sz_b")) * thetaDen)
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("shd").as("shd_a"),
        col("sz").as("sz_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("shd").as("shd_b"),
        col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("shd_a"), col("shd_b"))).cast("long"))
      .withColumn("uni", col("sz_a") + col("sz_b") - col("inter"))
      .filter(col("inter") * thetaDen >= col("uni") * thetaNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        expr("inter * 1000000L div uni").as("jaccard_micro"))
  }
}
