package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Layout, Multimodal, Similarity, TextAnalysis}

/** Unit specs for the M6 pipeline operators (dedup, similarity, text,
  * multimodal) over tiny inline corpora. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("shingles: word 3-grams in order; short docs yield empty") {
    val out = docs((1L, "a b c d"), (2L, "a b"))
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L).isEmpty)
  }

  test("minhash: identical docs get identical signatures; different docs differ") {
    val sig = Dedup.minhashSignature(
      docs((1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"),
        (3L, "completely different words entirely here now today ok")), "text", k = 4)
      .select("doc_id", "h1", "h2", "h3", "h4")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("lshCandidates surfaces exact dups as candidate pairs") {
    val pairs = Dedup.lshCandidates(
      docs((1L, "one two three four five six seven eight"),
        (2L, "one two three four five six seven eight"),
        (3L, "alpha beta gamma delta epsilon zeta eta theta")), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dup clustering: candidates -> closure -> canonical picks the min doc per cluster") {
    val corpus = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (5L, "alpha beta gamma delta epsilon zeta"), // 3-doc cluster -> canonical 1
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven"),   // 2-doc cluster -> canonical 3
      (9L, "nothing like anything else at all ever"))
    val pairs = Dedup.lshCandidates(corpus, "doc_id", "text")
    val und = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      .unionByName(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
    val canon = graph.Traversal.reachFix(und, und.select($"src".as("id")).distinct())
      .groupBy($"origin").agg(least(min($"node"), first($"origin")).as("canonical"))
      .as[(Long, Long)].collect().toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("lshCandidates bounds a degenerate all-identical corpus via the bucket cap") {
    // 2000 identical boilerplate docs: every band puts all of them in ONE
    // bucket. Uncapped that is ~2M pairs on one reducer; the cap samples
    // each hot bucket down to ~32 members.
    val boiler = (1L to 2000L).map(i => (i, "terms of service apply to all users of this site"))
    val pairs = Dedup.lshCandidates(boiler.toDF("doc_id", "text"),
      "doc_id", "text", maxBucket = 32)
    val n = pairs.count()
    // 4 bands x C(~32,2) ≈ ≤4k distinct pairs, never the 2M blowup.
    assert(n > 0 && n < 20000, s"expected capped candidate count, got $n")
    // The audit twin sees the same hot buckets it truncated.
    val over = Dedup.lshOverflow(boiler.toDF("doc_id", "text"),
      "doc_id", "text", maxBucket = 32)
    assert(over.count() == 4) // one hot bucket per band
    assert(over.agg(min($"sz")).as[Long].head() == 2000L)
  }

  test("simhash: equal docs equal, near docs close in hamming distance") {
    val fp = Dedup.simhash(
      docs((1L, "spark scala data pipeline engine"),
        (2L, "spark scala data pipeline engine"),
        (3L, "wholly unrelated corpus tokens here")), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("simhashNearDup equals the brute-force hamming join (pigeonhole blocking is lossless)") {
    // 20 docs drifting a seeded vocabulary one word at a time: adjacent
    // docs land within the Hamming ball, distant ones outside it — both
    // populations exercised, and the banded join must reproduce the
    // all-pairs popcount join EXACTLY.
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(30)(i => s"w$i")
    var words = Vector.tabulate(12)(i => vocab(i))
    val rows = (1L to 20L).map { id =>
      words = words.updated(rnd.nextInt(words.size), vocab(rnd.nextInt(vocab.size)))
      id -> words.mkString(" ")
    }
    val corpus = docs(rows: _*)
    val got = Dedup.simhashNearDup(corpus, "doc_id", "text", bits = 48, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val fps = Dedup.simhash(corpus, "doc_id", "text", bits = 48)
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)).toLong if h <= 3L
    } yield (a, b, h)).toSet
    assert(got == brute)
    assert(got.nonEmpty, "drift corpus produced no near-dup pairs — weaken the drift")
    assert(got.size < 190, "everything matched everything — the ball is too wide to test blocking")
  }

  test("ngramJaccard: identical docs score 1.0") {
    val j = Dedup.ngramJaccard(
      docs((1L, "a b c d e f"), (2L, "a b c d e f")), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(j.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 1.0))
  }

  test("simhashOverflow: identical-fingerprint floods surface, clean corpora are silent") {
    // 5 identical docs all share every band value; cap 3 -> 4 overflowing
    // band buckets (one per band), each of size 5.
    val flood = docs((1L to 5L).map(i => (i, "same words every time here")): _*)
    val over = Dedup.simhashOverflow(flood, "doc_id", "text", bits = 60, maxBucket = 3)
    assert(over.count() == 4L)
    assert(over.agg(max(col("sz"))).as[Long].head() == 5L)
    val clean = Dedup.simhashOverflow(
      docs((1L, "alpha beta gamma"), (2L, "delta epsilon zeta")),
      "doc_id", "text", bits = 60, maxBucket = 3)
    assert(clean.isEmpty)
  }

  test("ngramContainment: subset doc scores cont 1.0 while Jaccard dilutes") {
    // B = A + suffix, chosen so A's min-shingle-hash stays B's min (the
    // h1 prefilter pairs them): shingles(A) = {abc,bcd,cde} all inside
    // B's 5 -> cont_ab = 3/3 = 1.0, cont_ba = floor(3/5*1e4)/1e4 = 0.6.
    val out = Dedup.ngramContainment(
      docs((1L, "a b c d e"), (2L, "a b c d e f g")), "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0, 0.6)))
    // the symmetric twin under-scores the same inclusion
    val j = Dedup.ngramJaccard(
      docs((1L, "a b c d e"), (2L, "a b c d e f g")), "doc_id", "text")
      .as[(Long, Long, Double)].collect().head._3
    assert(j == 0.6)
  }

  test("containmentEstimate: identical docs estimate 1.0; unrelated docs pair nothing") {
    val out = Dedup.containmentEstimate(docs(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta")), "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()
    // identical signatures: m=8, I_est = 8*(s+s)/16 = s -> both sides 1.0
    assert(out.toSeq == Seq((1L, 2L, 8L, 1.0, 1.0)))
    // estimator agrees with the exact verifier on the same pair
    val exact = Dedup.ngramContainment(docs(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight")), "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().head
    assert((exact._3, exact._4) == ((1.0, 1.0)))
  }

  test("lshPrecision: exact-Jaccard audit of the candidate pairs, empty-safe") {
    // One exact-dup pair + one unrelated doc: the only candidate is
    // (1,2) with Jaccard 1.0 >= 0.5, so precision is 1.0.
    val out = Dedup.lshPrecision(docs(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta")), "doc_id", "text")
      .as[(Long, Long, Double)].collect().head
    assert(out == ((1L, 1L, 1.0)))
    // No candidates at all -> one zero row, precision 0.0 (not NaN/empty).
    val none = Dedup.lshPrecision(docs(
      (1L, "one two three four five six seven eight"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")), "doc_id", "text")
      .as[(Long, Long, Double)].collect().head
    assert(none == ((0L, 0L, 0.0)))
  }

  test("cosine: identical vectors 1.0, orthogonal 0.0") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 1), "vec_id", "embedding", 2)
      .select("neighbor_id", "cos").as[(Long, Double)].collect().toMap
    assert(math.abs(top(2L) - 1.0) < 1e-9)
    assert(math.abs(top(3L)) < 1e-9)
  }

  test("lshTopK: identical vectors share a bucket and rank first") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (3L, Seq(-1.0f, -2.0f, -3.0f, -4.0f))).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(df, df.filter(col("vec_id") === 1), "vec_id", "embedding", 1)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(out == Seq(2L)) // 3 is in the opposite half-space bucket
  }

  test("kmeansLite partitions the corpus; ivfTopK recalls a usable fraction of true neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (assigned, centroids) = graft.operators.Clustering.kmeansLite(emb, "vec_id", "embedding", k = 8)
    assert(centroids.count() == 8)
    assert(assigned.count() == emb.count())          // every vector lands in a cell
    assert(assigned.select("cid").distinct().count() > 1) // and not all in one
    val queries = emb.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = truth.count(approx.contains).toDouble / truth.size
    assert(approx.nonEmpty && recall >= 0.2, s"recall=$recall")
  }

  test("wordpiece: greedy longest-match counts, coverage by single chars") {
    val docs = Seq((1L, "tables tab le x"), (2L, "tab tab")).toDF("doc_id", "text")
    // hand vocab: "tab" and "le" are pieces; everything else falls back
    // to single chars. "tables" → tab|le|s = 3, "tab" → 1, "le" → 1, "x" → 1
    val vocab = Seq("tab", "le", "t", "a", "b", "l", "e", "s", "x")
      .toDF("piece").withColumn("plen", length(col("piece")).cast("int"))
    val got = graft.operators.TextAnalysis
      .wordpieceCount(docs, "doc_id", "text", vocab, maxSteps = 6)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((4L, 6L))) // 3 + 1 + 1 + 1 wordpiece tokens
    assert(got(2L) == ((2L, 2L)))
  }

  test("wordpiece: a vocab hole fails loudly instead of silently dropping words") {
    val docs = Seq((1L, "zz")).toDF("doc_id", "text")
    val vocab = Seq(("q", 1)).toDF("piece", "plen") // 'z' uncovered
    val e = intercept[Exception] { // Spark wraps the executor-side require
      graft.operators.TextAnalysis.wordpieceCount(docs, "doc_id", "text", vocab,
        maxSteps = 4).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("coverage hole")))
  }

  test("unigram: Viterbi beats greedy longest-match where BPE-ish costs say so") {
    // "aab": greedy longest-first takes aa|b = 9000+2000; Viterbi finds
    // a|ab = 2000+1000 — the defining unigram-vs-WordPiece divergence.
    val docs = Seq((1L, "aab ab"), (2L, "b b")).toDF("doc_id", "text")
    val vocab = Seq(("aa", 9000L), ("ab", 1000L), ("a", 2000L), ("b", 2000L))
      .toDF("piece", "cost_micro")
    val got = graft.operators.TextAnalysis
      .unigramSegment(docs, "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 3L, 4000L))) // a|ab (2, 3000) + ab (1, 1000)
    assert(got(2L) == ((2L, 2L, 4000L)))
  }

  test("unigram: equal-cost tie breaks toward fewer pieces; holes fail loudly") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val vocab = Seq(("ab", 2000L), ("a", 1000L), ("b", 1000L))
      .toDF("piece", "cost_micro") // ab vs a|b both cost 2000
    val got = graft.operators.TextAnalysis
      .unigramSegment(docs, "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 1L, 1L, 2000L))) // one piece, not two
    val e = intercept[Exception] {
      graft.operators.TextAnalysis.unigramSegment(
        Seq((1L, "zz")).toDF("doc_id", "text"),
        "doc_id", "text", Seq(("q", 1L)).toDF("piece", "cost_micro")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("coverage hole")))
  }

  test("unigramVocab: integer log2 pricing, single-char coverage floor") {
    // corpus: "aa" × 150 occurrences → pieces "aa" (n=150, kept by count),
    // "a" (n=300, kept as single char). cost = (64 - bitlen(n)) * 1000.
    val docs = Seq((1L, ("aa " * 150).trim)).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.unigramVocab(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got("aa") == (64L - 8L) * 1000L) // bin(150) = 10010110, 8 bits
    assert(got("a") == (64L - 9L) * 1000L)  // bin(300) = 100101100, 9 bits
    assert(got.size == 2)
  }

  test("resizeImage: ceil dims, origin-anchored sampling, deterministic") {
    val docs = Seq((1L, "x" * 100)).toDF("doc_id", "text") // h = ceil(100/48) = 3
    val media = graft.operators.Multimodal.encodeImage(spark, docs, "doc_id", "text")
    val out = graft.operators.Multimodal.decodeImage(spark,
      graft.operators.Multimodal.resizeImage(spark, media, factor = 3))
      .collect().head
    assert(out.width == 6 && out.height == 1) // ceil(16/3), ceil(3/3)
    // row 0 of the raster is all 'x' (120): sampled pixels are (0,0),(3,0),
    // ...,(15,0) — every channel byte is 120
    assert(out.sum_b == 6 * 120 && out.sum_g == 6 * 120 && out.sum_r == 6 * 120)
  }

  test("hardNegatives: band is half-open, self excluded, hardest first") {
    // query 1 vs: 2 ≈ near-dup (cos→1), 3 in-band high, 4 in-band low,
    // 5 easy (orthogonal). Band [0.3, 0.99) must keep exactly 3 and 4,
    // ranked 3 first (higher cos), and never emit 1 (self) or 2/5.
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.001f)),
      (3L, Seq(1.0f, 1.0f)),
      (4L, Seq(1.0f, 2.0f)),
      (5L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(df, df.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 5, floor = 0.3, ceil = 0.99)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((3L, 1), (4L, 2)))
  }

  test("ivf index round-trips through parquet: served results == in-memory results") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val (centroids, lists) = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
      nlist = 8, iters = 0)
    val tmp = java.nio.file.Files.createTempDirectory("ivf-spec").toString
    centroids.write.mode("overwrite").parquet(s"$tmp/centroids")
    lists.write.mode("overwrite").partitionBy("cid").parquet(s"$tmp/lists")
    val served = Similarity.ivfQueryIndex(
      spark.read.parquet(s"$tmp/centroids"), spark.read.parquet(s"$tmp/lists"),
      queries, "vec_id", "embedding", k = 3, nprobe = 2)
      .select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val direct = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 2, iters = 0)
      .select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served == direct && served.nonEmpty)
  }

  test("ivfPqTopK: on clustered data every ADC neighbor is from the query's cluster") {
    // PQ is uninformative on uniform-random vectors (measured: recall
    // 0.06-0.08 on the synthetic embeddings even probing ALL cells —
    // a data property, not a pipeline bug; within a cluster the codes
    // tie and exact ranks are noise). The property PQ actually promises
    // — and what this asserts — is that coarse probe + ADC rank
    // same-cluster candidates above other clusters on data WITH
    // structure: 4 well-separated clusters, every top-5 neighbor of
    // every query must share the query's cluster.
    val dims = 8
    val data = (0L until 160L).map { i =>
      val cluster = (i % 4).toInt
      val v = Array.tabulate(dims) { d =>
        val center = if (d / 2 == cluster) 100f else 0f
        center + ((i * 31 + d * 7) % 10).toFloat // deterministic jitter
      }
      (i, v)
    }
    val df = data.toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(df, df.filter(col("vec_id") < 8),
        "vec_id", "embedding", kTop = 5, nlist = 4, nprobe = 1, m = 4, k = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.length == 8 * 5)
    out.foreach { case (q, n) =>
      assert(q % 4 == n % 4, s"neighbor $n of query $q crosses clusters")
    }
  }

  test("languageId picks the marker-dominant language deterministically") {
    val out = TextAnalysis.languageId(
      docs((1L, "the cat and the dog is a pet"),
        (2L, "der hund und die katze ist das tier"),
        (3L, "xyzzy qwerty plugh")), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("langConfusion: cells count labeled vs predicted; unsupported labels land in und") {
    val d = Seq(
      (1L, "the cat and the dog is a pet", "en"),
      (2L, "the big and small ones are here", "en"),
      (3L, "der hund und die katze ist das", "de"),
      (4L, "xyzzy qwerty plugh", "zh")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langConfusion(d, "doc_id", "text", "lang")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("en", "en", 2L), ("de", "de", 1L), ("zh", "und", 1L)))
  }

  test("qualityScore stays in [0,1] and counts tokens") {
    val out = TextAnalysis.qualityScore(
      docs((1L, "the quick brown fox, and a lazy dog!")), "doc_id", "text").collect()(0)
    assert(out.getAs[Long]("n_tokens") == 8L)
    val q = out.getAs[Double]("quality")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("rollingFingerprint is order-sensitive") {
    val out = TextAnalysis.rollingFingerprint(
      docs((1L, "alpha beta gamma"), (2L, "gamma beta alpha")), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) != out(2L))
  }

  test("multimodal: meta digest keeps schema and determinism") {
    val media = Multimodal.asMedia(docs((7L, "hello world")), "doc_id", "text")
    val meta = Multimodal.mediaMeta(media).collect()(0)
    assert(meta.getAs[Long]("n_bytes") == 11L)
    assert(meta.getAs[String]("sha256").length == 64)
  }

  test("encodeMp4/decodeMp4: box-walk round trip recovers the container metadata") {
    val text = "an mp4 container payload long enough to matter " * 2
    val len = text.getBytes("UTF-8").length
    val d = docs((7L, text), (8L, ""))
    val dec = Multimodal.decodeMp4(spark,
      Multimodal.encodeMp4(spark, d, "doc_id", "text"))
      .collect().map(r => r.id -> r).toMap
    val r7 = dec(7L)
    assert(r7.brand == "isom" && r7.timescale == 1000L && r7.duration == len.toLong)
    assert(r7.width == 16L * (1 + len % 30) && r7.height == 16L * (1 + (len / 7) % 30))
    assert(r7.n_mdat == len.toLong)
    val r8 = dec(8L) // empty payload: minimal dims, zero duration/mdat
    assert(r8.width == 16L && r8.height == 16L && r8.duration == 0L && r8.n_mdat == 0L)
  }

  test("decodeMp4 is a real parser: v1 headers and largesize mdat it never writes") {
    import spark.implicits._
    // Hand-built ISO BMFF: ftyp(mp42) + moov(mvhd v1 + trak(tkhd v1)) +
    // mdat with size=1 largesize — shapes encodeMp4 never emits.
    def box(ty: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(ty.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val mvhdV1 = {
      val b = java.nio.ByteBuffer.allocate(112 - 8)
      b.putInt(0x01000000)            // version 1
        .putLong(0L).putLong(0L)      // creation, modification (64-bit)
        .putInt(90000)                // timescale
        .putLong(123456L)             // duration (64-bit)
      b.array()                       // trailing rate/matrix bytes stay 0
    }
    val tkhdV1 = {
      val b = java.nio.ByteBuffer.allocate(104 - 8)
      b.putInt(0x01000007)
        .putLong(0L).putLong(0L)      // creation, modification
        .putInt(1).putInt(0)          // track, reserved
        .putLong(123456L)             // duration (64-bit)
      b.position(88)                  // width at box+96 → payload+88
      b.putInt(640 << 16).putInt(480 << 16)
      b.array()
    }
    val payload = Array.tabulate[Byte](10)(_.toByte)
    val largeMdat = {
      val b = java.nio.ByteBuffer.allocate(16 + payload.length)
      b.putInt(1).put("mdat".getBytes("US-ASCII"))
        .putLong(16L + payload.length).put(payload)
      b.array()
    }
    val blob = box("ftyp", "mp42".getBytes ++ Array.fill[Byte](4)(0) ++ "mp42".getBytes) ++
      box("moov", box("mvhd", mvhdV1) ++ box("trak", box("tkhd", tkhdV1))) ++ largeMdat
    val media = Seq(Multimodal.MediaRow(1L, blob, "video/mp4")).toDS()
    val out = Multimodal.decodeMp4(spark, media).collect()(0)
    assert(out.brand == "mp42" && out.timescale == 90000L && out.duration == 123456L)
    assert(out.width == 640L && out.height == 480L && out.n_mdat == 10L)
  }

  test("encodeAvi/decodeAviFrames: real frame decode, sampling, empty-text frame") {
    val text = ('a' to 'z').mkString * 8 // 208 chars → ceil(208/192) = 2 frames
    val d = docs((7L, text), (8L, ""))
    val all = Multimodal.decodeAviFrames(spark,
      Multimodal.encodeAvi(spark, d, "doc_id", "text")).collect()
      .groupBy(_.id)
    assert(all(7L).map(_.frame_no).sorted.toSeq == Seq(0L, 1L))
    assert(all(8L).map(_.frame_no).toSeq == Seq(0L)) // empty text: one zero frame
    val f0 = all(7L).find(_.frame_no == 0L).get
    val f1 = all(7L).find(_.frame_no == 1L).get
    assert(f0.width == 16L && f0.height == 4L && f0.n_px == 64L)
    // frame f byte k = payload byte 192f+k (zero past end), channel k%3
    val payload = text.getBytes("UTF-8")
    def expect(f: Int, ch: Int) = (0 until 192).collect {
      case k if k % 3 == ch =>
        val p = 192 * f + k
        if (p < payload.length) (payload(p) & 0xff).toLong else 0L
    }.sum
    assert((f0.sum_b, f0.sum_g, f0.sum_r) == (expect(0, 0), expect(0, 1), expect(0, 2)))
    assert((f1.sum_b, f1.sum_g, f1.sum_r) == (expect(1, 0), expect(1, 1), expect(1, 2)))
    assert(all(8L).head.sum_b == 0L && all(8L).head.sum_r == 0L)
    val sampled = Multimodal.decodeAviFrames(spark,
      Multimodal.encodeAvi(spark, d, "doc_id", "text"), sampleEvery = 2).collect()
    assert(sampled.filter(_.id == 7L).map(_.frame_no).toSeq == Seq(0L))
  }

  test("decodeAviFrames is a real RIFF parser: odd-size pad chunks walk; compressed frames throw") {
    import spark.implicits._
    val base = Multimodal.encodeAvi(spark, docs((1L, "x" * 200)), "doc_id", "text")
      .collect()(0).blob
    // Splice a JUNK chunk with an ODD 5-byte payload (forcing the RIFF
    // word-alignment pad) between the hdrl and movi lists — a shape the
    // writer never emits; the walk must skip it and still find every frame.
    val at = 12 + 200 // end of LIST(hdrl)
    val junk = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("JUNK".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5)).put(0.toByte) // pad to even
    val spliced = base.take(at) ++ junk.array() ++ base.drop(at)
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, java.nio.ByteBuffer.wrap(base)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4) + 14)
    val out = Multimodal.decodeAviFrames(spark,
      Seq(Multimodal.MediaRow(1L, spliced, "video/x-msvideo")).toDS()).collect()
    assert(out.map(_.frame_no).sorted.toSeq == Seq(0L, 1L))
    // Relabel frame 0's chunk as compressed '00dc' → loud refusal, no fake.
    val dc = base.clone()
    val firstFrameHdr = 12 + 200 + 8 + 4 // RIFF hdr + hdrl + movi hdr + 'movi'
    assert(new String(dc, firstFrameHdr, 4, "US-ASCII") == "00db")
    dc(firstFrameHdr + 3) = 'c'.toByte
    val e = intercept[Exception] {
      Multimodal.decodeAviFrames(spark,
        Seq(Multimodal.MediaRow(1L, dc, "video/x-msvideo")).toDS()).collect()
    }
    assert(e.getMessage.contains("no codec") ||
      Option(e.getCause).exists(_.getMessage.contains("no codec")))
  }

  test("decodeAviFrames: truncated LIST fails with the id-tagged message, not a bare index error") {
    import spark.implicits._
    def decode(blob: Array[Byte]) = Multimodal.decodeAviFrames(spark,
      Seq(Multimodal.MediaRow(7L, blob, "video/x-msvideo")).toDS()).collect()
    def idTagged(body: Array[Byte] => Unit, blob: Array[Byte]): Unit = {
      val e = intercept[Exception](body(blob))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).toSeq
      assert(msgs.exists(_.contains("id=7")),
        s"expected the id-tagged require message, got: ${msgs.take(3)}")
    }
    // a LIST whose declared data (2 bytes) can't even hold the list type:
    // the fourcc read must be guarded, not left to StringIndexOutOfBounds
    val shortList = java.nio.ByteBuffer.allocate(22)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shortList.put("RIFF".getBytes("US-ASCII")).putInt(14)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(2).putShort(0)
    idTagged(b => decode(b), shortList.array())
    // a chunk whose size overruns the file
    val overrun = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    overrun.put("RIFF".getBytes("US-ASCII")).putInt(12)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(500)
    idTagged(b => decode(b), overrun.array())
  }

  test("decodeAviFrames with an audio stream: auds strf skipped, 0Xwb chunks ignored, vids prefix honored") {
    import spark.implicits._
    // Hand-built two-stream AVI the writer never emits: stream 00 = PCM
    // audio (strf is a WAVEFORMATEX — wBitsPerSample sits where a DIB's
    // biBitCount would, and must NOT be read as one), stream 01 = the DIB
    // video. movi interleaves a '00wb' audio chunk before the '01db'
    // frame; only the video frame may be decoded.
    def le(n: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le(payload.length) ++ payload ++ pad
    }
    def list(ty: String, content: Array[Byte]): Array[Byte] =
      chunk("LIST", ty.getBytes("US-ASCII") ++ content)
    val (w, h) = (4, 2) // stride 12 (4-aligned), frameBytes 24
    val avih = {
      val b = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(100000).putInt(0).putInt(0).putInt(0)
        .putInt(1)          // dwTotalFrames = 1 video frame
        .putInt(0).putInt(2) // initial, dwStreams = 2
        .putInt(24).putInt(w).putInt(h)
      b.array()
    }
    def strh(fcc: String) =
      fcc.getBytes("US-ASCII") ++ Array.fill[Byte](52)(0)
    val strfAuds = { // WAVEFORMATEX: wBitsPerSample=16 at offset 14
      val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.array()
    }
    val strfVids = {
      val b = java.nio.ByteBuffer.allocate(40).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
        .putInt(w * 3 * h)
      b.array()
    }
    val frame = Array.tabulate[Byte](w * 3 * h)(i => (i + 1).toByte)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh("auds")) ++ chunk("strf", strfAuds)) ++
      list("strl", chunk("strh", strh("vids")) ++ chunk("strf", strfVids)))
    val movi = list("movi",
      chunk("00wb", Array[Byte](9, 9, 9, 9)) ++ chunk("01db", frame))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val blob = "RIFF".getBytes("US-ASCII") ++ le(body.length) ++ body
    val out = Multimodal.decodeAviFrames(spark,
      Seq(Multimodal.MediaRow(5L, blob, "video/x-msvideo")).toDS()).collect()
    assert(out.length == 1)
    val f = out(0)
    assert(f.width == w && f.height == h && f.n_px == w.toLong * h)
    // linear channel sums over bytes 1..24: ch = (i-1)%3 over value i
    def ch(c: Int) = (1 to 24).filter(i => (i - 1) % 3 == c).map(_.toLong).sum
    assert((f.sum_b, f.sum_g, f.sum_r) == (ch(0), ch(1), ch(2)))
  }

  test("hammingOverflow flags hot fingerprint bands (degenerate all-equal fingerprints)") {
    // the m8b failure mode: every uniform image aHashes to 0, so all four
    // bands collapse into one (band, 0) bucket each
    val fps = (1L to 20L).map(i => (i, 0L)).toDF("id", "fp")
    assert(Dedup.hammingOverflow(fps, "id", "fp", maxBucket = 8).count() == 4)
    assert(Dedup.hammingOverflow(fps, "id", "fp", maxBucket = 32).count() == 0)
  }

  test("encodeImage/decodeImage: PNG round trip decodes to the exact BMP raster") {
    val d = docs((1L, "hello png world, a payload long enough to span rows " * 3),
      (2L, ""), (3L, "x"))
    val viaPng = Multimodal.decodeImage(spark,
      Multimodal.encodeImage(spark, d, "doc_id", "text", format = "png"))
      .collect().sortBy(_.id).toSeq
    val viaBmp = Multimodal.decodeBmp(spark,
      Multimodal.encodeBmp(spark, d, "doc_id", "text"))
      .collect().sortBy(_.id).toSeq
    assert(viaPng == viaBmp) // lossless: identical dims and channel sums
    // and the blob really is a compressed PNG container, not a rename
    val blob = Multimodal.encodeImage(spark, d, "doc_id", "text").collect()
      .find(_.id == 1L).get.blob
    assert(blob.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a))
  }

  test("encodeImage/decodeImage: JPEG decodes for real (exact dims, lossy-close sums)") {
    val d = docs((9L, "jpeg is lossy but the decode path is the real JDK codec " * 4))
    val viaJpg = Multimodal.decodeImage(spark,
      Multimodal.encodeImage(spark, d, "doc_id", "text", format = "jpg"))
      .collect()(0)
    val viaBmp = Multimodal.decodeBmp(spark,
      Multimodal.encodeBmp(spark, d, "doc_id", "text")).collect()(0)
    assert((viaJpg.width, viaJpg.height, viaJpg.n_px) ==
      (viaBmp.width, viaBmp.height, viaBmp.n_px))
    // DCT quantization moves sums, but not by more than ~16 levels/px
    def close(a: Long, b: Long) = math.abs(a - b) <= 16L * viaBmp.n_px
    assert(close(viaJpg.sum_b, viaBmp.sum_b) && close(viaJpg.sum_g, viaBmp.sum_g)
      && close(viaJpg.sum_r, viaBmp.sum_r))
  }

  test("bpePairFreq: vocabulary-weighted adjacent pair counts with deterministic ranks") {
    // vocab: aaa×2, bb×1, c×1 -> pairs: "aa" appears twice PER "aaa" word
    // (weighted by its frequency 2 -> cnt 4), "bb" once; "c" emits none.
    val out = TextAnalysis.bpePairFreq(
      docs((1L, "aaa bb aaa"), (2L, "aaa c")), "text", topK = 10)
      .as[(String, Long, Int)].collect().toSeq
    assert(out == Seq(("aa", 6L, 1), ("bb", 1L, 2)))
    // aaa total count 3 (two in doc 1, one in doc 2): 2 pairs × 3 = 6
  }

  test("IntervalJoin.overlapJoin: bin blocking finds exactly the overlapping pairs") {
    val a = Seq((1L, 0L, 10L), (2L, 20L, 30L)).toDF("id_a", "start", "end")
    val b = Seq(("x", 5L, 7L), ("y", 9L, 21L), ("z", 40L, 50L))
      .toDF("id_b", "start2", "end2")
    // binWidth 4 forces multi-bin intervals (pair 1-y shares bins 2 only;
    // 1-x shares bin 1; the distinct must collapse shared-bin duplicates)
    val got = operators.IntervalJoin.overlapJoin(a, b, binWidth = 4)
      .select("id_a", "id_b").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "x"), (1L, "y"), (2L, "y")))
    // inclusive endpoints: touching intervals overlap
    val touch = operators.IntervalJoin.overlapJoin(
      Seq((1L, 0L, 5L)).toDF("id_a", "start", "end"),
      Seq(("t", 5L, 9L)).toDF("id_b", "start2", "end2"), binWidth = 100)
      .count()
    assert(touch == 1L)
    // disjoint column names are enforced loudly
    assertThrows[IllegalArgumentException](operators.IntervalJoin.overlapJoin(
      Seq((1L, 0L, 5L)).toDF("id", "start", "end"),
      Seq((2L, 5L, 9L)).toDF("id", "start2", "end2"), binWidth = 10))
  }

  test("property: overlapJoin equals brute-force overlap on seeded random intervals") {
    val rnd = new scala.util.Random(314)
    (1 to 5).foreach { _ =>
      val as = (1L to 30L).map { i =>
        val s = rnd.nextInt(500).toLong; (i, s, s + rnd.nextInt(60))
      }
      val bs = (1L to 30L).map { i =>
        val s = rnd.nextInt(500).toLong; (i, s, s + rnd.nextInt(60))
      }
      val width = 1 + rnd.nextInt(80) // exercise tiny and wide bins
      val got = operators.IntervalJoin.overlapJoin(
        as.toDF("id_a", "start", "end"), bs.toDF("id_b", "start2", "end2"),
        binWidth = width)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val brute = (for {
        (ia, sa, ea) <- as; (ib, sb, eb) <- bs if sa <= eb && sb <= ea
      } yield (ia, ib)).toSet
      assert(got == brute, s"binWidth=$width")
    }
  }

  test("property: bpePairFreq equals brute-force weighted pair counts") {
    val rnd = new scala.util.Random(99)
    val words = Seq("ab", "abc", "x", "aab", "bba", "cc")
    val corpus = (1L to 6L).map(i =>
      (i, Seq.fill(3 + rnd.nextInt(5))(words(rnd.nextInt(words.length))).mkString(" ")))
    val got = TextAnalysis.bpePairFreq(corpus.toDF("doc_id", "text"), "text", topK = 100)
      .as[(String, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    val brute = corpus.flatMap(_._2.split("\\s+")).filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    assert(got == brute)
  }

  test("BMP round trip: encoder emits a valid 24-bit BMP, decoder inverts it exactly") {
    // "ABC" -> payload bytes 65,66,67: B=65, G=66, R=67; h=1, n_px=16.
    val media = Multimodal.encodeBmp(spark, docs((7L, "ABC")), "doc_id", "text")
    val blob = media.collect().head.blob
    assert(blob(0) == 'B'.toByte && blob(1) == 'M'.toByte)
    assert(blob.length == 54 + 48) // header + one aligned 16px row
    val dec = Multimodal.decodeBmp(spark, media).collect().head
    assert(dec == Multimodal.BmpDecoded(7L, 16, 1, 16L, 65L, 66L, 67L))
    // multi-row: 100 chars -> h = ceil(100/48) = 3 rows; the bottom-up
    // storage must un-flip, so channel sums equal the direct byte sums
    val text = ("a" * 47) + "Z" + ("b" * 52) // byte 47 = 'Z' lands in row 0 end
    val dec2 = Multimodal.decodeBmp(spark,
      Multimodal.encodeBmp(spark, docs((8L, text)), "doc_id", "text")).collect().head
    val bytes = text.getBytes("UTF-8")
    def chan(c: Int) = bytes.zipWithIndex.filter(_._2 % 3 == c).map(_._1.toLong).sum
    assert(dec2 == Multimodal.BmpDecoded(8L, 16, 3, 48L, chan(0), chan(1), chan(2)))
    // corrupt magic fails loudly, not silently
    val bad = media.map(r => Multimodal.MediaRow(r.id, "XX".getBytes ++ r.blob.drop(2), r.mime))
    assertThrows[org.apache.spark.SparkException](Multimodal.decodeBmp(spark, bad).collect())
  }

  test("WAV round trip: valid RIFF/WAVE PCM16, chunk walk, exact energy sum") {
    val media = Multimodal.encodeWav(spark, docs((9L, "AB")), "doc_id", "text")
    val blob = media.collect().head.blob
    assert(new String(blob.take(4), "US-ASCII") == "RIFF")
    assert(new String(blob.slice(8, 12), "US-ASCII") == "WAVE")
    val dec = Multimodal.decodeWav(spark, media).collect().head
    // samples: (65-64)*256=256, (66-64)*256=512 -> sum_sq = 256² + 512²
    assert(dec == Multimodal.WavDecoded(9L, 16000, 1, 2L, 256L * 256 + 512L * 512))
    // negative samples square positively: space (32) -> (32-64)*256 = -8192
    val dec2 = Multimodal.decodeWav(spark,
      Multimodal.encodeWav(spark, docs((10L, " ")), "doc_id", "text")).collect().head
    assert(dec2.sum_sq == 8192L * 8192L && dec2.n_samples == 1L)
  }

  test("vocabGrowth: exact first-occurrence curve in (doc, position) order") {
    // doc 1: "a b a c" (positions 1-4), doc 2: "c d" (positions 5-6)
    // firsts: a@1, b@2, c@4, d@6
    val out = TextAnalysis.vocabGrowth(
      docs((1L, "a b a c"), (2L, "c d")), "doc_id", "text", Seq(1L, 2L, 3L, 4L, 5L, 6L, 100L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L, 5L -> 3L, 6L -> 4L, 100L -> 4L))
  }

  test("gramMatrix: equals the naive pairwise form, partition-invariant") {
    val rnd = new scala.util.Random(7)
    val d = 5
    val vecs = Seq.fill(40)(Seq.fill(d)(rnd.nextInt(255) - 127)).toDF("q")
    val got = Similarity.gramMatrix(vecs, "q", d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val rows = vecs.as[Seq[Int]].collect()
    val want = (for (i <- 0 until d; j <- i until d)
      yield (i, j) -> rows.map(q => q(i).toLong * q(j)).sum).toMap
    assert(got == want)
    val re = Similarity.gramMatrix(vecs.repartition(7), "q", d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(re == got)
    // wrong dimension fails loudly, not with a silent partial sum
    assertThrows[org.apache.spark.SparkException](
      Similarity.gramMatrix(vecs, "q", d + 1).collect())
  }

  test("decodeBmpTiles: un-flip restores payload order; ragged edge tiles; zero padding") {
    // 16-wide image, tile=8 → tile_x ∈ {0,1}. 49 chars → h=2 rows, second
    // row = 1 real char + 47 zero pad bytes.
    val text = ("A" * 48) + "B" // row 0 all 'A'(65), row 1 starts with 'B'(66)
    val tiles = Multimodal.decodeBmpTiles(spark,
      Multimodal.encodeBmp(spark, docs((5L, text)), "doc_id", "text"), tile = 8)
      .collect().map(t => (t.tile_x, t.tile_y) -> t).toMap
    // h=2 < tile → one tile row; tile (0,0) holds pixels x=0..7 of both rows:
    // row 0: 8 px of 'A' per channel; row 1: pixel 16 = bytes 48..50 = ('B',0,0)
    val t00 = tiles((0, 0))
    assert(t00.n_px == 16)
    assert(t00.sum_b == 8L * 65 + 66 && t00.sum_g == 8L * 65 && t00.sum_r == 8L * 65)
    val t10 = tiles((1, 0))
    assert(t10.n_px == 16 && t10.sum_b == 8L * 65 && t10.sum_g == 8L * 65 && t10.sum_r == 8L * 65)
    assert(tiles.size == 2)
  }

  test("weightedSample: exact ticket-share probabilities, partition-invariant") {
    val d = Seq((1L, 1L), (2L, 3L), (3L, 6L), (4L, 0L)).toDF("doc_id", "w")
    val out = Dedup.weightedSample(d, "doc_id", "w", draws = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 50) // every draw resolves
    assert(!out.values.toSet.contains(4L)) // zero weight never wins
    // the weight-6 doc should win more often than the weight-1 doc over
    // 50 independent draws (P(win)=0.6 vs 0.1; this is deterministic data,
    // not a flaky sample — the hashes are fixed)
    val byDoc = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byDoc.getOrElse(3L, 0) > byDoc.getOrElse(1L, 0))
    val re = Dedup.weightedSample(d.repartition(5), "doc_id", "w", draws = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == out)
    // exact argmin semantics: brute-force replica of draw 1
    import graft.functions.Hashing.md5Long
    val brute = d.filter(col("w") >= 1)
      .select(col("doc_id"), explode(expr("sequence(CAST(1 AS BIGINT), w)")).as("tk"))
      .select(col("doc_id"),
        md5Long(concat(col("doc_id").cast("string"), lit("#t"),
          col("tk").cast("string"), lit("#d1"))).as("h"))
      .orderBy("h", "doc_id").limit(1).collect().head.getLong(0)
    assert(out(1L) == brute)
  }

  test("decodeBmpAHash: identical images hash equal; brightness split sets grid bits") {
    // doc 6 and 7 identical → same hash; doc 8 very different
    val d = docs((6L, "m" * 96), (7L, "m" * 96), (8L, ("A" * 48) + ("z" * 48)))
    val out = Multimodal.decodeBmpAHash(spark,
      Multimodal.encodeBmp(spark, d, "doc_id", "text"))
      .collect().map(r => r.id -> r).toMap
    assert(out(6L).ahash == out(7L).ahash)
    assert(out(6L).n_px == 32) // 96 chars / 3 = 32 px (16x2)
    // uniform image: no cell is strictly brighter than the mean → hash 0
    assert(out(6L).ahash == 0L)
    // doc 8: row 0 'A'(65) dim, row 1 'z'(122) bright → bright cells exist
    assert(out(8L).ahash != 0L)
  }

  test("hammingNearDup at bits=64 equals brute force; sign bit participates") {
    // fingerprints straddling the sign bit: Long.MinValue has bit 63 set
    val fps = Seq((1L, Long.MinValue), (2L, Long.MinValue | 1L), (3L, 0L),
      (4L, -1L), (5L, Long.MinValue | 3L)).toDF("id", "fp")
    val got = Dedup.hammingNearDup(fps, "id", "fp", bits = 64, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val raw = Map(1L -> Long.MinValue, 2L -> (Long.MinValue | 1L), 3L -> 0L,
      4L -> -1L, 5L -> (Long.MinValue | 3L))
    val want = (for {
      a <- raw.keys; b <- raw.keys if a < b
      h = java.lang.Long.bitCount(raw(a) ^ raw(b)) if h <= 3
    } yield (a, b) -> h.toLong).toMap
    assert(got == want)
    assert(want.contains((1L, 2L)) && want.contains((1L, 5L))) // sanity: ball is non-trivial
  }

  test("scdHistory: runs split on change AND on deletion gaps; is_current marks the tip") {
    // key 1: stable across v1-v3 → one current run
    // key 2: changes at v2 → two runs, second current
    // key 3: present v1, absent v2, back at v3 with the SAME fp → the gap
    //        still splits the run (reappearance is a new record)
    // key 4: deleted after v1 → one closed, non-current run
    val snaps = Seq(
      (1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L),
      (2L, 1L, 20L), (2L, 2L, 21L), (2L, 3L, 21L),
      (3L, 1L, 30L), (3L, 3L, 30L),
      (4L, 1L, 40L)).toDF("key", "version", "fp")
    val out = Dedup.scdHistory(snaps, "key", "version", "fp", latest = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(1), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, 1L, 3L, 10L, true),
      (2L, 1L, 1L, 20L, false), (2L, 2L, 3L, 21L, true),
      (3L, 1L, 1L, 30L, false), (3L, 3L, 3L, 30L, true),
      (4L, 1L, 1L, 40L, false)))
  }

  test("decodeWavFrames: frame boundaries, ragged tail, crossing attribution") {
    // 5 chars with frameLen=2: samples from codes (c-64)*256.
    // "A @ B!" without spaces → use explicit chars: A(65)→256, ' '(32)→-8192,
    // '@'(64)→0, 'B'(66)→512, '!'(33)→-7936.
    val text = "A @B!"
    val frames = Multimodal.decodeWavFrames(spark,
      Multimodal.encodeWav(spark, docs((7L, text)), "doc_id", "text"), frameLen = 2)
      .collect().sortBy(_.frame_no)
    // samples: [256, -8192, 0, 512, -7936]
    // frame 0 = (256, -8192): energy 256²+8192², crossing at i=1 (256→-8192) → 1
    // frame 1 = (0, 512): zero never crosses (-8192→0 no, 0→512 no) → 0
    // frame 2 = (-7936): ragged, crossing at i=4 (512→-7936) → 1
    assert(frames.toSeq == Seq(
      Multimodal.WavFrame(7L, 0L, 2L, 256L * 256 + 8192L * 8192, 1L),
      Multimodal.WavFrame(7L, 1L, 2L, 512L * 512, 0L),
      Multimodal.WavFrame(7L, 2L, 1L, 7936L * 7936, 1L)))
    // exactly-full final frame: no phantom empty frame behind it
    val full = Multimodal.decodeWavFrames(spark,
      Multimodal.encodeWav(spark, docs((8L, "ABCD")), "doc_id", "text"), frameLen = 2)
      .collect().map(_.frame_no).sorted
    assert(full.toSeq == Seq(0L, 1L))
  }

  test("snapshotDiff: added/removed/changed/same, null-safe, length-prefixed") {
    val a = docs((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
    val b = docs((2L, "beta"), (3L, "gamma v2"), (4L, "delta"))
    val out = Dedup.snapshotDiff(a, b, "doc_id", Seq("text"))
      .select("key", "status").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
    // the length prefix keeps multi-column payloads unambiguous:
    // ("ab","c") vs ("a","bc") must CHANGE, not collide
    val p1 = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val p2 = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val st = Dedup.snapshotDiff(p1, p2, "id", Seq("x", "y"))
      .select("status").collect().head.getString(0)
    assert(st == "changed")
    // NULL payload is a value, not an error, and differs from the string "null"
    val n1 = Seq((1L, null.asInstanceOf[String])).toDF("id", "x")
    val n2 = Seq((1L, "null")).toDF("id", "x")
    assert(Dedup.snapshotDiff(n1, n2, "id", Seq("x"))
      .select("status").collect().head.getString(0) == "changed")
    assert(Dedup.snapshotDiff(n1, n1, "id", Seq("x"))
      .select("status").collect().head.getString(0) == "same")
  }

  test("property: B9 map inversion round-trips on seeded random role->permission maps") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val roles = (1 to 20).map(r => s"role$r" ->
        (1 to (1 + rnd.nextInt(8))).map(_ => s"perm${rnd.nextInt(15)}").distinct)
      val df = roles.toDF("role", "perms")
      // invert: permission -> roles (main.go:873-895's aggregation)
      val inverted = df.select(col("role"), explode(col("perms")).as("perm"))
        .groupBy("perm").agg(collect_set(col("role")).as("roles"))
      // invert back: role -> permissions
      val back = inverted.select(col("perm"), explode(col("roles")).as("role"))
        .groupBy("role").agg(collect_set(col("perm")).as("perms"))
        .as[(String, Seq[String])].collect().map { case (r, ps) => r -> ps.toSet }.toMap
      val expected = roles.toMap.map { case (r, ps) => r -> ps.toSet }
      assert(back == expected)
    }
  }

  test("frameSample explodes every stride-th char code") {
    val out = Multimodal.frameSample(docs((1L, "abcdefghij")), "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    // chars at positions 1, 5, 9 -> 'a','e','i'
    assert(out.map(_._3).toSeq == Seq('a'.toLong, 'e'.toLong, 'i'.toLong))
  }

  test("byteHistogram buckets every byte; empty blob yields zeros") {
    val media = Multimodal.asMedia(docs((1L, "AB !"), (2L, "")), "doc_id", "text")
    val out = Multimodal.byteHistogram(media)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // 'A'=65,'B'=66 -> h1; ' '=32,'!'=33 -> h0
    assert(out(1L) == ((2L, 2L, 0L, 0L)))
    assert(out(2L) == ((0L, 0L, 0L, 0L)))
  }

  test("resizeStub keeps every factor-th byte and updates metadata") {
    val media = Multimodal.asMedia(docs((1L, "abcdefgh")), "doc_id", "text")
    val out = Multimodal.resizeStub(media, factor = 4)
      .select(col("id"), col("blob").cast("string"), col("meta.n_bytes"))
      .as[(Long, String, Long)].collect().head
    assert(out == ((1L, "ae", 2L))) // positions 1 and 5
  }

  test("tfidfTopK: corpus-wide terms score below distinctive ones") {
    val corpus = docs(
      (1L, "apple apple common"), (2L, "banana common"), (3L, "cherry common"))
    val out = TextAnalysis.tfidfTopK(corpus, "doc_id", "text", k = 1)
      .as[(Long, String, Double, Int)].collect().map(r => r._1 -> r._2).toMap
    // 'common' appears in every doc (idf ~ ln(4/4) = 0) and must never win.
    assert(out == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
  }

  test("redact masks emails and long digit runs, leaves short numbers") {
    val out = TextAnalysis.redact(
        docs((1L, "mail bob@x.com card 12345678 pin 123")), "doc_id", "text")
      .as[(Long, String)].collect().head._2
    assert(out == "mail <EMAIL> card <NUM> pin 123")
  }

  test("hashSample is deterministic and respects bucket bounds") {
    val d = docs((1L to 200L).map(i => (i, s"doc $i")): _*)
    val a = Dedup.hashSample(d, "doc_id", 10).select("doc_id").as[Long].collect().sorted.toSeq
    val b = Dedup.hashSample(d.repartition(7), "doc_id", 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b) // partitioning-independent
    assert(a.nonEmpty && a.size < 60) // ~10% of 200, loose bound
    val full = Dedup.hashSample(d, "doc_id", 100).count()
    assert(full == 200L)
  }

  test("editNeighbors equals brute-force levenshtein<=1 (blocking is lossless)") {
    // typo families: substitution, deletion, insertion, equality, and
    // seeded random strings for negative pairs
    val rnd = new scala.util.Random(11)
    val base = Seq("alice@example.com", "alice@exampel.com", "alic@example.com",
      "aalice@example.com", "alice@example.com", "bob@example.com", "bob@sample.com",
      "", "a", "b", "ab", "ba")
    val noise = (1 to 60).map(_ => rnd.alphanumeric.take(3 + rnd.nextInt(10)).mkString)
    val rows = (base ++ noise).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val d = rows.toDF("id", "s")
    val got = Dedup.editNeighbors(d, "id", "s")
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dl = lev(sa, sb) if dl <= 1
    } yield (ia, ib, dl.toLong)).toSet
    assert(got == want)
  }

  test("sampleQuantiles: within O(1/sqrt(k)) of exact, deterministic, exact when k >= n") {
    import graft.operators.Sketch
    val n = 5000
    val vals = (1 to n).map(i => (i.toLong * 17 % 10007, i.toLong)) // value, unique priority key
      .toDF("v", "pk")
    val bps = Seq(2500, 5000, 9000)
    val est = Sketch.sampleQuantiles(vals, "v", "pk", bps, k = 512)
      .select("bp", "est").as[(Long, Long)].collect().toMap
    val exact = Sketch.exactQuantiles(vals.select("v"), "v", bps)
      .select("bp", "value").as[(Long, Long)].collect().toMap
    // rank error ~ n/sqrt(k) ≈ 220; values are ~2 apart per rank here
    bps.foreach { bp =>
      assert(math.abs(est(bp.toLong) - exact(bp.toLong)) < 1500,
        s"bp=$bp est=${est(bp.toLong)} exact=${exact(bp.toLong)}")
    }
    // k >= n degenerates to the exact quantile
    val full = Sketch.sampleQuantiles(vals, "v", "pk", bps, k = n)
      .select("bp", "est").as[(Long, Long)].collect().toMap
    bps.foreach(bp => assert(full(bp.toLong) == exact(bp.toLong)))
    // partition-invariant (the portability property the oracle relies on)
    val re = Sketch.sampleQuantiles(vals.repartition(13), "v", "pk", bps, k = 512)
      .select("bp", "est").as[(Long, Long)].collect().toMap
    assert(re == est)
  }

  test("matryoshka: prefix is renormalized to unit length; zero prefix stays zero") {
    val vecs = Seq(
      (1L, Seq(3.0f, 4.0f, 9.0f, 9.0f)), // prefix (3,4): norm 5 -> (0.6, 0.8)
      (2L, Seq(0.0f, 0.0f, 7.0f, 7.0f))) // zero prefix stays (0, 0)
      .toDF("vec_id", "embedding")
    val out = Similarity.matryoshka(vecs, "vec_id", "embedding", 2)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(0.6, 0.8))
    assert(out(2L) == Seq(0.0, 0.0))
  }

  test("packChunks: offsets are the running sum; straddlers flagged at chunk boundaries") {
    // One shard so the layout is fully deterministic: 3+4+5 tokens,
    // budget 6 -> offsets 0,3,7; doc 2 straddles (spans tokens 3..6).
    val corpus = docs(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i j k l"))
    val out = TextAnalysis.packChunks(corpus, "doc_id", "text", budget = 6, shards = 1)
      .select("doc_id", "offset", "chunk", "straddles")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((0L, 0L, false)))
    assert(out(2L) == ((3L, 0L, true)))  // tokens 3..6 cross offset 6
    assert(out(3L) == ((7L, 1L, false))) // tokens 7..11 inside chunk 1
  }

  test("contamination counts shared distinct n-grams across sets, thresholded") {
    val train = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated content with no overlap here"))
    val bench = docs(
      (10L, "the quick brown fox jumps somewhere else entirely"))
    val hits = Dedup.contamination(train, bench, "doc_id", "text", n = 3, minShared = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // train 1 shares the 3-grams "the quick brown", "quick brown fox",
    // "brown fox jumps" with bench 10; train 2 shares nothing.
    assert(hits == Seq((1L, 10L, 3L)))
  }

  test("contamination drops flooding shingles above the df threshold") {
    // "aa bb cc" floods every document (the stopword-n-gram shape that
    // goes near-cartesian at corpus scale); "xx yy zz" is the genuine
    // overlap between train 1 and bench 10.
    val train = docs(
      (1L, "aa bb cc xx yy zz"),
      (2L, "aa bb cc something else entirely here"),
      (3L, "aa bb cc another unrelated train document"))
    val bench = docs((10L, "aa bb cc xx yy zz"))
    // df("aa bb cc") = 4 > maxDf = 3 → dropped; shared count for (1,10)
    // falls from 4 ("aa bb cc","bb cc xx","cc xx yy","xx yy zz") to 3.
    val cappedSet = Dedup.contamination(train, bench, "doc_id", "text",
        n = 3, minShared = 1, maxDf = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(cappedSet == Set((1L, 10L, 3L)))
    // Uncapped (maxDf = 0): the flooding shingle links every train doc.
    val raw = Dedup.contamination(train, bench, "doc_id", "text",
        n = 3, minShared = 1, maxDf = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(raw == Set((1L, 10L, 4L), (2L, 10L, 1L), (3L, 10L, 1L)))
  }

  test("repetitionStats: repeat fractions; short/empty docs get zeros") {
    val out = TextAnalysis.repetitionStats(docs(
        (1L, "spam spam spam spam spam"), // 5 words 1 distinct; 3 identical 3-grams
        (2L, "a b c d"),                  // all distinct words and grams
        (3L, "a b"),                      // < 3 words → no 3-grams
        (4L, "")), "doc_id", "text")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((0.8, 0.6666, 1.0))) // 1-1/5; floor4(1-1/3); 3/3
    assert(out(2L) == ((0.0, 0.0, 0.5)))    // top gram 1 of 2
    assert(out(3L) == ((0.0, 0.0, 0.0)))
    assert(out(4L) == ((0.0, 0.0, 0.0)))
  }

  test("gopherQuality: ASCII '...' counts 3 symbol chars; bands gate the verdict") {
    val good = Seq.tabulate(60)(i => s"alpha$i").mkString(" ") // 60 words, all alphabetic
    val out = TextAnalysis.gopherQuality(docs(
        (1L, good),
        (2L, "hello... world"),            // 14 chars, one ASCII ellipsis → 3/14
        (3L, "- a\n- b\n- c"),             // every line a bullet
        (4L, "")), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4), r.getBoolean(7)))).toMap
    assert(out(1L)._1 == 60 && out(1L)._4)                  // passes all gates
    assert(out(2L)._2 == math.floor(3.0 / 14 * 1e4) / 1e4)  // symbol_ratio
    assert(!out(2L)._4)                                     // too short to pass
    assert(out(3L)._3 == 1.0 && !out(3L)._4)                // bullet_ratio kills it
    assert(out(4L) == ((0L, 0.0, 0.0, false)))
  }

  test("shuffleShard: md5-ordered positions are contiguous per shard and reproducible") {
    // md5long (the class-level Hashing.md5Long replica) recomputes the
    // exact expected (shard, pos) assignment independently of Spark.
    val corpus = docs((1L to 20L).map(i => i -> s"doc number $i"): _*)
    val expected = (1L to 20L).map(i => (i, md5long(i.toString)))
      .groupBy { case (_, h) => h % 4 }
      .flatMap { case (shard, members) =>
        members.sortBy { case (id, h) => (h, id) }.zipWithIndex
          .map { case ((id, _), pos) => id -> ((shard, pos.toLong)) }
      }
    val out = Dedup.shuffleShard(corpus, "doc_id", nShards = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == expected)
    // Positions are dense 0..n-1 within each shard.
    out.groupBy(_._2._1).foreach { case (_, m) =>
      assert(m.values.map(_._2).toSeq.sorted == (0L until m.size).toSeq)
    }
  }

  test("shuffleShardAuto sizes nShards from the corpus; shardOverflow flags undersized nShards") {
    val corpus = docs((1L to 100L).map(i => i -> s"doc $i"): _*)
    // 100 rows / maxShardRows=10 → 10 shards (above the minShards floor of 2).
    val auto = Dedup.shuffleShardAuto(corpus, "doc_id", maxShardRows = 10L, minShards = 2)
    assert(auto.select("shard").distinct().count() == 10)
    // Small corpus: the minShards floor wins.
    val floor = Dedup.shuffleShardAuto(corpus, "doc_id", maxShardRows = 1000000L, minShards = 4)
    assert(floor.agg(org.apache.spark.sql.functions.max("shard")).first().getLong(0) < 4)
    // Undersized nShards=2 over 100 rows with a 10-row target: both shards
    // overflow and the audit says so; a right-sized plan audits clean.
    assert(Dedup.shardOverflow(corpus, "doc_id", 2, 10L).count() == 2)
    assert(Dedup.shardOverflow(corpus, "doc_id", 32, 10L).count() == 0)
  }

  // JVM replica of Hashing.md5Long for seed-order replication in specs.
  private def md5long(s: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)

  test("pqCodes: codes pick the nearest subspace centroid of the md5-seeded codebook") {
    val data = Seq(
      1L -> Array(0f, 0f, 10f, 10f),
      2L -> Array(10f, 10f, 0f, 0f),
      3L -> Array(0f, 0f, 9f, 9f),
      4L -> Array(9f, 9f, 1f, 1f))
    val out = Similarity.pqCodes(data.toDF("vec_id", "embedding"),
        "vec_id", "embedding", m = 2, k = 2)
      .as[(Long, Seq[Int])].collect().toMap
    // Independent JVM replica: seeds = the 2 ids with smallest (md5, id);
    // codebook (sub, c) = subspace sub of seed c; code = argmin L2, ties
    // to the lower cid.
    val seeds = data.sortBy { case (id, _) => (md5long(id.toString), id) }.take(2)
    def sub(v: Array[Float], s: Int) = v.slice(s * 2, s * 2 + 2).map(_.toDouble)
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val expected = data.map { case (id, v) =>
      id -> (0 until 2).map { s =>
        seeds.zipWithIndex.map { case ((_, sv), c) => (l2(sub(v, s), sub(sv, s)), c) }.min._2
      }
    }.toMap
    assert(out == expected)
  }

  test("ivfPqTopK: with nprobe=nlist the ranking is exactly ADC over the whole corpus") {
    // Deterministic pseudo-random corpus (no RNG — seeded by index).
    val data = (1L to 8L).map(i =>
      i -> Array.tabulate(4)(d => ((i * 7 + d * 13) % 10).toFloat))
    val df = data.toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(df, df.filter(col("vec_id") <= 2),
        "vec_id", "embedding", kTop = 3, nlist = 2, nprobe = 2, m = 2, k = 4)
      .select("query_id", "neighbor_id", "adist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    // JVM ADC replica.
    val byMd5 = data.sortBy { case (id, _) => (md5long(id.toString), id) }
    def sub(v: Array[Float], s: Int) = v.slice(s * 2, s * 2 + 2).map(_.toDouble)
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val book = byMd5.take(4).map(_._2) // (cid)(subspace slice via sub())
    val codes = data.map { case (id, v) =>
      id -> (0 until 2).map { s =>
        book.zipWithIndex.map { case (sv, c) => (l2(sub(v, s), sub(sv, s)), c) }.min._2
      }
    }.toMap
    val expected = data.take(2).flatMap { case (qid, qv) =>
      val scored = data.filter(_._1 != qid).map { case (nid, _) =>
        val d = (0 until 2).foldLeft(0.0)((acc, s) => acc + l2(sub(qv, s), sub(book(codes(nid)(s)), s)))
        (nid, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (nid, d) => (d, nid) }
      scored.take(3).zipWithIndex.map { case ((nid, d), r) => (qid, nid, d, r + 1) }
    }.toSet
    assert(out == expected)
  }

  test("mixtureSample: floor(rate) full epochs + md5-coin fractional epoch; rate 0 drops") {
    val corpus = (1L to 50L).map(i =>
      (i, s"doc $i",
        if (i <= 10) "a" else if (i <= 20) "b" else if (i <= 30) "c"
        else if (i <= 40) "d" else "e"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.mixtureSample(corpus, "doc_id", "source",
        Map("a" -> 2.0, "b" -> 0.5, "c" -> 0.0, "e" -> 0.3), defaultRate = 1.0)
      .select("doc_id", "source", "epoch")
      .as[(Long, String, Int)].collect().toSeq
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
    // rate 2.0: exactly epochs 0 and 1; rate 0: absent; default 1.0: epoch 0.
    (1L to 10L).foreach(i => assert(byDoc(i) == Seq(0, 1)))
    (21L to 30L).foreach(i => assert(!byDoc.contains(i)))
    (31L to 40L).foreach(i => assert(byDoc(i) == Seq(0)))
    // rate 0.5: epoch 0 iff the md5 coin on (id, epoch 0) lands < 5000 bp.
    (11L to 20L).foreach { i =>
      val coin = md5long(s"$i#0") % 10000
      assert(byDoc.get(i).toSeq.flatten == (if (coin < 5000) Seq(0) else Nil), s"doc $i")
    }
    // rate 0.3 quantizes to 3000 bp, not floor(2999.999…) = 2999 — the
    // IEEE-vs-decimal trap the floor(x+0.5) quantization exists for.
    (41L to 50L).foreach { i =>
      val coin = md5long(s"$i#0") % 10000
      assert(byDoc.get(i).toSeq.flatten == (if (coin < 3000) Seq(0) else Nil), s"doc $i")
    }
    // Reruns produce the identical multiset.
    val again = Dedup.mixtureSample(corpus, "doc_id", "source",
        Map("a" -> 2.0, "b" -> 0.5, "c" -> 0.0, "e" -> 0.3), defaultRate = 1.0)
      .select("doc_id", "source", "epoch").as[(Long, String, Int)].collect().toSeq
    assert(out.sorted == again.sorted)
  }

  test("stratifiedHead: n smallest (md5, id) per domain, input columns preserved") {
    val corpus = (1L to 30L).map(i => (i, s"doc $i", if (i % 3 == 0) "x" else "y"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.stratifiedHead(corpus, "doc_id", "source", n = 4)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    val expected = (1L to 30L).map(i => (i, if (i % 3 == 0) "x" else "y"))
      .groupBy(_._2).flatMap { case (_, members) =>
        members.sortBy { case (id, _) => (md5long(id.toString), id) }.take(4)
      }.toSet
    assert(out == expected)
    assert(out.count(_._2 == "x") == 4 && out.count(_._2 == "y") == 4)
  }

  test("property: pqCodes equals the JVM replica on 10 seeded random corpora") {
    val rnd = new scala.util.Random(11)
    (1 to 10).foreach { trial =>
      val m = 1 + rnd.nextInt(3)
      val dims = m * (1 + rnd.nextInt(4))
      val k = 1 + rnd.nextInt(5)
      val n = k + rnd.nextInt(20)
      val data = (1L to n.toLong).map(i => i -> Array.fill(dims)(rnd.nextInt(20).toFloat))
      val out = Similarity.pqCodes(data.toDF("vec_id", "embedding"),
          "vec_id", "embedding", m, k)
        .as[(Long, Seq[Int])].collect().toMap
      val seeds = data.sortBy { case (id, _) => (md5long(id.toString), id) }.take(k)
      val sl = dims / m
      def sub(v: Array[Float], s: Int) = v.slice(s * sl, s * sl + sl).map(_.toDouble)
      def l2(a: Array[Double], b: Array[Double]) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      val expected = data.map { case (id, v) =>
        id -> (0 until m).map { s =>
          seeds.zipWithIndex.map { case ((_, sv), c) => (l2(sub(v, s), sub(sv, s)), c) }.min._2
        }
      }.toMap
      assert(out == expected, s"trial=$trial m=$m k=$k dims=$dims n=$n")
    }
  }

  test("property: mixtureSample equals the JVM replica on seeded random 0.1-step rates") {
    // 0.1-granular rates hit the IEEE quantization traps (0.3, 0.7, 1.1…)
    // the floor(x+0.5) basis-point rule exists for.
    val rnd = new scala.util.Random(13)
    (1 to 8).foreach { trial =>
      val domains = Seq("a", "b", "c", "d")
      val rates = domains.map(d => d -> rnd.nextInt(30) / 10.0).toMap
      val data = (1L to 30L).map(i => (i, s"t$i", domains(rnd.nextInt(4))))
      val out = Dedup.mixtureSample(data.toDF("doc_id", "text", "source"),
          "doc_id", "source", rates)
        .select("doc_id", "epoch").as[(Long, Int)].collect().toSet
      val expected = data.flatMap { case (id, _, dom) =>
        val bp = math.floor(rates(dom) * 10000 + 0.5).toLong
        val full = (bp / 10000).toInt
        val frac = bp % 10000
        (0 until full).map(e => (id, e)) ++
          (if (md5long(s"$id#$full") % 10000 < frac) Seq((id, full)) else Nil)
      }.toSet
      assert(out == expected, s"trial=$trial rates=$rates")
    }
  }

  test("ngramLm: corpus bigram counts, context totals, conditional probabilities") {
    val out = TextAnalysis.ngramLm(docs(
        (1L, "a b a b c"), // bigrams: "a b","b a","a b","b c"
        (2L, "a b"),       // "a b"
        (3L, "x")), "text", n = 2, topK = 10)
      .as[(String, String, Long, Long, Double, Int)].collect()
    val byGram = out.map(r => r._1 -> r).toMap
    assert(byGram("a b") == (("a b", "a", 3L, 3L, 1.0, 1)))
    assert(byGram("b a") == (("b a", "b", 1L, 2L, 0.5, 2))) // tie broken by gram
    assert(byGram("b c") == (("b c", "b", 1L, 2L, 0.5, 3)))
    assert(out.length == 3) // the single-word doc contributes no bigrams
    assert(TextAnalysis.ngramLm(docs((1L, "a b a b c")), "text", topK = 1).count() == 1)
  }

  test("chunkWindows: strided windows share overlap tokens; empty docs emit no chunks") {
    val out = TextAnalysis.chunkWindows(
        docs((1L, "a b c d e f g h"), (2L, "a b"), (3L, "")),
        "doc_id", "text", window = 4, overlap = 2)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 0L, 4L, "a b c d"), // starts every stride=2
      (1L, 1L, 4L, "c d e f"),
      (1L, 2L, 4L, "e f g h"),
      (1L, 3L, 2L, "g h"),     // tail window clamps to the doc end
      (2L, 0L, 2L, "a b")))
    // doc 3 (no tokens) contributes nothing — zero chunks, not one empty.
    assert(!out.exists(_._1 == 3L))
  }

  test("property: chunkWindows equals the JVM replica on seeded random corpora") {
    val rnd = new scala.util.Random(11)
    (1 to 10).foreach { _ =>
      val window = 2 + rnd.nextInt(6)
      val overlap = rnd.nextInt(window)
      val stride = window - overlap
      val corpus = (1L to 20L).map { id =>
        val n = rnd.nextInt(25)
        (id, Seq.fill(n)(('a' + rnd.nextInt(4)).toChar.toString).mkString(" "))
      }
      val expect = corpus.flatMap { case (id, text) =>
        val w = text.split("\\s+").filter(_.nonEmpty)
        (1 to w.length by stride).zipWithIndex.map { case (start, idx) =>
          (id, idx.toLong, math.min(window, w.length - start + 1).toLong,
            w.slice(start - 1, start - 1 + window).mkString(" "))
        }
      }.toSet
      val got = TextAnalysis.chunkWindows(corpus.toDF("doc_id", "text"),
          "doc_id", "text", window, overlap)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == expect, s"window=$window overlap=$overlap")
    }
  }

  test("lmCoverage: per-doc known-gram counts, integer hit mass, zero-filled short docs") {
    val corpus = docs(
      (1L, "a b a b c"), // bigrams: "a b","b a","a b","b c"
      (2L, "a b"),       // "a b"
      (3L, "x"))         // no bigrams -> zero row
    // topK=1 keeps only "a b" (cnt 3) in the LM.
    val lm = TextAnalysis.ngramLm(corpus, "text", topK = 1)
    val out = TextAnalysis.lmCoverage(corpus, lm, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: 4 grams, 2 known ("a b" twice), hit mass 2*3, coverage 0.5.
    assert(out(1L) == ((1L, 4L, 2L, 6L, 0.5)))
    assert(out(2L) == ((2L, 1L, 1L, 3L, 1.0)))
    assert(out(3L) == ((3L, 0L, 0L, 0L, 0.0)))
  }

  test("dsirWeight: target-vs-background mass ratio with add-one smoothing") {
    val corpus = docs(
      (1L, "a b a b c"), // bigrams: "a b","b a","a b","b c"
      (2L, "x y"),       // "x y" — absent from the target slice
      (3L, "z"))         // no bigrams
    val target = TextAnalysis.ngramLm(corpus.filter($"doc_id" === 1L), "text")
    val background = TextAnalysis.ngramLm(corpus, "text")
    val out = TextAnalysis.dsirWeight(corpus, target, background, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: 4 grams, target mass 2+1+2+1=6 == background mass -> 7/7 = 1.0
    assert(out(1L) == ((1L, 4L, 6L, 6L, 1.0)))
    // doc 2: "x y" unknown to target (mass 0), background mass 1 -> 1/2 = 0.5
    assert(out(2L) == ((2L, 1L, 0L, 1L, 0.5)))
    // doc 3: no grams -> zero masses, neutral smoothed weight 1.0
    assert(out(3L) == ((3L, 0L, 0L, 0L, 1.0)))
  }

  test("substringSpans flags recurring 8-token windows at their positions; unique docs stay clean") {
    val corpus = docs(
      (1L, "one two three four five six seven eight nine"), // windows at 1, 2
      (2L, "one two three four five six seven eight nine"), // verbatim dup
      (3L, "alpha beta gamma delta epsilon zeta eta theta")) // unique window
    val out = Dedup.substringSpans(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(byDoc(2L).map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(!byDoc.contains(3L))
    assert(out.forall(_._4 == 2L))
    // A shared span embedded at different offsets inside otherwise-unique
    // docs is found at its own start in each.
    val embedded = Dedup.substringSpans(docs(
      (1L, "x one two three four five six seven eight y"),
      (2L, "z q one two three four five six seven eight w")), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(embedded.map(r => (r._1, r._2)).toSet == Set((1L, 2L), (2L, 3L)))
  }

  test("crossSpans: train spans present in probe flag at position; train-only dups stay clean") {
    // Probe doc 100 contains "one two three"; train doc 1 embeds it at
    // token 3, doc 2 at token 1. Docs 1 and 2 also SHARE "p q r" with
    // each other but not with the probe — cross-corpus must NOT flag it.
    val train = docs(
      (1L, "a b one two three p q r"),
      (2L, "one two three x p q r y"))
    val probe = docs((100L, "zz one two three zz"))
    val out = Dedup.crossSpans(train, probe, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 3L), (2L, 1L)))
    assert(out.forall(_._4 == 1L)) // one probe doc holds the span
    // A span in two probe docs counts both.
    val probe2 = probe.union(docs((200L, "one two three tail tail")))
    val out2 = Dedup.crossSpans(train, probe2, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long)].collect()
    assert(out2.forall(_._4 == 2L))
  }

  test("spanIntervals merges overlapping/adjacent windows; gaps > k stay separate") {
    // k=3: windows [s, s+2]; starts 1,2,5 chain (each gap <= 3 — overlap
    // or adjacency), start 10 is 5 past 5 -> its own island.
    val spans = Seq((1L, 1L), (1L, 2L), (1L, 5L), (1L, 10L), (2L, 4L))
      .toDF("doc_id", "start")
    val out = Dedup.spanIntervals(spans, "doc_id", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 1L, 7L, 3L), (1L, 10L, 12L, 1L), (2L, 4L, 6L, 1L)))
  }

  test("percentileCut: exact threshold interpolates; approx picks a real element; kept matches") {
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val ex = Dedup.percentileCut(df, "v", 0.5, exact = true)
      .select("id", "threshold", "kept").as[(Long, Double, Boolean)].collect()
    assert(ex.forall(_._2 == 5.5)) // exact interpolated median of 1..10
    assert(ex.filter(_._3).map(_._1).sorted.toSeq == (6L to 10L))
    val ap = Dedup.percentileCut(df, "v", 0.5)
      .select("v", "threshold", "kept").as[(Double, Double, Boolean)].collect()
    val th = ap.head._2
    assert((1 to 10).map(_.toDouble).contains(th)) // approx returns a real element
    assert(ap.forall(r => r._3 == (r._1 >= th)))
  }

  test("applyCuts: flagged intervals drop out, uncut docs pass through, counts match") {
    val d = docs((1L, "a b c d e f"), (2L, "x y z"))
    val iv = Seq((1L, 2L, 3L), (1L, 5L, 5L)).toDF("doc_id", "span_start", "span_end")
    val out = Dedup.applyCuts(d, iv, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ("a d f", 3L)) // tokens 2,3,5 removed
    assert(out(2L) == ("x y z", 0L)) // no intervals -> unchanged
    // End-to-end with the find half: two docs sharing a 3-token run both
    // lose exactly that run.
    val shared = docs((1L, "one two three tail1 tail2"), (2L, "head one two three end"))
    val cut = Dedup.applyCuts(shared,
      Dedup.spanIntervals(Dedup.substringSpans(shared, "doc_id", "text", k = 3), "doc_id", k = 3),
      "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(cut(1L) == ("tail1 tail2", 3L))
    assert(cut(2L) == ("head end", 3L))
  }

  test("keepBest: max score wins, ties break to min id, one keeper per cluster") {
    // Cluster 10: clear max at id 3. Cluster 20: tie 0.5/0.5 -> id 4 keeps.
    // Cluster 30: singleton keeps itself.
    val members = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L), (6L, 30L))
      .toDF("id", "cluster")
    val scores = Seq((1L, 0.1), (2L, 0.3), (3L, 0.9), (4L, 0.5), (5L, 0.5), (6L, 0.2))
      .toDF("id", "score")
    val out = Dedup.keepBest(members, scores, "id", "cluster", "score")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.length == 6)
    assert(out.filter(_._4).map(r => (r._2, r._1)).toSet == Set((10L, 3L), (20L, 4L), (30L, 6L)))
    assert(out.groupBy(_._2).forall { case (_, rows) => rows.count(_._4) == 1 })
    // Type-generic ids: the same selection on string keys (no casts anywhere).
    val sm = Seq(("a", "g1"), ("b", "g1"), ("c", "g2")).toDF("id", "cluster")
    val ss = Seq(("a", 2.0), ("b", 2.0), ("c", 1.0)).toDF("id", "score")
    val sOut = Dedup.keepBest(sm, ss, "id", "cluster", "score")
      .as[(String, String, Double, Boolean)].collect()
    assert(sOut.filter(_._4).map(r => (r._2, r._1)).toSet == Set(("g1", "a"), ("g2", "c")))
  }

  test("substring family property: spans and intervals equal a JVM replica on a deterministic corpus") {
    // Deterministic small-vocab corpus (no RNG — seeded by index): dense
    // cross-document gram collisions at k=3.
    val vocab = Vector("a", "b", "c", "d")
    val k = 3
    val data = (1L to 30L).map { i =>
      val len = ((i * 13) % 10).toInt
      i -> (0 until len).map(j => vocab(((i * 31 + j * 7) % 4).toInt)).mkString(" ")
    }
    val df = data.toDF("doc_id", "text")
    val windows = data.flatMap { case (id, text) =>
      val w = text.split("\\s+").filter(_.nonEmpty)
      (0 to w.length - k).map(s => (id, s + 1L, w.slice(s, s + k).mkString(" ")))
    }
    val dfreq = windows.groupBy(_._3).map { case (g, ws) => g -> ws.map(_._1).distinct.size }
    val flagged = windows.filter(w => dfreq(w._3) >= 2)
      .map(w => (w._1, w._2, md5long(w._3), dfreq(w._3).toLong))
    val got = Dedup.substringSpans(df, "doc_id", "text", k = k)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == flagged.toSet)
    val intervals = flagged.groupBy(_._1).flatMap { case (id, spans) =>
      val starts = spans.map(_._2).distinct.sorted
      val islands = starts.foldLeft(List.empty[List[Long]]) { (acc, s) =>
        acc match {
          case cur :: rest if s - cur.last <= k => (cur :+ s) :: rest
          case _ => List(s) :: acc
        }
      }
      islands.map(is => (id, is.head, is.last + (k - 1), is.size.toLong))
    }.toSet
    val gotI = Dedup.spanIntervals(
      Dedup.substringSpans(df, "doc_id", "text", k = k), "doc_id", k = k)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(gotI == intervals)
  }

  test("labelCentroids + nearestCentroid: exact micro-unit means, argmin with tiebreak") {
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(0.2f, 0.0f), 0),  // class 0 mean = (0.1, 0) -> (100000, 0)
      (3L, Array(1.0f, 1.0f), 1),
      (4L, Array(1.0f, 0.8f), 1))  // class 1 mean = (1.0, 0.9) -> (1000000, 900000)
      .toDF("vec_id", "embedding", "label")
    val cents = graft.operators.Clustering.labelCentroids(vecs, "embedding", "label")
      .as[(Int, Seq[Long])].collect().toMap
    assert(cents(0) == Seq(100000L, 0L))
    assert(cents(1) == Seq(1000000L, 900000L))
    val asg = graft.operators.Clustering.nearestCentroid(
      vecs, graft.operators.Clustering.labelCentroids(vecs, "embedding", "label"),
      "vec_id", "embedding", "label")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    // vec 1 at origin: dist to c0 = 100000², to c1 = 1e6² + 9e5² -> pred 0.
    assert(asg(1L) == ((1L, 0, 0, 100000L * 100000L)))
    assert(asg(3L)._3 == 1) // (1,1) is nearest its own class mean
    // A vector equidistant to both centroids takes the lower label.
    val tie = Seq((1L, Array(0.0f), 7), (2L, Array(2.0f), 3)).toDF("vec_id", "embedding", "label")
    val tieAsg = graft.operators.Clustering.nearestCentroid(
      tie.select(col("vec_id"), array(lit(1.0f)).as("embedding"), col("label")),
      graft.operators.Clustering.labelCentroids(tie, "embedding", "label"),
      "vec_id", "embedding", "label").select("pred_label").distinct()
      .as[Int].collect().toSeq
    assert(tieAsg == Seq(3)) // dist 1e12 to both; label 3 < 7 wins
  }

  test("lloydStep: update centroids follow the PREDICTED clusters, not the labels") {
    // vec 5 is labeled 0 but sits on class 1's mean: the assignment moves
    // it, so cluster 0's update = mean(vec1, vec2) and cluster 1's =
    // mean(vec3, vec4, vec5) — exact integer micro-unit arithmetic.
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(0.2f, 0.0f), 0),
      (3L, Array(1.0f, 1.0f), 1),
      (4L, Array(1.0f, 0.8f), 1),
      (5L, Array(1.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = graft.operators.Clustering.lloydStep(vecs, "vec_id", "embedding", "label")
      .as[(Int, Long, Long)].collect().toSet
    assert(got == Set(
      (0, 1L, 100000L), (0, 2L, 0L),
      (1, 1L, 1000000L), (1, 2L, (1000000L + 800000L + 1000000L) / 3)))
  }

  test("vocabCoverage: rank by frequency, exact cumulative counts and shares") {
    val corpus = docs((1L, "a a a b b c"), (2L, "a b x"))
    val out = TextAnalysis.vocabCoverage(corpus, "text", topK = 3)
      .as[(String, Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    // counts: a=4, b=3, c=1, x=1 over 9 tokens; topK=3 keeps a, b, c.
    assert(out("a") == (("a", 4L, 1, 4L, math.floor(4.0 / 9 * 1e6) / 1e6)))
    assert(out("b") == (("b", 3L, 2, 7L, math.floor(7.0 / 9 * 1e6) / 1e6)))
    assert(out("c") == (("c", 1L, 3, 8L, math.floor(8.0 / 9 * 1e6) / 1e6)))
    assert(!out.contains("x")) // rank 4 (tie with c broken by term) is cut
  }

  test("annRecall: per-query intersection share; empty approx side keeps the query") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L)).toDF("query_id", "neighbor_id")
    val out = Similarity.annRecall(exact, approx)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 2L, math.floor(2.0 / 3 * 10000) / 10000)))
    assert(out(2L) == ((2L, 2L, 0L, 0.0))) // no approx rows at all for query 2
  }

  test("quantizeInt8: max element maps to 127; zero vector guarded") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .as[(Long, Seq[Int], Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 == Seq(63, -127, 31)) // floor(0.5*127)=63, floor(0.25*127)=31
    assert(out(1L)._2 == math.floor(1.0 / 127.0 * 1e6) / 1e6)
    assert(out(2L) == ((Seq(0, 0, 0), 0.0)))
  }

  test("temperatureWeights: sqrt-scaled micro-unit weights, exact for perfect squares") {
    // counts 1/4/9 -> sqrt 1/2/3 -> quantized 1e6/2e6/3e6 -> weights 1/6, 2/6, 3/6 floored to 6dp
    val rows = (1 to 1).map(i => (s"a$i", "a")) ++
      (1 to 4).map(i => (s"b$i", "b")) ++ (1 to 9).map(i => (s"c$i", "c"))
    val out = Dedup.temperatureWeights(rows.toDF("doc_id", "source"), "source")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("a") == ((1L, math.floor(1.0 / 6 * 1e6) / 1e6)))
    assert(out("b") == ((4L, math.floor(2.0 / 6 * 1e6) / 1e6)))
    assert(out("c") == ((9L, 0.5)))
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 2e-6) // floors lose < 1 micro-unit each
  }

  test("groupPercentileCut: each group gets its own interpolated bar; kept is per-group") {
    val df = Seq(
      ("en", 1.0), ("en", 2.0), ("en", 3.0), ("en", 4.0), ("en", 5.0),
      ("fr", 10.0), ("fr", 20.0)).toDF("lang", "quality")
    val out = Dedup.groupPercentileCut(df, "quality", "lang", 0.2, exact = true)
      .as[(String, Double, Double, Boolean)].collect()
    // exact percentile(1..5, .2) = 1.8; percentile((10,20), .2) = 12
    assert(out.filter(_._1 == "en").forall(_._3 == 1.8))
    assert(out.filter(_._1 == "fr").forall(_._3 == 12.0))
    assert(out.filter(_._1 == "en").map(r => r._2 -> r._4).toMap ==
      Map(1.0 -> false, 2.0 -> true, 3.0 -> true, 4.0 -> true, 5.0 -> true))
    assert(out.filter(_._1 == "fr").map(r => r._2 -> r._4).toMap ==
      Map(10.0 -> false, 20.0 -> true))
  }

  test("bloomDecontaminate: exact hits are never missed; non-members may only false-positive") {
    val corpus = docs(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"), (3L, "eta theta iota"),
      (4L, "kappa lambda mu"), (5L, "alpha beta gamma"), (6L, "nu xi omicron"))
    val bench = docs((10L, "alpha beta gamma"), (11L, "eta theta iota"))
    val out = Dedup.bloomDecontaminate(corpus, bench, "doc_id", "text",
        mBits = 1024, kHashes = 3)
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // ground truth: docs 1, 3, 5 share text with the benchmark
    assert(out.filter(_._2._2).keySet == Set(1L, 3L, 5L))
    // Bloom invariant: no false negatives (exact_hit -> bloom_hit)
    assert(out.values.forall { case (bloom, exact) => !exact || bloom })
  }

  test("mrlFunnel: full-width prefix or all-survivor coarseK reproduces brute force exactly") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.2f, 0.1f)), (2L, Array(0.9f, 0.1f, 0.0f, 0.3f)),
      (3L, Array(0.0f, 1.0f, 0.5f, 0.0f)), (4L, Array(0.1f, 0.9f, 0.2f, 0.7f)),
      (5L, Array(0.5f, 0.5f, 0.9f, 0.4f)), (6L, Array(0.3f, 0.2f, 0.1f, 1.0f)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    // dims = full width: coarse scores ARE the full scores, so top-k survives
    val full = Similarity.mrlFunnel(vecs, queries, "vec_id", "embedding",
        dims = 4, coarseK = 3, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full == exact)
    // prefix dims but every candidate survives the coarse stage
    val wide = Similarity.mrlFunnel(vecs, queries, "vec_id", "embedding",
        dims = 2, coarseK = 5, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(wide == exact)
    // narrow funnel still emits exactly k full-dim-scored rows per query
    val narrow = Similarity.mrlFunnel(vecs, queries, "vec_id", "embedding",
        dims = 2, coarseK = 3, k = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(narrow.groupBy(_._1).forall(_._2.length == 3))
    val fullCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    assert(narrow.filter(r => fullCos.contains((r._1, r._2)))
      .forall(r => r._3 == fullCos((r._1, r._2)))) // rescore = full-dim cosine
  }

  test("wordDiversity: ttr/simpson/top_share are the exact hand values") {
    // "a a a b": n=4, unique=2, ttr=0.5, simpson=1-(9+1)/16=0.375, top=3/4
    val out = TextAnalysis.wordDiversity(docs((1L, "a a a b")), "doc_id", "text")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(out == ((1L, 4L, 2L, 0.5, 0.375, 0.75)))
  }

  test("incrementalDedup: delta near-dups of base are flagged, fresh docs kept") {
    val base = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
    val delta = docs(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (11L, "nothing like anything else at all ever seen"))   // fresh
    val out = Dedup.incrementalDedup(base, delta, "doc_id", "text", tau = 0.5)
      .select(col("doc_id"), col("dup_of"), col("keep"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2))).toMap
    assert(out(10L) == ((Some(1L), false)))
    assert(out(11L) == ((None, true)))
    assert(out.size == 2) // one verdict row per delta doc, base never emitted
  }

  test("coverageBuckets: per-language terciles order docs head/middle/tail by LM coverage") {
    val ref = docs((100L, "w x y z"))                  // LM grams: "w x", "x y", "y z"
    val corpus = Seq(
      (1L, "w x y z", "en"),  // 3/3 known -> head
      (2L, "w x q r", "en"),  // 1/3       -> tail
      (3L, "w x y q", "en"),  // 2/3       -> middle
      (4L, "q r s t", "fr"),  // 0/3       -> tail
      (5L, "w x r s", "fr"),  // 1/3       -> middle
      (6L, "w x y r", "fr"))  // 2/3       -> head
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.coverageBuckets(
        corpus, TextAnalysis.ngramLm(ref, "text"), "doc_id", "text", "lang")
      .select(col("doc_id"), col("bucket")).as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "head", 2L -> "tail", 3L -> "middle",
      4L -> "tail", 5L -> "middle", 6L -> "head"))
  }

  test("bm25TopK: rare query term dominates; absent-term docs score zero and drop") {
    // 'dup' appears in one doc, 'the' in three: idf('dup') >> idf('the').
    val corpus = docs(
      (1L, "dup alpha beta gamma"),         // rare hit -> far ahead
      (2L, "the the the alpha beta gamma"), // common hits only
      (3L, "the alpha beta gamma"),
      (4L, "the alpha"),                    // shorter doc: length norm boosts vs 3
      (5L, "alpha beta gamma delta"))       // no query term -> no output row
    val out = TextAnalysis.bm25TopK(corpus, "doc_id", "text",
        query = Seq("dup", "the"), k = 10)
      .select("doc_id", "score_micro", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(out.map(_._1).head == 1L, "rare-term doc must rank first")
    assert(!out.map(_._1).contains(5L), "doc with no query term must not appear")
    // doc 4 beats doc 3: same single 'the' hit, shorter dl -> larger tf norm.
    val pos = out.map(_._1).zipWithIndex.toMap
    assert(pos(4L) < pos(3L), s"length normalization ordering violated: $out")
    // integer micro scores: exact, monotone with rank
    assert(out.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("sparseCosineTopK: identical docs are mutual top-1 at cos 1; disjoint docs never pair") {
    val corpus = docs(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta"),  // shares nothing with 1/2
      (4L, "alpha delta other"))   // bridges both clusters
    val out = TextAnalysis.sparseCosineTopK(corpus, "doc_id", "text", r = 5, k = 3)
      .select("doc_a", "doc_b", "cos_micro", "rank")
      .as[(Long, Long, Long, Int)].collect()
    val top = out.filter(_._4 == 1).map(r => r._1 -> r._2).toMap
    assert(top(1L) == 2L && top(2L) == 1L)
    val pairs = out.map(r => (r._1, r._2)).toSet
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((3L, 1L)),
      "term-disjoint docs must never meet in the inverted-index join")
    val cos12 = out.find(r => r._1 == 1L && r._2 == 2L).get._3
    assert(cos12 == 1000000L, s"identical pruned vectors must hit cos exactly 1, got $cos12")
  }

  test("spread16/zValue match a bit-by-bit reference interleave") {
    def refSpread(x: Long): Long =
      (0 until 16).map(i => ((x >> i) & 1L) << (2 * i)).sum
    val vals = Seq(0L, 1L, 2L, 3L, 50L, 255L, 999L, 1000L, 65535L)
    val in = vals.toDF("x")
    val got = in.select(Layout.spread16(col("x")).as("s")).as[Long].collect()
    assert(got.toSeq == vals.map(refSpread))
    val zs = vals.flatMap(a => vals.map(b => (a, b))).toDF("a", "b")
    val gotZ = zs.select(Layout.zValue(col("a"), col("b")).as("z")).as[Long].collect()
    val expZ = vals.flatMap(a => vals.map(b => refSpread(a) | (refSpread(b) << 1)))
    assert(gotZ.toSeq == expZ)
  }

  test("zOrderCells: cells partition the rows and bound both dimensions' ranges") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(64).toLong, rnd.nextInt(64).toLong)).toDF("a", "b")
    val cells = Layout.zOrderCells(rows, col("a"), col("b"), cellBits = 6)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(cells.map(_._2).sum == 500L, "cells must partition all rows")
    // dropping 6 z-bits = a 8x8 rectangle of (a,b) space per cell: both
    // per-cell ranges must fit inside one such rectangle.
    cells.foreach { case (cell, _, minA, maxA, minB, maxB) =>
      assert(maxA - minA < 8 && maxB - minB < 8,
        s"cell $cell spans a=[$minA,$maxA] b=[$minB,$maxB] — locality broken")
    }
  }

  test("knnClassify: clean clusters score perfectly; a planted outlier flips to the majority") {
    // Two tight clusters in 2-D: label 0 near (1, 0), label 1 near (0, 1).
    // Vector 99 is LABELED 0 but sits in cluster 1 -> its 2 nearest
    // neighbors vote label 1 and it is counted incorrect for label 0.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0), (3L, Array(1.0f, 0.1f), 0),
      (11L, Array(0.0f, 1.0f), 1), (12L, Array(0.1f, 0.9f), 1), (13L, Array(0.1f, 1.0f), 1),
      (99L, Array(0.05f, 0.95f), 0))
      .toDF("vec_id", "embedding", "label")
    val evalSet = vecs.filter(col("vec_id").isin(1L, 11L, 99L))
    val out = Similarity.knnClassify(vecs, evalSet, "vec_id", "embedding", "label", k = 2)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // label 0 evals {1, 99}: id 1 sits in its own cluster (correct); the
    // planted 99 votes (11, 13) -> label 1 (incorrect).
    assert(out(0) == (2L, 1L), s"label 0: eval=2, only id 1 correct — got ${out(0)}")
    // label 1 evals {11}: 99 IS 11's nearest neighbor, so the vote ties
    // {0: 1, 1: 1} and the deterministic tiebreak (smaller label) picks 0
    // — the mislabeled point fails itself AND poisons its closest true
    // neighbor, which is exactly what this eval exists to surface.
    assert(out(1) == (1L, 0L), s"label 1: id 11 poisoned by the planted 99 — got ${out(1)}")
  }

  test("bpeLearn: classic hug/pug corpus learns u+g, then h+ug, then u+n") {
    // vocab: hug x4, pug, pun, bun. Round 1 pair counts: 'u g' 5 (hug+pug),
    // 'h u' 4, 'p u' 2, 'u n' 2, 'b u' 1 -> merge (u, g). Round 2: 'h ug' 4
    // wins. Round 3: 'u n' 2 wins (tiebreak never needed).
    val corpus = docs((1L, "hug hug hug pug pun bun hug"))
    val out = TextAnalysis.bpeLearn(corpus, "text", rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1, "u", "g", 5L), (2, "h", "ug", 4L), (3, "u", "n", 2L)),
      s"unexpected merge sequence: $out")
  }

  test("collocations: exact integer lift, count filter, deterministic order") {
    // doc 1 tokens [a b a b a b]: bigrams 'a b' x3, 'b a' x2; doc 2 'c d' x1.
    // N = 8 tokens; lift('c d') = 1e6*1*8/(1*1) = 8e6; 'a b' = 24e6/9 =
    // 2666666 (floor); 'b a' = 16e6/9 = 1777777 (floor).
    val out = TextAnalysis.collocations(
      docs((1L, "a b a b a b"), (2L, "c d")), "text", minCount = 1, k = 10)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("c d", 1L, 1L, 1L, 8000000L),
      ("a b", 3L, 3L, 3L, 2666666L),
      ("b a", 2L, 3L, 3L, 1777777L)), s"got $out")
  }

  test("collocations: minCount filters and k truncates after the full sort") {
    val corpus = docs((1L, "x y x y x y x y x y z w"))
    // 'x y' count 5 passes minCount 5; 'y x' count 4 and the rest fail.
    val out = TextAnalysis.collocations(corpus, "text", minCount = 5, k = 10)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq("x y"))
  }

  test("readability: hand-computed Flesch micro score, empty docs dropped") {
    // 'Hello world. This is fine.': 5 words, 2 sentences, syllables by
    // vowel-group runs: hello 2, world. 1, this 1, is 1, fine. 2 -> 7.
    // 206835000 - floor(1015000*5/2) - floor(84600000*7/5)
    //   = 206835000 - 2537500 - 118440000 = 85857500.
    val out = TextAnalysis.readability(
      docs((1L, "Hello world. This is fine."), (2L, "   ")), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == ((5L, 2L, 7L, 85857500L)), s"got ${out(1L)}")
  }

  test("cdcChunkDedup: exact dups fully duplicated, unique doc clean, shift-proof") {
    val shared = (1 to 40).map(i => s"tok$i").mkString(" ")
    val corpus = docs(
      (1L, shared), (2L, shared),                       // exact dup pair
      (3L, "solo unique words nothing shared here at all"), // clean
      (4L, "prefix junk " + shared))                    // shifted copy
    val out = Dedup.cdcChunkDedup(corpus, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // identical docs produce identical chunk sets -> every chunk dups
    assert(out(1L)._1 == out(2L)._1)
    assert(out(1L)._2 == out(1L)._1 && out(1L)._3 == 1000000L)
    assert(out(3L)._2 == 0L && out(3L)._3 == 0L)
    // content-defined boundaries realign after the first cut inside the
    // shared run: all but at most one of doc 1's chunks recur in doc 4
    assert(out(1L)._2 >= out(1L)._1 - 1)
    assert(out(4L)._2 >= out(1L)._1 - 1)
  }

  test("cosineHistogram: orthogonal/identical/opposite pairs land in exact bins") {
    // mod = 1: all 4 vectors sampled -> 6 pairs. e1=(1,0) twice, e2=(0,1),
    // -e1: cos(e1,e1)=1 -> bin clamps to 19; cos(e1,e2)=0 -> bin 10 (x2);
    // cos(e1,-e1)=-1 -> bin 0 (x2); cos(e2,-e1)=0 -> bin 10.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineHistogram(vecs, "vec_id", "embedding", mod = 1)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(19L -> 1L, 10L -> 3L, 0L -> 2L), s"got $out")
  }

  test("powerIteration: exact milli iterates on hand-computed 2x2 grams") {
    // G = [[4,0],[0,1]]: v stays (1000, x) with x: 1000 -> 250 -> 62 -> 15.
    val gDiag = Seq((0, 0, 4L), (0, 1, 0L), (1, 1, 1L)).toDF("i", "j", "dot")
    val out1 = Similarity.powerIteration(gDiag, iters = 3)
      .as[(Int, Long)].collect().toMap
    assert(out1 == Map(0 -> 1000L, 1 -> 15L), s"got $out1")
    // G = [[2,1],[1,3]]: (1000,1000) -> (750,1000) -> (666,1000) -> (636,1000).
    val gFull = Seq((0, 0, 2L), (0, 1, 1L), (1, 1, 3L)).toDF("i", "j", "dot")
    val out2 = Similarity.powerIteration(gFull, iters = 3)
      .as[(Int, Long)].collect().toMap
    assert(out2 == Map(0 -> 636L, 1 -> 1000L), s"got $out2")
  }

  test("prefixFilterJoin equals brute-force all-pairs at three thresholds") {
    // Word-salad base corpus + planted one-word-edit near-dups, so the
    // result set is non-trivial at every threshold tested.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val base = (0 until 30).map(i =>
      (i.toLong, Seq.fill(12 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val near = (0 until 8).map { j =>
      val ws = base(j)._2.split(" ").toBuffer
      ws(rnd.nextInt(ws.size)) = vocab(rnd.nextInt(vocab.size))
      (100L + j, ws.mkString(" "))
    }
    val all = base ++ near
    def shingleSet(t: String): Set[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty)
      (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val sets = all.map { case (id, t) => id -> shingleSet(t) }.toMap
    val corpus = docs(all: _*)
    for ((num, den) <- Seq((5, 10), (8, 10), (9, 10))) {
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        ia = (sets(a) & sets(b)).size.toLong
        ua = (sets(a) | sets(b)).size.toLong
        if ia * den >= ua * num
      } yield (a, b, ia, ua, ia * 1000000L / ua)).toSet
      val got = Dedup.prefixFilterJoin(corpus, "doc_id", "text", num, den)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expected,
        s"theta=$num/$den: missing=${expected -- got} extra=${got -- expected}")
      assert(expected.nonEmpty, s"theta=$num/$den tested nothing")
    }
  }

  test("nnDescentTopK with blocks=1 reproduces exact brute-force top-k") {
    // One block: the seed IS the exact k-NN graph, and a refinement round
    // ranks over a candidate superset that contains it — so the output
    // must equal brute force exactly (same rounding, same tie-break).
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 24).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val nnd = Similarity.nnDescentTopK(vecs, "vec_id", "embedding",
        k = 4, blocks = 1, rounds = 1)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(nnd == exact)
  }

  test("nnDescent refinement round improves block-seed recall") {
    // Clustered corpus — the case the algorithm exists for: a node's true
    // neighbors are its cluster mates, and a mate-of-a-mate is a mate, so
    // each round chains further into the cluster from whatever mates the
    // hash-block seed happened to co-locate. (On structureless uniform
    // vectors the k-NN graph is noise and no amount of rounds helps —
    // verified while writing this spec.) Cluster size > k so the exact
    // top-k is always in-cluster; blocks sized so each seed block holds a
    // few mates per node for the chain to start from.
    val rnd = new scala.util.Random(11)
    val centers = Vector.fill(4)(Seq.fill(6)(rnd.nextFloat() * 2f - 1f))
    val vecs = (0 until 40).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    def recall(rounds: Int): Double = {
      val got = Similarity.nnDescentTopK(vecs, "vec_id", "embedding",
          k = 5, blocks = 4, rounds = rounds)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (got & exact).size.toDouble / exact.size
    }
    val (seed, refined) = (recall(0), recall(2))
    assert(refined > seed, s"seed=$seed refined=$refined")
    assert(refined >= 0.8, s"refined recall too low: $refined (seed=$seed)")
  }

  test("nnDescent single-seeding seed graph is block-diagonal (the trap seedings=2 exists for)") {
    // One blocking: every seed edge stays inside its md5 block, so the
    // 2-hop expansion can't leave the block and refinement is a no-op.
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 32).map(i =>
      (i.toLong, Seq.fill(6)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    def sets(rounds: Int) = Similarity.nnDescentTopK(vecs, "vec_id", "embedding",
        k = 3, blocks = 8, rounds = rounds, seedings = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(sets(1) == sets(0), "single-seeding refinement should be confined to blocks")
  }

  test("stratifiedSplit: exact per-stratum proportions, partition-invariant") {
    // stratum a: 10 rows → 8/1/1 exactly; stratum b: 3 rows → ⌊2.4⌋=2
    // train, ⌊2.7⌋−2=0 val (floor boundary!), 1 test.
    val rows = ((1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 13).map(i => (i.toLong, "b"))).toDF("doc_id", "lang")
    val out = Dedup.stratifiedSplit(rows, "doc_id", "lang")
      .as[(Long, String, String)].collect()
    val byStratum = out.groupBy(_._2).view.mapValues(
      _.groupBy(_._3).view.mapValues(_.length).toMap).toMap
    assert(byStratum("a") == Map("train" -> 8, "val" -> 1, "test" -> 1), s"got $byStratum")
    assert(byStratum("b") == Map("train" -> 2, "test" -> 1), s"got $byStratum")
    // same assignment under a different physical partitioning
    val re = Dedup.stratifiedSplit(rows.repartition(7), "doc_id", "lang")
      .as[(Long, String, String)].collect()
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("madOutliers: lower-median convention, rational cut, zero-MAD degeneracy") {
    import graft.operators.Sketch
    // 1..9 plus a wild 1000: rank ⌈5000·10/10⁴⌉ = 5 → median 5; absdevs
    // sorted 0,1,1,2,2,3,3,4,4,995 → mad 2; cut ad·10⁴ > 44478·2 keeps
    // only the 995.
    val vals = ((1 to 9).map(_.toLong) :+ 1000L).map(Tuple1(_)).toDF("v")
    val out = Sketch.madOutliers(vals, "v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((10L, 5L, 2L, 1L, 100000L)), s"got $out")
    // >half the mass on one value → mad 0 → only v ≠ median flags
    val eq = (Seq.fill(5)(7L) :+ 9L).map(Tuple1(_)).toDF("v")
    val o2 = Sketch.madOutliers(eq, "v")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(o2 == ((6L, 7L, 0L, 1L, 166666L)), s"got $o2")
  }

  test("signWords: Horner packing, 0.0 counts as non-negative, word spill past 32 dims") {
    val v = Seq(Tuple1(Seq.fill(32)(1f) :+ -1f)).toDF("e")
    val ws = Similarity.signWords(col("e"), 33)
    val out = v.select(ws(0).as("w0"), ws(1).as("w1"))
      .as[(Long, Long)].collect().head
    assert(out == (((1L << 32) - 1L, 0L)), s"got $out")
    val z = Seq(Tuple1(Seq(0f, -1f))).toDF("e")
    val zw = z.select(Similarity.signWords(col("e"), 2).head.as("w0"))
      .as[Long].collect().head
    assert(zw == 2L, s"0.0 must set its bit (sign convention): got $zw")
  }

  test("hammingRerank: hamming gates candidates, exact cosine reranks survivors") {
    // query 1: vec 5 h=0 (cos .866), vec 2 h=1 (cos .5), vec 4 h=2
    // (cos 0), vec 3 h=4 — candidates=3 drops vec 3 BEFORE any cosine.
    val df = Seq(
      (1L, Seq(1f, 1f, 1f, 1f)),
      (2L, Seq(1f, 1f, 1f, -1f)),
      (3L, Seq(-1f, -1f, -1f, -1f)),
      (4L, Seq(1f, 1f, -1f, -1f)),
      (5L, Seq(1f, 0f, 1f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.hammingRerank(df, df.filter(col("vec_id") === 1),
        "vec_id", "embedding", dim = 4, candidates = 3, k = 3)
      .select("neighbor_id", "hamming", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(out.toSeq == Seq((5L, 0L, 1), (2L, 1L, 2), (4L, 2L, 3)), s"got ${out.toSeq}")
  }
}
