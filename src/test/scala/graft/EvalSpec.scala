package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Eval, TextAnalysis}

/** Hand-computed fixtures for the evaluation statistics (ROC-AUC, Cohen's
  * κ) and the two graph-on-text text operators (χ² terms, TextRank). */
class EvalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("property: rocAuc equals the naive pairwise count on 10 seeded sets") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextBoolean()))
      val got = Eval.rocAuc(rows.toDF("score", "label"), "score", "label")
        .as[(Long, Long, Long, Long)].collect().head
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      // 2U = 2·#(pos>neg) + #ties over all cross pairs
      val u2 = pos.map(p => neg.map(n =>
        if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
      val want =
        if (pos.isEmpty || neg.isEmpty) 0L
        else u2 * 1000000L / (2L * pos.size * neg.size)
      assert(got._4 == want, s"seed=$seed got=$got want=$want")
    }
  }

  test("property: ewmaMilli equals the naive per-key fold on 10 seeded series") {
    import java.sql.Timestamp
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(100 + seed)
      val pts = for (k <- Seq("a", "b"); i <- 0 until 20) yield
        (k, Timestamp.valueOf(f"2026-01-01 ${i % 24}%02d:${i / 24}%02d:00"),
          rnd.nextInt(50).toLong)
      val got = graft.streaming.EventPipeline
        .ewmaMilli(pts.toDF("key", "ws", "cnt"), "key", "ws", "cnt")
        .as[(String, Timestamp, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._4).toMap
      for ((k, series) <- pts.groupBy(_._1)) {
        var s = 0L
        for (((_, ts, v), i) <- series.sortBy(_._2.getTime).zipWithIndex) {
          s = if (i == 0) v * 1000L
              else if (v * 1000L >= s) s + (v * 1000L - s) / 4
              else s - (s - v * 1000L) / 4
          assert(got((k, ts)) == s, s"seed=$seed key=$k ts=$ts")
        }
      }
    }
  }

  test("property: holtMilli equals the naive two-state fold on 10 seeded series") {
    import java.sql.Timestamp
    def sdiv(x: Long, d: Long) = if (x >= 0) x / d else -((-x) / d)
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(400 + seed)
      val pts = for (k <- Seq("a", "b"); i <- 0 until 20) yield
        (k, Timestamp.valueOf(f"2026-01-01 ${i % 24}%02d:${i / 24}%02d:00"),
          rnd.nextInt(50).toLong - 10L) // negatives exercise the sign-split div
      val got = graft.streaming.EventPipeline
        .holtMilli(pts.toDF("key", "ws", "cnt"), "key", "ws", "cnt")
        .as[(String, Timestamp, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
      for ((k, series) <- pts.groupBy(_._1)) {
        var l = 0L; var b = 0L
        for (((_, ts, v), i) <- series.sortBy(_._2.getTime).zipWithIndex) {
          if (i == 0) { l = v * 1000L; b = 0L }
          else {
            val dl = sdiv(v * 1000L - l - b, 4)
            l = l + b + dl
            b = b + sdiv(dl, 8)
          }
          assert(got((k, ts)) == ((l, b, l + b)), s"seed=$seed key=$k ts=$ts i=$i")
        }
      }
    }
  }

  test("property: cusumMilli equals the naive fold; an injected level shift alarms") {
    import java.sql.Timestamp
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(500 + seed)
      // stationary ~10 for 30 buckets, then a +15 level shift — the kind
      // sw10's per-bucket z-score underweights but CUSUM accumulates
      val pts = for (i <- 0 until 60) yield
        ("k", Timestamp.valueOf(f"2026-01-01 10:$i%02d:00"),
          (if (i < 30) 8 + rnd.nextInt(5) else 33 + rnd.nextInt(5)).toLong)
      val ref = pts.map(_._3).sum * 1000L / pts.size
      val got = graft.streaming.EventPipeline.cusumMilli(
          pts.map { case (k, ts, v) => (k, ts, v, ref) }
            .toDF("key", "ws", "cnt", "ref"),
          "key", "ws", "cnt", "ref")
        .as[(String, Timestamp, Long, Long, Boolean)].collect()
        .sortBy(_._2.getTime)
      var s = 0L
      for (((_, ts, v), g) <- pts.zip(got)) {
        s = math.max(0L, s + v * 1000L - ref - ref / 4)
        assert(g._4 == s && g._5 == (s > 5 * ref), s"seed=$seed ts=$ts got=$g")
      }
      assert(got.exists(_._5), s"seed=$seed: the level shift must raise an alarm")
      assert(!got.take(25).exists(_._5), s"seed=$seed: no alarm before the shift")
    }
  }

  test("property: zipfSlope equals the naive regression on 10 seeded corpora") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(200 + seed)
      val words = Seq.fill(300)(s"w${rnd.nextInt(20)}")
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = TextAnalysis.zipfSlope(docs, "text", r = 8)
        .as[(Long, Long, Long, Long)].collect().head
      val top = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
        .toSeq.sortBy { case (w, f) => (-f, w) }.take(8)
      val xy = top.zipWithIndex.map { case ((_, f), i) =>
        (math.floor(math.log(i + 1d) * 1000).toLong,
          math.floor(math.log(f.toDouble) * 1000).toLong)
      }
      val n = xy.size.toLong
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val sxy = xy.map { case (x, y) => x * y }.sum
      val sxx = xy.map { case (x, _) => x * x }.sum
      val (num, den) = (n * sxy - sx * sy, n * sxx - sx * sx)
      val want = if (den == 0) 0L
        else if (num >= 0) num * 1000L / den else -((-num) * 1000L / den)
      assert(got == ((n, num, den, want)), s"seed=$seed got=$got")
    }
  }

  test("rocAuc: perfect, inverted, and midrank-tied orderings") {
    // perfect separation: positives all above negatives -> AUC 1
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("score", "label")
    val p = Eval.rocAuc(perfect, "score", "label")
      .as[(Long, Long, Long, Long)].collect().head
    assert(p == ((2L, 2L, 14L, 1000000L)), s"got $p")
    // inverted -> AUC 0
    val inverted = Seq((4L, false), (3L, false), (2L, true), (1L, true))
      .toDF("score", "label")
    assert(Eval.rocAuc(inverted, "score", "label")
      .select("auc_micro").as[Long].collect().head == 0L)
    // all four tied at one score: midrank avg = 2.5 each ->
    // rank2_sum = 2*(2.5+2.5) = 10, U = (10-6)/2 = 2, AUC = 2/4 = 1/2
    val tied = Seq((7L, true), (7L, true), (7L, false), (7L, false))
      .toDF("score", "label")
    val t = Eval.rocAuc(tied, "score", "label")
      .as[(Long, Long, Long, Long)].collect().head
    assert(t == ((2L, 2L, 10L, 500000L)), s"got $t")
    // single-class input: AUC undefined -> 0
    val mono = Seq((1L, true), (2L, true)).toDF("score", "label")
    assert(Eval.rocAuc(mono, "score", "label")
      .select("auc_micro").as[Long].collect().head == 0L)
  }

  test("cohenKappa: textbook 2x2, worse-than-chance negative, degenerate") {
    // classic example: n=100, agree=70, marginals rows (50,50) cols (60,40)
    // chance = 50*60 + 50*40 = 5000; kappa = (7000-5000)/(10000-5000) = 0.4
    val cells = Seq(("y", "y", 40L), ("y", "n", 10L), ("n", "y", 20L), ("n", "n", 30L))
      .toDF("a", "b", "n")
    val k = Eval.cohenKappa(cells, "a", "b", "n")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(k == ((100L, 70L, 5000L, 2000L, 5000L, 400000L)), s"got $k")
    // total disagreement with symmetric marginals: kappa = -1
    val anti = Seq(("y", "n", 5L), ("n", "y", 5L)).toDF("a", "b", "n")
    val ka = Eval.cohenKappa(anti, "a", "b", "n")
      .select("kappa_micro").as[Long].collect().head
    assert(ka == -1000000L, s"got $ka")
    // single class both sides: den = 0 -> 0 sentinel
    val mono = Seq(("y", "y", 9L)).toDF("a", "b", "n")
    assert(Eval.cohenKappa(mono, "a", "b", "n")
      .select("kappa_micro").as[Long].collect().head == 0L)
  }

  test("mrr: first relevant rank per query; no-relevant queries score 0") {
    val ranked = Seq(("q1", 10L, 1), ("q1", 11L, 2), ("q1", 12L, 3),
      ("q2", 10L, 1), ("q2", 13L, 2)).toDF("query", "doc", "rank")
    val rel = Seq(("q1", 11L), ("q1", 12L), ("q2", 99L)).toDF("query", "doc")
    val out = Eval.mrr(ranked, rel, "query", "doc", "rank")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("q1") == ((2L, 500000L)), s"got $out") // doc 11 at rank 2
    assert(out("q2") == ((0L, 0L))) // relevant doc never retrieved
    assert(out.size == 2)
  }

  test("precisionRecallAtK: overlap ratios exact; zero-relevant query = 0") {
    val ranked = Seq(("q1", 10L), ("q1", 11L), ("q2", 10L), ("q2", 13L))
      .toDF("query", "doc")
    val rel = Seq(("q1", 11L), ("q1", 12L), ("q1", 14L)).toDF("query", "doc")
    val out = Eval.precisionRecallAtK(ranked, rel, "query", "doc", k = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // q1: 1 of its 3 relevant docs in the top-2 -> p 1/2, r 1/3
    assert(out("q1") == ((3L, 1L, 500000L, 333333L)), s"got $out")
    // q2: nothing relevant anywhere -> all zero
    assert(out("q2") == ((0L, 0L, 0L, 0L)))
  }

  test("chi2Terms: perfectly class-separating term dominates") {
    // 4 docs, 2 classes; "alpha" only in class x docs, "common" in all
    // but one of each class (no dependence): chi2(alpha,x) with
    // a=2 b=0 c=0 d=2, df=2, n_cls=2, N=4: 4*(4-0)^2/(2*2*2*2) = 4 -> 4e6
    val docs = Seq(
      (1L, "alpha common", "x"), (2L, "alpha zed", "x"),
      (3L, "beta common", "y"), (4L, "beta zed", "y"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.chi2Terms(docs, "doc_id", "text", "lang",
      minDf = 1, k = 10)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out(("x", "alpha")) == ((2L, 0L, 0L, 2L, 4000000L)), s"got $out")
    assert(out(("y", "beta")) == ((2L, 0L, 0L, 2L, 4000000L)))
    // balanced term: a=1 b=1 c=1 d=1 -> (1-1)^2 = 0
    assert(out(("x", "common"))._5 == 0L)
    assert(out(("x", "zed"))._5 == 0L)
  }

  test("bigramLogProb: hand-computed add-one floors; short docs keep a row") {
    // corpus: "a b a b" + "a". c2: (a,b)=2, (b,a)=1; c1: a=3, b=2; V=2.
    // (a,b): floor(1e6·ln(3/5)) = -510826 (×2); (b,a): floor(1e6·ln(2/4))
    // = -693148. doc 1 sum = -1714800 over 3 bigrams; doc 2 has none.
    val docs = Seq((1L, "a b a b"), (2L, "a")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3L, -1714800L)), s"got $out")
    assert(out(2L) == ((0L, 0L)))
  }

  test("ewmaMilli: quarter-step fold exact, sign-explicit truncation") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    // k1: 8 -> 4 -> 10: s = 8000, 8000-4000/4 = 7000, 7000+3000/4 = 7750
    // k2: 5 -> 2: s = 5000, 5000 - trunc(3000/4) = 4250
    val pts = Seq(("k1", ts(0), 8L), ("k1", ts(1), 4L), ("k1", ts(2), 10L),
      ("k2", ts(0), 5L), ("k2", ts(1), 2L)).toDF("key", "ws", "cnt")
    val out = graft.streaming.EventPipeline.ewmaMilli(pts, "key", "ws", "cnt")
      .as[(String, Timestamp, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out(("k1", ts(0))) == 8000L)
    assert(out(("k1", ts(1))) == 7000L)
    assert(out(("k1", ts(2))) == 7750L)
    assert(out(("k2", ts(1))) == 4250L, s"got $out")
  }

  test("zipfSlope: a perfect 1/r corpus fits slope_milli = -1000 exactly") {
    // freqs 1000/500/333/250 (∝ 1/rank): x = ⌊1000·ln r⌋ = 0,693,1098,1386
    // y = ⌊1000·ln f⌋ = 6907,6214,5808,5521 → num = -4335282,
    // den = 4334067, slope = -⌊4335282000/4334067⌋ = -1000.
    val text = Seq.fill(1000)("a") ++ Seq.fill(500)("b") ++
      Seq.fill(333)("c") ++ Seq.fill(250)("d")
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.zipfSlope(docs, "text", r = 1000)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out == ((4L, -4335282L, 4334067L, -1000L)), s"got $out")
  }

  test("textrankKeywords: hub word outranks leaves; rank arithmetic exact") {
    // "hub a", "hub b", "hub c" twice each: hub co-occurs with a,b,c;
    // a,b,c each only with hub -> hub outdeg 3, leaves outdeg 1.
    val docs = Seq.fill(2)(Seq("hub alpha", "hub beta", "hub gamma")).flatten
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextAnalysis.textrankKeywords(docs, "text",
      iters = 3, minCount = 2, k = 10)
      .as[(String, Long)].collect()
    assert(out.head._1 == "hub")
    assert(out.map(_._1).toSet == Set("hub", "alpha", "beta", "gamma"))
    // leaves are symmetric: identical ranks, lexicographic order
    val leaves = out.filter(_._1 != "hub")
    assert(leaves.map(_._2).distinct.length == 1)
    assert(leaves.map(_._1).toSeq == Seq("alpha", "beta", "gamma"))
    // exact fixed-point replay: r0 = 1e6 all; hub gets 3 leaf
    // contributions (1e6 div 1 each), leaves get 1e6 div 3 = 333333.
    // r1(hub) = 150000 + 17*3000000 div 20 = 2700000
    // r1(leaf) = 150000 + 17*333333 div 20 = 433333
    val m = out.toMap
    // r2(hub) = 150000 + 17*(3*433333) div 20 = 1254999
    // r2(leaf) = 150000 + 17*(2700000 div 3) div 20 = 915000
    // r3(hub) = 150000 + 17*(3*915000) div 20 = 2483250
    // r3(leaf) = 150000 + 17*(1254999 div 3) div 20 = 505583
    assert(m("hub") == 2483250L, s"got ${m("hub")}")
    assert(m("alpha") == 505583L, s"got ${m("alpha")}")
  }

  test("property: liftDeciles equals a naive equal-frequency split on 10 seeded sets") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(300 + seed)
      // 97 rows: n % 10 != 0 exercises ntile's ceil-then-floor split
      val rows = (1 to 97).map(i =>
        (i.toLong, rnd.nextInt(10).toLong, rnd.nextBoolean()))
      val got = Eval.liftDeciles(rows.toDF("id", "score", "label"),
          "score", "label", "id")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      val sorted = rows.sortBy(r => (-r._2, r._1))
      val n = rows.size.toLong
      val p = rows.count(_._3).toLong
      var idx = 0
      var cum = 0L
      for (b <- 1 to 10) {
        val sz = (n / 10 + (if (b <= n % 10) 1 else 0)).toInt
        val np = sorted.slice(idx, idx + sz).count(_._3).toLong
        idx += sz; cum += np
        val g = got(b - 1)
        assert(g._1 == b && g._2 == sz && g._3 == np, s"seed=$seed b=$b got=$g")
        assert(g._4 == (if (p > 0) np * n * 1000000L / (sz * p) else 0L),
          s"seed=$seed b=$b lift got=$g")
        assert(g._5 == (if (p > 0) cum * 1000000L / p else 0L),
          s"seed=$seed b=$b gain got=$g")
      }
    }
  }

  test("f1PerClass: hand confusion matrix, truth-margin classes, integrals exact") {
    // truth a: 8 right + 2 as b; truth b: 5 right + 1 as a; truth c: 4 as
    // a, never right AND never predicted — stays on the board via its
    // truth margin with tp=fp=0.
    val cells = Seq(("a", "a", 8L), ("a", "b", 2L), ("b", "b", 5L),
      ("b", "a", 1L), ("c", "a", 4L)).toDF("truth", "pred", "n")
    val out = Eval.f1PerClass(cells, "truth", "pred", "n")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(out == Seq(
      // a: tp=8 fp=1+4 fn=2 → 8e6/13, 8e6/10, 16e6/23
      ("a", 8L, 5L, 2L, 615384L, 800000L, 695652L),
      // b: tp=5 fp=2 fn=1 → 5e6/7, 5e6/6, 10e6/13
      ("b", 5L, 2L, 1L, 714285L, 833333L, 769230L),
      ("c", 0L, 0L, 4L, 0L, 0L, 0L)), s"got $out")
  }
}
