package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.GraphXBridge

/** Graph-analytic operators beyond reachability: triangle counting and the
  * deterministic fixed-point PageRank twin. */
class AnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("triangleCount: K4 gives every vertex C(3,2)=3 triangles; pendant edge none") {
    // complete graph on {1,2,3,4} (as directed pairs; direction is ignored)
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = (k4 :+ ((4L, 5L))).toDF("src", "dst")
    val out = GraphXBridge.triangleCount(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(out(_) == 3L))
    assert(out(5L) == 0L)
  }

  test("triangleCount ignores duplicate, reversed, and self edges") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
      .toDF("src", "dst")
    val out = GraphXBridge.triangleCount(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("pageRankFixed matches the hand-computed integer recurrence on a chain") {
    // a -> b -> c, 3 iterations, rank in micro-units
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = GraphXBridge.pageRankFixed(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // i1: a=150000, b=150000+850000, c=150000+850000
    // i2: b=150000+(17*150000)div20=277500, c=150000+850000
    // i3: c=150000+(17*277500)div20=385875
    assert(out == Map(1L -> 150000L, 2L -> 277500L, 3L -> 385875L))
  }

  test("pageRankFixed is deterministic across partitionings") {
    val edges = (1L to 40L).map(i => (i, i % 7 + 100L)).toDF("src", "dst")
    val a = GraphXBridge.pageRankFixed(edges.repartition(1), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = GraphXBridge.pageRankFixed(edges.repartition(13), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("pageRankPersonalized: reset mass lands only on seeds; hand-check on a chain") {
    // 1 -> 2 -> 3, seed {1}: rank decays with distance from the seed.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val out = GraphXBridge.pageRankPersonalized(edges, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // p0: (1e6, 0, 0)
    // i1: 1=150000, 2=0+(17*1000000)div20=850000, 3=0
    // i2: 1=150000, 2=(17*150000)div20=127500, 3=(17*850000)div20=722500
    // i3: 1=150000, 2=127500, 3=(17*127500)div20=108375
    assert(out == Map(1L -> 150000L, 2L -> 127500L, 3L -> 108375L))
    // seed-proximity: non-seed vertices rank strictly below the seed here
    assert(out(1L) > out(2L) && out(2L) > out(3L))
  }

  test("pageRankPersonalized is deterministic across partitionings") {
    val edges = (1L to 40L).map(i => (i, i % 7 + 100L)).toDF("src", "dst")
    val seeds = Seq(100L, 101L).toDF("id")
    val a = GraphXBridge.pageRankPersonalized(edges.repartition(1), seeds, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = GraphXBridge.pageRankPersonalized(edges.repartition(13), seeds, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("kmvDistinct: exact below k, within 25% above k, partitioning-invariant") {
    val d = (1L to 5000L).map(i => (s"g${i % 3}", i)).toDF("grp", "key")
    val est = operators.Sketch.kmvDistinct(d, "grp", "key", k = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // each group holds ~1667 distinct keys; KMV with k=256 has ~6% stderr,
    // so 25% is a 4-sigma bound (and the data is fixed, so this is stable)
    est.values.foreach(v => assert(math.abs(v - 1667.0) / 1667.0 < 0.25, s"est $v"))
    val small = operators.Sketch.kmvDistinct(
      (1L to 10L).map(i => ("g", i)).toDF("grp", "key"), "grp", "key", k = 64)
      .collect().head.getLong(1)
    assert(small == 10L) // below the sketch budget -> exact
    val re = operators.Sketch.kmvDistinct(d.repartition(17), "grp", "key", k = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(re == est)
  }

  test("kmvDistinctAgg (bounded-state Aggregator) equals the declarative form") {
    val d = (1L to 3000L).map(i => (s"g${i % 4}", i % 900)).toDF("grp", "key")
    val win = operators.Sketch.kmvDistinct(d, "grp", "key", k = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val agg = operators.Sketch.kmvDistinctAgg(d.repartition(11), "grp", "key", k = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == win)
    val small = operators.Sketch.kmvDistinctAgg(
      (1L to 7L).map(i => ("g", i)).toDF("grp", "key"), "grp", "key", k = 32)
      .collect().head.getLong(1)
    assert(small == 7L)
  }

  test("kmvSetOps: estimates track exacts, small sets are exact, partition-invariant") {
    val a = (1L to 5000L).map(i => Tuple1(i)).toDF("key")
    val b = (3001L to 9000L).map(i => Tuple1(i)).toDF("key")
    val row = operators.Sketch.kmvSetOps(a, b, "key", k = 256).collect().head
    val (estA, estB, estU, estI) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val (exA, exB, exU, exI) = (row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7))
    assert((exA, exB, exU, exI) == ((5000L, 6000L, 9000L, 2000L)))
    // k=256 → ~6% stderr per estimate; 25% ≈ 4σ, intersection gets 40%
    assert(math.abs(estA - exA).toDouble / exA < 0.25, s"est_a=$estA")
    assert(math.abs(estB - exB).toDouble / exB < 0.25, s"est_b=$estB")
    assert(math.abs(estU - exU).toDouble / exU < 0.25, s"est_union=$estU")
    assert(math.abs(estI - exI).toDouble / exI < 0.40, s"est_inter=$estI")
    // below the sketch budget everything is exact
    val small = operators.Sketch.kmvSetOps(
      (1L to 50L).map(Tuple1(_)).toDF("key"), (31L to 80L).map(Tuple1(_)).toDF("key"),
      "key", k = 256).collect().head
    assert((small.getLong(0), small.getLong(1), small.getLong(2), small.getLong(3)) ==
      ((50L, 50L, 80L, 20L)))
    val re = operators.Sketch.kmvSetOps(a.repartition(13), b.repartition(7), "key", k = 256)
      .collect().head
    assert(re.toSeq == row.toSeq)
  }

  test("exactQuantiles: equals the sorted reference on skewed/duplicated seeded data") {
    val rnd = new scala.util.Random(31337)
    // heavy duplication + heavy tails + negatives: the shapes that break
    // bucketized selection if width math is off by one anywhere
    val vals = Seq.fill(4000)(rnd.nextInt(50).toLong) ++
      Seq.fill(1000)(rnd.nextLong() % 1000000000L) ++ Seq.fill(50)(-7L) ++
      Seq(Long.MinValue / 4, Long.MaxValue / 4)
    val bps = Seq(1, 2500, 5000, 7500, 9900, 10000)
    val got = operators.Sketch.exactQuantiles(
      vals.toDF("v").repartition(13), "v", bps, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val sorted = vals.sorted
    val n = vals.length.toLong
    val want = bps.sorted.map { bp =>
      val rank = (bp.toLong * n + 9999L) / 10000L
      (bp.toLong, rank, sorted((rank - 1).toInt))
    }
    assert(got.toSeq == want)
    // single-value column resolves without descending
    val one = operators.Sketch.exactQuantiles(
      Seq.fill(9)(42L).toDF("v"), "v", Seq(5000)).collect().head
    assert((one.getLong(0), one.getLong(1), one.getLong(2)) == ((5000L, 5L, 42L)))
  }

  test("rowChecksum: order/partitioning-invariant, null-sensitive") {
    val d = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String])).toDF("k", "v")
    def sum(df: org.apache.spark.sql.DataFrame) =
      operators.Sketch.rowChecksum(df, Seq("k", "v")).collect().head.getLong(0)
    assert(sum(d) == sum(d.orderBy(col("v").desc)))
    assert(sum(d) == sum(d.repartition(7)))
    // a NULL is not the same as an absent value
    val d2 = Seq((1L, "a"), (2L, "b"), (3L, "")).toDF("k", "v")
    assert(sum(d) != sum(d2))
    // duplicated rows must not XOR-cancel: {R,R,S} != {S}
    val rrs = Seq((1L, "r"), (1L, "r"), (2L, "s")).toDF("k", "v")
    val s1 = Seq((2L, "s")).toDF("k", "v")
    assert(sum(rrs) != sum(s1))
    // separator aliasing must not collide: ("a|b","c") != ("a","b|c")
    assert(sum(Seq((0L, "a|b")).toDF("k", "v").select(col("k").cast("string").as("k"), col("v")))
      != sum(Seq(("0|a", "b")).toDF("k", "v")))
  }

  test("z1 as-of plan shape: one hash exchange, no nested-loop join") {
    val plan = SparkEntry.queries("z1_asof_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size == 1, plan.take(500))
  }

  test("z2 range-join plan shape: bands broadcast, events never shuffle for the join") {
    val plan = SparkEntry.queries("z2_range_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    // the only hash exchange is the final tiny groupBy(band_id)
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size == 1, plan.take(500))
  }

  test("countMinHeavy: heavy keys surface, estimate is one-sided (est >= exact)") {
    val keys = (Seq.fill(50)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 40).map(i => s"cold$i")).zipWithIndex.map(_.swap).toDF("i", "key")
    val out = operators.Sketch.countMinHeavy(keys, "key", threshold = 30L,
        depth = 4, width = 8) // width << vocab so collisions are in play
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.contains("hot") && out.contains("warm"))
    assert(out("hot")._2 == 50L && out("warm")._2 == 30L) // exact counts exact
    assert(out.values.forall { case (est, exact) => est >= exact }) // one-sided
    assert(out.values.forall(_._1 >= 30L)) // everything emitted met the bar
  }

  test("countMinHeavy estimate is invariant to input partitioning") {
    val keys = (Seq.fill(40)("x") ++ (1 to 25).map(i => s"y$i"))
      .zipWithIndex.map(_.swap).toDF("i", "key")
    def run(df: org.apache.spark.sql.DataFrame) =
      operators.Sketch.countMinHeavy(df, "key", threshold = 20L, depth = 3, width = 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(keys) == run(keys.repartition(13)))
  }

  test("pageRankFixed: higher in-degree earns higher rank") {
    // many sources point at 10; one source points at 20
    val edges = ((1L to 5L).map(i => (i, 10L)) :+ ((6L, 20L))).toDF("src", "dst")
    val out = GraphXBridge.pageRankFixed(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) > out(20L))
    assert(out(20L) > out(1L))
  }
}
