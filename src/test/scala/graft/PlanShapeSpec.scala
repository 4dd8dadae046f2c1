package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import graft.operators.Dedup

/** Plan-shape regression tests for the exact-substring dedup family's
  * scale claims (the StorageAndExportSpec zero-Exchange pattern): the
  * text column must never cross a shuffle in [[Dedup.substringSpans]] /
  * [[Dedup.crossSpans]] (only (id, start, hash) triples move — the
  * property that makes span-level dedup affordable at corpus scale), and
  * [[Dedup.crossSpans]]' probe side must reach the corpus join as a
  * broadcast (benchmark-sized by contract). A future edit that
  * reintroduces a text shuffle fails here, not at 100 TB. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  /** Every node of the FINAL physical plan, descending through adaptive
    * re-plans, materialized query stages, and exchange reuse. */
  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => Seq.empty
    }
    p +: (nested ++ p.children).flatMap(collectNodes)
  }

  /** Materialize (so AQE settles) and return the final plan's nodes. */
  private def finalNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    collectNodes(df.queryExecution.executedPlan)
  }

  private def shuffledColumns(nodes: Seq[SparkPlan]): Set[String] =
    nodes.collect { case s: ShuffleExchangeExec => s.output.map(_.name) }
      .flatten.toSet

  // Shared corpus: recurring 3-token spans across docs so every stage of
  // the substring family does real work.
  private def corpus = docs(
    (1L, "one two three four five six seven eight nine"),
    (2L, "one two three four five six seven eight nine"),
    (3L, "alpha beta one two three four gamma delta"),
    (4L, "p q r s t u v w"),
    (5L, "p q r s t zeta eta theta"))

  test("partitioned read-back prunes: the lang filter is a PartitionFilter, not a row filter") {
    val dir = java.nio.file.Files.createTempDirectory("plan-part").toString
    Seq((1L, "a", "en"), (2L, "b", "de"), (3L, "c", "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val df = spark.read.parquet(dir).filter($"lang" === "en")
    val scans = finalNodes(df).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec over the partitioned layout")
    assert(scans.forall(_.partitionFilters.nonEmpty),
      s"lang filter must prune partitions, got filters: ${scans.map(_.partitionFilters)}")
    assert(df.count() == 2)
  }

  test("substringSpans: shuffles move (id, start, hash) triples, never the text") {
    val nodes = finalNodes(Dedup.substringSpans(corpus, "doc_id", "text", k = 3))
    val cols = shuffledColumns(nodes)
    assert(cols.nonEmpty, "collector found no shuffles — traversal broken?")
    assert(!cols.contains("text"),
      s"text column crossed an exchange; shuffled columns: $cols")
  }

  test("crossSpans: probe side broadcasts; text never crosses an exchange") {
    val probe = docs((100L, "zz one two three zz"), (200L, "p q r s tail"))
    val df = Dedup.crossSpans(corpus, probe, "doc_id", "text", k = 3)
    val nodes = finalNodes(df)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"probe-side join is not a broadcast:\n${df.queryExecution.executedPlan}")
    val cols = shuffledColumns(nodes)
    assert(!cols.contains("text"),
      s"text column crossed an exchange; shuffled columns: $cols")
  }

  test("applyCuts: cut-list join broadcasts; clean_text is built after it") {
    val iv = Dedup.spanIntervals(
      Dedup.substringSpans(corpus, "doc_id", "text", k = 3), "doc_id", k = 3)
    val df = Dedup.applyCuts(corpus, iv, "doc_id", "text")
    val nodes = finalNodes(df)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"cut-list join is not a broadcast:\n${df.queryExecution.executedPlan}")
    val cols = shuffledColumns(nodes)
    assert(!cols.contains("clean_text"),
      s"rebuilt text crossed an exchange; shuffled columns: $cols")
    assert(!cols.contains("text"),
      s"text column crossed an exchange; shuffled columns: $cols")
  }

  test("lloydStep: no array column ever crosses a shuffle (vectors collapse first)") {
    // The scale claim behind e12: quantized vectors posexplode and
    // partially aggregate BEFORE every exchange — only (cluster, dim,
    // long) triples and scalar argmin rows move. An ArrayType attribute
    // in any ShuffleExchange means raw vectors started shuffling.
    val vecs = (1L to 40L).map(i =>
      (i, Array.tabulate(8)(d => (i % 5 + d).toFloat / 10f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val df = graft.operators.Clustering.lloydStep(vecs, "vec_id", "embedding", "label")
    val nodes = finalNodes(df)
    val arrayShuffled = nodes.collect { case s: ShuffleExchangeExec =>
      s.output.filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        .map(_.name)
    }.flatten
    assert(arrayShuffled.isEmpty,
      s"array columns crossed an exchange: $arrayShuffled")
  }

  test("ngramContainment: text never crosses an exchange (same bound as jaccard)") {
    val nodes = finalNodes(
      Dedup.ngramContainment(corpus, "doc_id", "text"))
    val cols = shuffledColumns(nodes)
    assert(!cols.contains("text"),
      s"text column crossed an exchange; shuffled columns: $cols")
  }

  test("containmentEstimate: no string-array (shingle set) ever crosses a shuffle") {
    // The operator's reason to exist: the verification join ships k
    // signature longs + a size scalar. A shingle-set (ARRAY<STRING>)
    // attribute in any exchange means the estimate silently degraded to
    // the exact verifier's shuffle volume.
    val nodes = finalNodes(Dedup.containmentEstimate(corpus, "doc_id", "text"))
    val leaked = nodes.collect { case s: ShuffleExchangeExec =>
      s.output.filter(_.dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, _) => true
        case _ => false
      }).map(_.name)
    }.flatten
    assert(leaked.isEmpty, s"shingle arrays crossed an exchange: $leaked")
  }

  test("sparseCosineTopK: text never shuffles; no norms join-back (one window exchange serves rank and norm)") {
    val df = graft.operators.TextAnalysis.sparseCosineTopK(corpus, "doc_id", "text", r = 3, k = 2)
    val nodes = finalNodes(df)
    val cols = shuffledColumns(nodes)
    assert(!cols.contains("text"),
      s"text column crossed an exchange; shuffled columns: $cols")
    // The squared norm must ride the posting rows (second window over the
    // same per-doc partitioning), not arrive via equi-joins on doc id: a
    // join keyed on doc_a/doc_b other than the pair aggregate means the
    // norms join-back crept back in, doubling the postings subtrees.
    val hashJoinKeys = nodes.collect {
      case j: BroadcastHashJoinExec => j.leftKeys.map(_.sql)
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys.map(_.sql)
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys.map(_.sql)
    }.flatten
    val docKeyJoins = hashJoinKeys.count(k => k.contains("doc_a") || k.contains("doc_b"))
    assert(docKeyJoins == 0,
      s"found a join keyed on doc ids — norms join-back returned: $hashJoinKeys")
  }

  test("bm25TopK: global top-k lowers to TakeOrderedAndProject, not a one-partition sort") {
    val df = graft.operators.TextAnalysis.bm25TopK(
      corpus, "doc_id", "text", query = Seq("one", "p"), k = 3)
    val nodes = finalNodes(df)
    assert(nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "the rank<=k window did not lower to TakeOrderedAndProject — " +
        s"every matching doc would funnel through one sort partition:\n${df.queryExecution.executedPlan}")
    assert(!shuffledColumns(nodes).contains("text"),
      "text column crossed an exchange")
  }

  test("zOrderCells: exactly one shuffle (the cell aggregate), all-scalar") {
    val rows = (1L to 100L).map(i => (i % 50, i % 13)).toDF("a", "b")
    val nodes = finalNodes(graft.operators.Layout.zOrderCells(
      rows, org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"), cellBits = 4))
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size == 1,
      s"expected the single cell-aggregate exchange, found ${shuffles.size}")
  }

  test("overlapJoin: bin equi-join, never a nested-loop join") {
    val a = (1L to 50L).map(i => (i, i * 7L, i * 7L + 20L)).toDF("id_a", "start", "end")
    val b = (1L to 50L).map(i => (i, i * 5L, i * 5L + 15L)).toDF("id_b", "start2", "end2")
    val df = graft.operators.IntervalJoin.overlapJoin(a, b, binWidth = 16)
    val nodes = finalNodes(df)
    val nested = nodes.filter(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
    assert(nested.isEmpty,
      s"interval join planned a nested loop:\n${df.queryExecution.executedPlan}")
  }

  test("cdcChunkDedup: text never crosses an exchange — only (id, hash) rows move") {
    val nodes = finalNodes(Dedup.cdcChunkDedup(corpus, "doc_id", "text"))
    val cols = shuffledColumns(nodes)
    assert(cols.nonEmpty, "collector found no shuffles — traversal broken?")
    assert(!cols.contains("text") && !cols.contains("chunk"),
      s"text/chunk crossed an exchange; shuffled columns: $cols")
  }

  test("collocations: bigrams build in-row — no text or token array in any exchange") {
    val nodes = finalNodes(graft.operators.TextAnalysis.collocations(
      corpus, "text", minCount = 1, k = 10))
    val cols = shuffledColumns(nodes)
    assert(!cols.contains("text") && !cols.contains("w"),
      s"text/token-array crossed an exchange; shuffled columns: $cols")
  }

  test("readability: single projection, zero shuffles") {
    val nodes = finalNodes(graft.operators.TextAnalysis.readability(
      corpus, "doc_id", "text"))
    val shuffles = nodes.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"readability is a pure per-row projection but planned ${shuffles.size} exchanges")
  }

  test("exact-cents aggregate keeps the partial/final HashAggregate pair (map-side combine)") {
    // The round-13 money discipline sums DECIMAL(38,0) cent units. A
    // decimal sum MUST still split into a map-side partial_sum + final
    // merge — if it ever degrades to a single post-shuffle aggregate, all
    // raw rows cross the exchange and every q-gate's scan-bound scaling
    // story breaks. Shape-asserted here on a q1-style aggregate.
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val money = Seq(("A", 12.34), ("A", 56.78), ("B", 9.99))
      .toDF("k", "price")
    val df = money.groupBy($"k").agg(
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.floor($"price" * 100 +
          org.apache.spark.sql.functions.lit(0.5)).cast("long")
          .cast("decimal(38,0)")).as("cents"))
    val aggs = finalNodes(df).collect { case h: HashAggregateExec => h }
    assert(aggs.size >= 2,
      s"expected partial+final HashAggregate pair, got ${aggs.size}:\n" +
        df.queryExecution.executedPlan)
    val partials = aggs.filter(_.aggregateExpressions.exists(_.mode ==
      org.apache.spark.sql.catalyst.expressions.aggregate.Partial))
    assert(partials.nonEmpty,
      s"no map-side partial aggregate in:\n${df.queryExecution.executedPlan}")
  }

  test("AQE skew join: a hot key splits into skew-read partitions at runtime, same rows") {
    // The RUNTIME half of the skew story (Skew.scala's deterministic
    // salting is the plan-time half, for the cases AQE can't reach —
    // aggregations, iterated joins): a shuffle join whose probe side
    // piles 60% of its rows on one key must come out of AQE with the
    // skewed partition SPLIT (the executed plan's AQEShuffleRead reports
    // 'skewed'), and splitting must be invisible in the rows. Thresholds
    // are scoped low so the fixture-sized partition qualifies — the same
    // knobs a deployment tunes against real partition sizes.
    import org.apache.spark.sql.functions.{col, count, lit, sum => fsum}
    val dir = java.nio.file.Files.createTempDirectory("plan-skew").toString
    spark.range(0, 200000)
      .selectExpr("CASE WHEN id % 10 < 6 THEN 0L ELSE id % 1000 END AS k",
        "id AS v", "repeat('x', 24) AS pad")
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, 1000).selectExpr("id AS k", "id % 7 AS w")
      .write.mode("overwrite").parquet(s"$dir/dim")
    def joined = spark.read.parquet(s"$dir/fact")
      .join(spark.read.parquet(s"$dir/dim"), "k")
      .agg(count(lit(1)).as("cnt"), fsum(col("v") * col("w")).as("dot"))
    val expected = joined.collect().toSeq // default confs: no split needed for parity
    GateSupport.withConfs(spark,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // coalescing can merge the skew splits right back below the test's
      // visibility; parallelismFirst keeps the split granularity
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true") {
      val df = joined
      assert(df.collect().toSeq == expected, "skew split changed the result")
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skewed"),
        s"no skew-split AQEShuffleRead in the final adaptive plan:\n$finalPlan")
    }
  }

  test("runtime bloom filter: a selective dim side injects might_contain into the fact scan") {
    // The 100 TB semi-join reduction: when the dim side of a shuffle join
    // carries a selective predicate, Catalyst's InjectRuntimeFilter builds
    // a bloom filter of the dim keys and pushes bloom_filter_might_contain
    // onto the FACT side, dropping non-joining fact rows BEFORE the
    // exchange — the fact table never shuffles rows the join will discard.
    // Thresholds are sized for the fixture (the knobs a real deployment
    // tunes); autoBroadcast is off so the join is the shuffle shape the
    // optimization targets. Result parity with the filter disabled is
    // asserted alongside the plan shape.
    val dir = java.nio.file.Files.createTempDirectory("plan-bloom").toString
    spark.range(0, 10000).selectExpr("id AS k", "id % 97 AS v")
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(0, 1000).selectExpr("id AS k", "id % 10 AS flag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    def joined = {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"flag" === 3)
      fact.join(dim, "k").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum($"v").as("sum_v"))
    }
    val expected = joined.collect().toSeq
    GateSupport.withConfs(spark,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = joined
      val hasBloom = df.queryExecution.optimizedPlan.exists(_.expressions.exists(
        _.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])))
      assert(hasBloom,
        s"no BloomFilterMightContain in:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().toSeq == expected)
    }
  }
}
