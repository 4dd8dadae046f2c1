package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphBuilder, GraphStore, PropertyGraph}

/** One per-family gate object: its slice of the driver's `queries` and
  * `oracleSql` contracts. [[SparkEntry]] merges the families (rejecting
  * duplicate names) so the driver still sees two flat maps. */
private[graft] trait GateFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

/** Shared helpers for the per-family gate objects (GatesGraph ... GatesQuality):
  * the graph-id arithmetic, the exact-money discipline (cents/sumExact/c4),
  * the schema-adaptive events reader, and the oracle-SQL shared fragments.
  * Split from the former single-object SparkEntry (round 14, pure refactor).
  */
private[graft] object GateSupport {

  private[graft] val B = GraphBuilder.B // 72057594037927936 = 2^56, id stride per label
  // memory-sink names must be session-unique; gates can run twice per session
  private[graft] val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraphBuilder.table(s, dir, name)

  /** Scope a streaming gate's query to `n` shuffle partitions: shuffle
    * count = state-store instances per stateful operator per micro-batch
    * (a stream-stream join provisions FOUR per partition), and 32 stores
    * for a 150k-row gate feed is pure setup overhead — real deployments
    * size this to state volume. The conf pins at query START and is
    * restored right after, so batch gates are unaffected. */
  private[graft] def withShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Scope runtime confs to `body`, restoring (or unsetting) each after —
    * the withShufflePartitions pattern generalized for gates, plan dumps,
    * and specs that need non-default knobs (RocksDB state-store provider,
    * runtime bloom-filter thresholds, ...). The single definition serves
    * every call site; don't re-implement the save/restore inline.
    *
    * Scope caveat: this mutates SESSION-GLOBAL runtime confs for the
    * duration of `body` — safe only because gates/queries run serially on
    * the shared SparkSession (Verify and Bench both iterate the query map
    * single-threaded). A concurrent runner would need per-thread sessions
    * (`SparkSession.newSession`) instead. Duplicate keys are rejected:
    * with a duplicate, the second save would record the FIRST set value as
    * the "previous" to restore, leaking the override past the scope. */
  private[graft] def withConfs[A](s: SparkSession, kvs: (String, String)*)(body: => A): A = {
    require(kvs.map(_._1).distinct.length == kvs.length,
      s"withConfs: duplicate conf keys in ${kvs.map(_._1).mkString(", ")}")
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prev.reverse.foreach {
      case (k, Some(p)) => s.conf.set(k, p)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** Execute a SMALL result NOW and detach it from its inputs: collect to
    * driver rows, rebuild via createDataFrame. For gates whose plan must
    * run inside a scope that is gone by the time Verify consumes the
    * returned DataFrame (conf overrides via [[withConfs]], temp dirs the
    * finally deletes). Unlike `localCheckpoint()` — the r15 shape — the
    * rebuilt frame pins nothing in the block manager, so a gated run
    * leaves no cached blocks behind (r15 ADVICE on o5). Only for
    * aggregate-sized results: the collect is driver-memory-bound. */
  private[graft] def pinLocal(df: DataFrame): DataFrame = {
    val rows = df.collect()
    require(rows.length <= 100000,
      s"pinLocal is for small aggregates, got ${rows.length} rows")
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(rows: _*)),
      df.schema)
  }

  /** Recursively delete a temp tree (the replay-harness cleanup — NOT for
    * anything a later reader still needs). Deliberately quiet on races:
    * a file already gone is the desired end state. */
  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(root)) {
      val walk = Files.walk(root) // must close: the stream holds directory handles
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Dev-only phase timer (graft.verbose, the Traversal.timed twin) for
    * the streaming replay harnesses — stays silent in driver runs. */
  @inline private[graft] def timedSw[A](label: String)(f: => A): A =
    if (!sys.props.contains("graft.verbose")) f
    else {
      val t0 = System.nanoTime(); val r = f
      println(f"[sw] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

  /** Stage each frame as ONE parquet file in `inDir` with strictly
    * increasing mtimes, so a FileStreamSource with maxFilesPerTrigger=1
    * replays them as deterministic micro-batches (FileStreamSource
    * admission orders by mtime). The one staging idiom behind every
    * replayed-feed streaming gate (sw15/sw23/sw24 and the sw18 sides) —
    * keep the mechanics here, not re-inlined per gate. The scratch write
    * tree is deleted after the part files are MOVED into place (a
    * 308-gate board used to leak one parquet copy per staged batch per
    * run — r14 review finding).
    *
    * ONE partitioned write stages every batch (optimization round 16;
    * was one write job per frame — measured ~0.2 s of fixed job cost
    * each on the 29-gate streaming family): the frames are tagged with
    * their batch index, unioned, and shuffled on the tag, so partitionBy
    * emits exactly one part file per index in a single job. Row ORDER
    * within a staged file is shuffle-arbitrary where the per-frame
    * coalesce(1) write preserved scan order — fine for every replay
    * consumer (joins, aggregations, and the session/recency processors
    * sort by event time inside the group; a stream never guarantees
    * intra-batch order anyway). Frames must share a schema (they feed
    * one readStream schema) and each must be NON-EMPTY — a missing part
    * file throws rather than silently dropping a micro-batch (the old
    * path staged an empty file; no gate stages an empty frame). */
  private[graft] def stageReplayFeed(inDir: java.nio.file.Path,
                                     frames: Seq[DataFrame],
                                     startIndex: Int = 0): Unit = {
    java.nio.file.Files.createDirectories(inDir)
    if (frames.isEmpty) return
    val tmp = java.nio.file.Files.createTempDirectory("graft-stage")
    try {
      frames.zipWithIndex
        .map { case (df, i) => df.withColumn("__b", lit(i)) }
        .reduce(_ unionByName _)
        .repartition(col("__b"))
        .write.mode("overwrite").partitionBy("__b").parquet(tmp.toString)
      frames.indices.foreach { i0 =>
        val i = startIndex + i0 // two-phase replays stage a later tranche
        val dir = tmp.resolve(s"__b=$i0").toFile
        val part = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"no parquet part file for staged batch $i0 under $tmp — " +
              "an empty replay frame? every micro-batch needs ≥ 1 row"))
        val staged = inDir.resolve(f"$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, staged)
        java.nio.file.Files.setLastModifiedTime(staged,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
      }
    } finally deleteRecursively(tmp)
  }

  /** The transformWithState gate scaffold shared by sw23/sw24/sw25: stage
    * `batches` as an mtime-ordered replay feed, run `pipeline` over the
    * file stream as a Structured Streaming query under the RocksDB
    * provider (the only backend the state-v2 API supports) WITH changelog
    * checkpointing — commit the per-batch delta instead of a full RocksDB
    * snapshot every micro-batch (measured 6.5 -> 4.8 s min on sw23 at
    * sf0.1; also the recommended production setting — snapshot cost
    * scales with STATE size, changelog with BATCH size, exactly the
    * difference that matters at 100 TB) — and return the memory-sink
    * table. 8 shuffle partitions: state-store instances per stateful op
    * (see [[withShufflePartitions]]). */
  private[graft] def runTwsReplayGate(s: SparkSession, prefix: String,
      batches: Seq[DataFrame], schema: org.apache.spark.sql.types.StructType,
      outputMode: String)(pipeline: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-$prefix")
    try {
      val inDir = tmp.resolve("in")
      timedSw(s"$prefix stage feed")(stageReplayFeed(inDir, batches))
      val name = s"${prefix}_out_${sinkSeq.incrementAndGet()}"
      withConfs(s,
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
          "true",
        // single-sentinel gates (sw24) flush final state in the engine's
        // no-data batch — pin the default so a session override cannot
        // silently drop the watermark-driven emits
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "true") {
        withShufflePartitions(s, 8) {
          val stream = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
          val q = timedSw(s"$prefix query start")(pipeline(stream)
            .writeStream.format("memory").queryName(name)
            .option("checkpointLocation", s"$tmp/ck")
            .outputMode(outputMode).trigger(Trigger.AvailableNow()).start())
          timedSw(s"$prefix awaitTermination")(q.awaitTermination())
        }
      }
      s.table(name)
    // the memory sink holds the result rows; the replay feed and the
    // checkpoint are dead weight once the query terminates (r14 review
    // finding: per-gate dirs accumulated across 308-gate boards)
    } finally deleteRecursively(tmp)
  }

  /** Two-phase variant of [[runTwsReplayGate]] for PROCESSING-time
    * semantics (state TTL): phase-1 batches drain in one query run, the
    * harness sleeps `sleepMs` of real wall clock, then phase-2 batches
    * are staged with later mtimes and a SECOND query resumes from the
    * same checkpoint — the only deterministic way to put a controlled
    * processing-time gap between two micro-batches (Trigger.AvailableNow
    * drains back-to-back, and Spark exposes no virtual clock outside its
    * own test harness). Both phases' memory-sink tables are returned so
    * a gate can pin each phase's emits separately. Same provider
    * discipline as the one-shot scaffold (RocksDB + changelog).
    *
    * Three termination traps shaped this harness (all hit while building
    * it): (1) under TimeMode.ProcessingTime, TransformWithStateExec's
    * shouldRunAnotherBatch stays true — an AvailableNow query never
    * reaches awaitTermination and processAllAvailable never sees
    * noNewData; both hang while empty micro-batches spin (observed:
    * epoch 765 in 7 min). So each phase runs the default trigger and
    * POLLS for the phase's expected emit count. (2) the memory sink
    * refuses checkpoint RECOVERY, which phase 2 is — emits are captured
    * via foreachBatch (the production restart-safe sink) into a driver
    * buffer instead. (3) stop() between the foreachBatch call and the
    * batch COMMIT would make phase 2 replay the data batch against
    * rolled-back state (at-least-once), so after the rows land the poll
    * also waits for a LATER batch to finish (the ProcessingTime empty-
    * batch spin guarantees one) before stopping. */
  private[graft] def runTwsTwoPhaseReplay(s: SparkSession, prefix: String,
      phase1: (Seq[DataFrame], Long), phase2: (Seq[DataFrame], Long),
      schema: org.apache.spark.sql.types.StructType, sleepMs: Long)(
      pipeline: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft-$prefix")
    try {
      val inDir = tmp.resolve("in")
      withConfs(s,
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
          "true") {
        withShufflePartitions(s, 8) {
          def run(frames: Seq[DataFrame], startIndex: Int,
                  expectedRows: Long): DataFrame = {
            stageReplayFeed(inDir, frames, startIndex)
            val buf = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
            val out = pipeline(s.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(inDir.toString))
            val outSchema = out.schema
            val dataBatchDone = new java.util.concurrent.atomic.AtomicLong(-1L)
            val q = out.writeStream
              .foreachBatch { (df: DataFrame, id: Long) =>
                val rows = df.collect()
                rows.foreach(buf.add)
                if (rows.nonEmpty) dataBatchDone.set(id)
                ()
              }
              .option("checkpointLocation", s"$tmp/ck")
              .outputMode("update").start()
            try {
              val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
              def overdue(what: String): Unit = require(
                System.nanoTime() < deadline,
                s"$prefix: $what after 120 s (${buf.size}/$expectedRows emits)")
              while (buf.size < expectedRows) {
                overdue("emits still short"); Thread.sleep(50)
              }
              // wait for a batch PAST the data batch: its construction
              // implies the data batch committed, so stop() cannot force
              // an at-least-once replay into the next phase
              while (Option(q.lastProgress).forall(_.batchId <= dataBatchDone.get())) {
                overdue("no post-data batch observed"); Thread.sleep(50)
              }
            } finally q.stop()
            s.createDataFrame(s.sparkContext.parallelize(
              buf.toArray(Array.empty[org.apache.spark.sql.Row]).toSeq, 1), outSchema)
          }
          val out1 = run(phase1._1, 0, phase1._2)
          Thread.sleep(sleepMs)
          val out2 = run(phase2._1, phase1._1.length, phase2._2)
          (out1, out2)
        }
      }
    } finally deleteRecursively(tmp)
  }

  /** The documents table with the multimodal gates' chars==bytes
    * precondition ENFORCED: the BMP/WAV/AVI oracles measure text in
    * CHARACTERS (length/unicode/substr) while the codecs frame UTF-8
    * BYTES — identical only while the corpus is pure ASCII. A future
    * regen with one multi-byte character would desync frame counts and
    * channel sums as a bare hash mismatch; this audit names the real
    * cause instead (r14 advice). One count job over the (small, dim-
    * sized) documents table per gated run. */
  private[graft] def asciiDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nonAscii = docs
      .filter(length(col("text")) =!= octet_length(col("text"))).count()
    require(nonAscii == 0,
      s"$nonAscii documents.text value(s) are not pure ASCII — the " +
        "multimodal oracles measure characters while the codecs frame " +
        "UTF-8 bytes; rewrite those oracles byte-wise (octet_length/" +
        "byte extraction) before trusting the m-gates on this corpus")
    docs
  }

  /** Exact money arithmetic. Every money column in the testdata is
    * 2dp-exact (measured: max |x·100 − round(x·100)| ≤ 4e-9 across all
    * tables — and ENFORCED per run by Verify's cents-precondition audit,
    * which names any column that drifts past 1e-6 on a future regen), so
    * rounding x·100 half-away-from-zero recovers the integer cents
    * identically in Spark and DuckDB — the dq9 idiom. Half-AWAY-FROM-ZERO,
    * not ⌊x·100+0.5⌋: the latter truncates toward −∞ on negative ties,
    * which is latent on 2dp-exact data (ties never occur) but wrong the
    * day the pattern is reused on a signed measure (refunds, deltas) with
    * >2dp values. Sums over these integers are order-invariant, unlike
    * round(sum(double), 2), which legitimately flips on half-cent ties
    * under different partial-agg orders (q9 had 3 of 175 sf0.1 groups
    * within 0.01 cents of a boundary). Terms are widened to
    * decimal(38,0) before summing so a 100 TB row count cannot silently
    * wrap a BIGINT; DuckDB's sum(BIGINT) → HUGEINT matches. */
  private[graft] def cents(c: Column): Column =
    when(c >= 0, floor(c * 100 + lit(0.5)))
      .otherwise(-floor(-c * 100 + lit(0.5))).cast("long")
  /** Order-invariant sum of exact integer units (widened past BIGINT). */
  private[graft] def sumExact(units: Column): Column = sum(units.cast("decimal(38,0)"))
  /** Revenue term price·(1−disc) in exact 10⁻⁴-dollar units. */
  private[graft] def c4(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))
  /** Exact integer units → DOUBLE dollars: one IEEE division both engines
    * perform identically on identical inputs — no round() anywhere. */
  private[graft] def money(unitsSum: Column, scale: Long): Column =
    unitsSum.cast("double") / lit(scale.toDouble)

  /** Oracle-side (DuckDB SQL) twins of cents/c4 — the same
    * half-away-from-zero branch, so both engines round identically on
    * any sign. */
  private[graft] def centsSql(c: String): String =
    s"CAST(CASE WHEN $c >= 0 THEN floor($c * 100 + 0.5) " +
      s"ELSE -floor(-$c * 100 + 0.5) END AS BIGINT)"
  private[graft] def c4Sql(price: String, disc: String): String =
    s"${centsSql(price)} * (100 - ${centsSql(disc)})"

  /** PagedApiFixture.pageBody's row formula in SQL — shared by b01 (batch
    * HTTP ingest) and sw22 (streamed ingest), both at 6 pages × 50. */
  private[graft] val pagedFixtureOracleSql: String =
    """SELECT 'fix' || n || '@example.test' AS email,
      |  CAST(n // 50 AS INTEGER) AS page,
      |  CAST(n % 50 AS INTEGER) AS idx,
      |  (n % 5 = 0) AS isExternal
      |FROM (SELECT unnest(generate_series(0, 299)) AS n)""".stripMargin

  /** The symmetrized supplier–nation–region containment graph — the
    * x11/x14/x21 family's shared input. */
  private[graft] def snrUndirected(s: SparkSession, dir: String): DataFrame = {
    val sn = t(s, dir, "supplier").select(
      (lit(4L * B) + col("s_suppkey")).as("src"),
      (lit(2L * B) + col("s_nationkey")).as("dst"))
    val nr = t(s, dir, "nation").select(
      (lit(2L * B) + col("n_nationkey")).as("src"),
      (lit(1L * B) + col("n_regionkey")).as("dst"))
    val e = sn.unionByName(nr)
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** events.parquet stores parquet TIMESTAMP(NANOS), which Spark reads
    * differently across versions: ≤4.0 rejects it unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` (then yields LongType
    * nanos), while 4.1+ reads it natively as TIMESTAMP_NTZ (µs-truncated)
    * and silently ignores that legacy conf. Branch on the schema actually
    * read so the same code is correct on both runtimes; every branch lands
    * on a µs-precision TIMESTAMP in the UTC session zone — matching
    * DuckDB's own ns→µs truncation in the oracle. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") // honored ≤4.0 only
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType       => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType  => raw
      // TIMESTAMP_NTZ wall-clock == the stored UTC instant (session tz is
      // pinned UTC everywhere), so the cast is instant-preserving.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts read as unexpected type $other — new Spark parquet NANOS behavior?")
    }
  }

  private[graft] def khop2Regions(s: SparkSession, dir: String,
                           salted: Boolean = false): DataFrame = {
    val g = GraphStore.get(s, dir)
    // salted: the same walk through the skew-aware hop join with
    // graft.hop.salt=auto (see Traversal.autoSaltBuckets): the degree
    // probe measures the skew and picks the salt width itself — on this
    // UNskewed containment graph it measures 0 and the walk costs what
    // a13 costs (a static salt of 8 used to cost 2.5× here), while
    // SkewSpec's celebrity graph measures >0 and keeps the straggler
    // win. khop materializes eagerly inside the call, so the conf flip
    // is scoped here and identical rows prove the path correct.
    val reached =
      if (!salted) g.reach(g.hasLabel("customer"), 2, dedupStart = false)
      else {
        val prev = s.conf.get("graft.hop.salt", "0")
        s.conf.set("graft.hop.salt", "auto")
        // prepEdges = false (optimization round 17): the store's edges are
        // already src-hash-partitioned, sorted and persisted — exactly
        // what prep() would rebuild — and the auto probe (now memoized per
        // (plan, partitions)) measures 0 here, so the walk takes the same
        // exchange-free hop joins as a13. On a future graph where auto
        // measures > 0 the salted equi-join still runs (stepPairs keys on
        // (src, __salt) regardless of layout); a24 pins the salted LAYOUT
        // path (prepEdges = true on a fresh skewed edge set) under the
        // oracle.
        try graph.Traversal.khop(g.E.filter(col("label") === "in"),
          g.hasLabel("customer"), 2, prepEdges = false, dedupStart = false)
        finally s.conf.set("graft.hop.salt", prev)
      }
    val regions = g.hasLabel("region")
      .select(col("id").as("rid"), col("props").getItem("name").as("region_name"))
    reached.join(regions, reached("node") === regions("rid"))
      .select((col("origin") - lit(3L * B)).as("custkey"), col("region_name"), col("hop"))
  }


  /** Unrolled peel SQL for the x9_kcore oracle. ANSI SQL cannot loop to a
    * fixpoint (recursive CTEs forbid aggregation in the recursive term),
    * so the peel is UNROLLED: each round keeps edges whose endpoints both
    * hold degree ≥ k. Peeling is idempotent past the fixpoint, so the
    * unroll only needs to be ≥ the true peel depth — measured 5 rounds at
    * every SF (k=3); 10 leaves margin, and the Spark side throws if its
    * own fixpoint loop ever exceeds maxIter rather than under-peel. */
  private[graft] def kcoreOracleSql(k: Int, rounds: Int): String = {
    val edges =
      """WITH e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT 3*72057594037927936 + c_custkey AS src, 2*72057594037927936 + c_nationkey AS dst FROM customer
        |  UNION ALL SELECT 4*72057594037927936 + s_suppkey, 2*72057594037927936 + s_nationkey FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation
        |  UNION ALL SELECT 6*72057594037927936 + o_orderkey, 3*72057594037927936 + o_custkey FROM orders
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 6*72057594037927936 + l_orderkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 5*72057594037927936 + l_partkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 4*72057594037927936 + l_suppkey FROM lineitem))""".stripMargin
    val peels = (1 to rounds).map { i =>
      s"u$i AS MATERIALIZED (SELECT a, b FROM u${i - 1} " +
        s"WHERE a IN (SELECT a FROM u${i - 1} GROUP BY a HAVING count(*) >= $k) " +
        s"AND b IN (SELECT a FROM u${i - 1} GROUP BY a HAVING count(*) >= $k))"
    }.mkString(",\n")
    s"""$edges,
       |u0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
       |$peels
       |SELECT a AS id, count(*) AS deg FROM u$rounds GROUP BY a""".stripMargin
  }

  /** Unrolled Luby-MIS SQL for the x12_mis oracle: per round a priority
    * CTE, a winners CTE (no smaller-(p,id) undecided neighbor), a losers
    * CTE (undecided neighbors of winners), and the shrunken undecided
    * set — the same deterministic md5 priorities the Spark loop uses, so
    * the fixpoint matches row-for-row. Idempotent past the fixpoint
    * (empty u stays empty); `rounds` must be ≥ the actual convergence
    * depth or the oracle is missing vertices (visible as a row-count
    * mismatch, never a silent pass). */
  private[graft] def misOracleSql(rounds: Int): String = {
    val base =
      """WITH b AS MATERIALIZED (
        |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
        |e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |  SELECT src, dst FROM b UNION ALL SELECT dst, src FROM b) WHERE src <> dst),
        |u0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM (
        |  SELECT src FROM b UNION ALL SELECT dst FROM b))""".stripMargin
    val perRound = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT id,
         |  ${md5i(s"CAST(id AS VARCHAR) || '#mis#$r'")} AS p FROM u${r - 1}),
         |w$r AS MATERIALIZED (SELECT pr.id FROM p$r pr WHERE NOT EXISTS (
         |  SELECT 1 FROM e0 e JOIN p$r pn ON e.dst = pn.id
         |  WHERE e.src = pr.id AND (pn.p, pn.id) < (pr.p, pr.id))),
         |l$r AS MATERIALIZED (SELECT DISTINCT e.dst AS id FROM e0 e
         |  JOIN w$r w ON e.src = w.id
         |  WHERE e.dst IN (SELECT id FROM u${r - 1})),
         |u$r AS MATERIALIZED (SELECT id FROM u${r - 1}
         |  WHERE id NOT IN (SELECT id FROM w$r) AND id NOT IN (SELECT id FROM l$r))""".stripMargin
    }.mkString(",\n")
    val winners = (1 to rounds).map(r => s"SELECT id FROM w$r").mkString(" UNION ALL ")
    val losers = (1 to rounds).map(r => s"SELECT id FROM l$r").mkString(" UNION ALL ")
    s"""$base,
       |$perRound
       |SELECT id, TRUE AS in_mis FROM ($winners)
       |UNION ALL SELECT id, FALSE AS in_mis FROM ($losers)""".stripMargin
  }

  /** Unrolled BPE-learning SQL for the t_bpe_learn oracle: per round, a
    * MATERIALIZED pair-count CTE, a 1-row argmax CTE, and the rewritten
    * vocabulary CTE — the same greedy left-to-right `replace` the Spark
    * loop uses, so the learned merges match string-for-string. */
  /** The shared learn-loop CTE chain (v0 seed, then per round pair counts
    * p_r, argmax b_r, rewritten vocabulary v_r) — used by both the
    * t_bpe_learn oracle (emits the b_r rows) and the t_bpe_apply oracle
    * (re-applies the b_r merges to per-word segmentations). */
  private[graft] def bpeRoundsCtes(rounds: Int): String = {
    val v0 =
      """WITH v0 AS MATERIALIZED (
        |  SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS seg, n FROM (
        |    SELECT word AS w, count(*) AS n FROM (
        |      SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS word
        |      FROM documents) GROUP BY word))""".stripMargin
    val perRound = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1] AS pair,
         |    CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT list_filter(string_split(seg, ' '), x -> x <> '') AS t, n FROM v${r - 1}),
         |       unnest(generate_series(1, len(t) - 1)) AS g(i)
         |  WHERE len(t) >= 2 GROUP BY 1),
         |b$r AS MATERIALIZED (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT replace(seg, ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ') AS seg, n
         |  FROM v${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    s"$v0,\n$perRound"
  }

  private[graft] def bpeLearnOracleSql(rounds: Int): String = {
    val out = (1 to rounds).map { r =>
      s"SELECT $r AS round, split_part(pair, ' ', 1) AS merge_left, " +
        s"split_part(pair, ' ', 2) AS merge_right, cnt FROM b$r"
    }.mkString("\nUNION ALL ")
    s"${bpeRoundsCtes(rounds)}\n$out"
  }

  private[graft] def bpeApplyOracleSql(rounds: Int): String = {
    val sgs = (1 to rounds).map { r =>
      s"""sg$r AS (SELECT w,
         |  replace(seg, ' ' || b.pair || ' ', ' ' || replace(b.pair, ' ', '') || ' ') AS seg
         |  FROM sg${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    s"""${bpeRoundsCtes(rounds)},
       |wd AS MATERIALIZED (SELECT doc_id, word AS w, count(*) AS k FROM (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS word
       |  FROM documents) GROUP BY 1, 2),
       |sg0 AS (SELECT DISTINCT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seg FROM wd),
       |$sgs,
       |pw AS (SELECT w, len(list_filter(string_split(seg, ' '), x -> x <> '')) AS toks FROM sg$rounds)
       |SELECT doc_id, CAST(sum(k * length(w)) AS BIGINT) AS n_chars,
       |  CAST(sum(k * toks) AS BIGINT) AS n_bpe_tokens
       |FROM wd JOIN pw USING (w) GROUP BY doc_id""".stripMargin
  }

  /** DuckDB replica of [[graft.functions.Hashing.md5Long]]. */
  /** The exact DuckDB replay of the iters=0 IVF (nlist=8, nprobe=2, k=3,
    * queries vec_id < 20): md5-seeded centroids, nearest-cell assignment,
    * 2-cell probe, exact-cosine rescore. Shared by e4b (in-memory) and
    * e17 (served from persisted parquet tables) — one oracle, two paths. */
  private[graft] def ivfFixedOracleSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
       |cent AS (SELECT CAST(rn - 1 AS INT) AS cid, e AS cvec FROM sd WHERE rn <= 8),
       |asg AS (SELECT vec_id, e, cid FROM (
       |  SELECT v.vec_id, v.e, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY ${l2Sql("v.e", "c.cvec")}, c.cid) AS r
       |  FROM v CROSS JOIN cent c) WHERE r = 1),
       |q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 20),
       |pr AS (SELECT query_id, qv, cid FROM (
       |  SELECT q.query_id, q.qv, c.cid,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY ${l2Sql("q.qv", "c.cvec")}, c.cid) AS r
       |  FROM q CROSS JOIN cent c) WHERE r <= 2),
       |sc AS (SELECT pr.query_id, a.vec_id AS neighbor_id,
       |  round(${cosSql("pr.qv", "a.e")}, 6) AS cos
       |  FROM pr JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.query_id)
       |SELECT query_id, neighbor_id, cos,
       | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
       |FROM sc QUALIFY rank <= 3""".stripMargin

  private[graft] def md5i(arg: String): String =
    s"('0x' || substr(md5($arg), 1, 15))::BIGINT"

  /** The x11/x11b oracle: exact neighborhood function of the symmetrized
    * supplier–nation–region graph via `WITH RECURSIVE` min-hop walk.
    * `extraCols` appends constant verdict columns for the self-evaluating
    * x11b form. */
  /** The x22/x22b oracle: stress centrality replayed by brute force —
    * enumerate ALL ≤5-hop walks (UNION ALL: each row is one walk), keep
    * those at min-hop length (minimal walks ARE the shortest paths),
    * count per (s,u) = σ, then compose σ_s(v)·σ_v(t) through degree>1
    * hubs where the distance test d(s,v)+d(v,t)=d(s,t) certifies
    * interiority. `extraCols` appends the constant verdict for the
    * self-evaluating sampled form. */
  private[graft] def stressSql(extraCols: String): String =
    s"""WITH RECURSIVE e AS (
       |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
       |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
       |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |verts AS (SELECT DISTINCT src AS v FROM und),
       |walk(s, u, hop) AS (
       |  SELECT v, v, 0 FROM verts
       |  UNION ALL
       |  SELECT w.s, und.dst, w.hop + 1 FROM walk w JOIN und ON w.u = und.src
       |  WHERE w.hop < 5),
       |md AS (SELECT s, u, min(hop) AS d FROM walk GROUP BY s, u),
       |sig AS (SELECT w.s, w.u, m.d, count(*) AS sigma
       |  FROM walk w JOIN md m ON m.s = w.s AND m.u = w.u AND m.d = w.hop
       |  WHERE m.d > 0 GROUP BY w.s, w.u, m.d),
       |hub AS (SELECT src AS v FROM und GROUP BY src HAVING count(*) > 1),
       |st AS (SELECT a.u AS v, sum(a.sigma * b.sigma) AS stress
       |  FROM sig a JOIN hub ON hub.v = a.u
       |  JOIN sig b ON b.s = a.u
       |  JOIN md m ON m.s = a.s AND m.u = b.u AND m.d = a.d + b.d
       |  GROUP BY a.u)
       |SELECT verts.v AS id, CAST(coalesce(st.stress, 0) AS BIGINT) AS stress$extraCols
       |FROM verts LEFT JOIN st ON st.v = verts.v""".stripMargin

  private[graft] def anfSql(extraCols: String): String =
    s"""WITH RECURSIVE e AS (
       |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
       |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
       |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |verts AS (SELECT DISTINCT src AS v FROM und),
       |walk(v, u, hop) AS (
       |  SELECT v, v, 0 FROM verts
       |  UNION
       |  SELECT w.v, und.dst, w.hop + 1 FROM walk w JOIN und ON w.u = und.src
       |  WHERE w.hop < 5),
       |md AS (SELECT v, u, min(hop) AS d FROM walk GROUP BY v, u),
       |h AS (SELECT CAST(d AS BIGINT) AS hop, count(*) AS n_pairs FROM md GROUP BY d)
       |SELECT hop, n_pairs,
       |  CAST(sum(n_pairs) OVER (ORDER BY hop) AS BIGINT) AS cum_pairs$extraCols FROM h""".stripMargin

  /** The x21/x21b oracle: exact per-vertex harmonic centrality —
    * min-hop distances by `WITH RECURSIVE`, Σ 1/d grouped by distance
    * in integer micro units (floor(n·10⁶ / d) per distance, matching
    * [[graft.graph.Traversal.harmonicCentrality]]'s formula exactly).
    * `extraCols` appends the constant verdict for the self-evaluating
    * x21b form. */
  /** The x18 label-propagation CTE chain (4 synchronous rounds over the
    * symmetrized customer–nation–region graph), ending at `l4` (id,
    * label) with `u` (symmetrized edges) and `v` (vertices) still in
    * scope — shared by the x18 and x27 oracles. */
  private[graft] def labelPropCtes: String = {
    def round(n: Int) =
      s"""r$n AS (SELECT id, label FROM (
         |  SELECT u.src AS id, l.label, count(*) AS n,
         |    row_number() OVER (PARTITION BY u.src ORDER BY count(*) DESC, l.label) AS r
         |  FROM u JOIN l${n - 1} l ON l.id = u.dst GROUP BY u.src, l.label) WHERE r = 1),
         |l$n AS (SELECT v.id, coalesce(r$n.label, v.id) AS label FROM v LEFT JOIN r$n USING (id))"""
        .stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT 3*72057594037927936 + c_custkey AS src,
       |    2*72057594037927936 + c_nationkey AS dst FROM customer
       |  UNION SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
       |u AS (SELECT src, dst FROM e0 WHERE src <> dst
       |  UNION SELECT dst, src FROM e0 WHERE src <> dst),
       |v AS (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
       |l0 AS (SELECT id, id AS label FROM v),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |${round(4)}""".stripMargin
  }

  private[graft] def harmonicSql(extraCols: String): String =
    s"""WITH RECURSIVE e AS (
       |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
       |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
       |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |verts AS (SELECT DISTINCT src AS v FROM und),
       |walk(v, u, hop) AS (
       |  SELECT v, v, 0 FROM verts
       |  UNION
       |  SELECT w.v, und.dst, w.hop + 1 FROM walk w JOIN und ON w.u = und.src
       |  WHERE w.hop < 5),
       |md AS (SELECT v, u, min(hop) AS d FROM walk GROUP BY v, u),
       |per AS (SELECT v, d, count(*) AS n FROM md WHERE d > 0 GROUP BY v, d)
       |SELECT verts.v AS id,
       |  CAST(coalesce(sum(per.n * 1000000 // per.d), 0) AS BIGINT) AS harmonic_micro$extraCols
       |FROM verts LEFT JOIN per ON per.v = verts.v GROUP BY verts.v""".stripMargin

  /** The x4/x2 oracle: 3 unrolled iterations of the integer fixed-point
    * PageRank recurrence over the supplier–nation–region graph —
    * recursive CTEs cannot aggregate in the recursive term, and with
    * pure BIGINT arithmetic the unrolled form is bit-exact anywhere.
    * `extraCols` appends constant verdict columns for the
    * self-evaluating x2 form. */
  private[graft] def pagerankFixedSql(extraCols: String): String = {
    val iters = (1 to 3).map { i =>
      s"""p$i AS (
         |  SELECT v.id, 150000 + (17 * coalesce(c.m, 0)) // 20 AS rank_micro
         |  FROM v LEFT JOIN (
         |    SELECT e.dst AS id, sum(p${i - 1}.rank_micro // d.outdeg) AS m
         |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id JOIN d ON d.src = e.src
         |    GROUP BY e.dst) c ON v.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT src, dst FROM (
       |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
       |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation)),
       |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank_micro FROM v),
       |$iters
       |SELECT id, CAST(rank_micro AS BIGINT) AS rank_micro$extraCols FROM p3""".stripMargin
  }

  /** DuckDB replica of the d_scd2_history snapshot chain: three
    * deterministic versions of the documents corpus (v2 rewrites the 40s
    * hash slice and deletes the 95+ slice; v3 additionally rewrites the
    * 20s slice and restores the deletions), collapsed to validity runs.
    * Ends with CTE `hist` (doc_id, fp, valid_from, valid_to, is_current) —
    * shared by the d_scd2_history and z4_pit_join oracles. */
  private[graft] val SCD2_CTES = {
    val fp = (arg: String) =>
      s"('0x' || substr(md5(CAST(length($arg) AS VARCHAR) || ':' || $arg), 1, 15))::BIGINT"
    s"""WITH s AS (SELECT doc_id, text,
       |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS sl FROM documents),
       |v1 AS (SELECT doc_id, 1 AS v, ${fp("text")} AS fp FROM s),
       |v2 AS (SELECT doc_id, 2 AS v,
       |  ${fp("(CASE WHEN sl BETWEEN 40 AND 49 THEN text || ' [rev2]' ELSE text END)")} AS fp
       |  FROM s WHERE sl < 95),
       |v3 AS (SELECT doc_id, 3 AS v,
       |  ${fp("(CASE WHEN sl BETWEEN 20 AND 29 THEN text || ' [rev3]' WHEN sl BETWEEN 40 AND 49 THEN text || ' [rev2]' ELSE text END)")} AS fp
       |  FROM s),
       |a AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3),
       |m AS (SELECT doc_id, v, fp,
       |  CASE WHEN lag(v) OVER w IS NULL THEN 1
       |       WHEN v <> lag(v) OVER w + 1 THEN 1
       |       WHEN fp <> lag(fp) OVER w THEN 1 ELSE 0 END AS nr
       |  FROM a WINDOW w AS (PARTITION BY doc_id ORDER BY v)),
       |r AS (SELECT doc_id, v, fp,
       |  sum(nr) OVER (PARTITION BY doc_id ORDER BY v) AS run FROM m),
       |hist AS (SELECT doc_id, min(fp) AS fp, CAST(min(v) AS BIGINT) AS valid_from,
       |  CAST(max(v) AS BIGINT) AS valid_to, max(v) = 3 AS is_current
       |FROM r GROUP BY doc_id, run)""".stripMargin
  }

  /** DuckDB replica of the m9 audio energy-delta fingerprint from the
    * PCM16 sample formula (sample i = (unicode(char_i) − 64)·256, frames
    * of 256): bit i set iff frame i+1 has higher energy than frame i;
    * bits packed with bit_or, bit 63 via the min-long literal. Ends with
    * CTE `afp` (id, afp). */
  private[graft] val AUDIOFP_CTES =
    """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
      |g AS (SELECT doc_id, text, unnest(generate_series(1, len)) AS i FROM t),
      |c AS (SELECT doc_id, i, unicode(substr(text, CAST(i AS INTEGER), 1)) - 64 AS d FROM g),
      |fr AS (SELECT doc_id AS id, (i - 1) // 8 AS frame_no,
      |  CAST(sum(CAST(d AS BIGINT) * d * 65536) AS BIGINT) AS energy
      |  FROM c GROUP BY 1, 2),
      |l AS (SELECT id, frame_no, energy,
      |  lead(energy) OVER (PARTITION BY id ORDER BY frame_no) AS ne FROM fr),
      |bs AS (SELECT id,
      |  CASE WHEN frame_no = 63 THEN -9223372036854775808
      |       ELSE 1::BIGINT << CAST(frame_no AS INTEGER) END AS bit
      |  FROM l WHERE ne IS NOT NULL AND frame_no < 64 AND ne > energy),
      |ag AS (SELECT id, bit_or(bit) AS afp FROM bs GROUP BY id),
      |ids AS (SELECT DISTINCT id FROM fr),
      |afp AS (SELECT ids.id, coalesce(ag.afp, 0) AS afp
      |  FROM ids LEFT JOIN ag USING (id))""".stripMargin

  /** DuckDB replica of [[graft.operators.Multimodal.decodeBmpAHash]] from
    * the BMP byte-layout formula (pixel i = payload bytes 3i..3i+2, laid
    * out 16-wide top-down): 8×8 luminance cells, exact cross-multiplied
    * threshold, bits packed with bit_or (bit 63 via the min-long literal —
    * DuckDB refuses the overflowing `1 << 63`). Ends with CTE `ah`
    * (id, ahash, n_px). */
  private[graft] val AHASH_CTES =
    """WITH t AS (SELECT doc_id, text, length(text) AS len,
      |  greatest(1, CAST(ceil(length(text) / 48.0) AS BIGINT)) AS h FROM documents),
      |px AS (SELECT doc_id, text, len, h, unnest(generate_series(0, 16 * h - 1)) AS i FROM t),
      |g AS (SELECT doc_id, h, i,
      |   (CASE WHEN 3*i + 1 <= len THEN unicode(substr(text, CAST(3*i + 1 AS INTEGER), 1)) ELSE 0 END
      |  + CASE WHEN 3*i + 2 <= len THEN unicode(substr(text, CAST(3*i + 2 AS INTEGER), 1)) ELSE 0 END
      |  + CASE WHEN 3*i + 3 <= len THEN unicode(substr(text, CAST(3*i + 3 AS INTEGER), 1)) ELSE 0 END) AS gray
      |  FROM px),
      |cl AS (SELECT doc_id, (((i // 16) * 8) // h) * 8 + (i % 16) // 2 AS cell,
      |  CAST(sum(gray) AS BIGINT) AS cs, count(*) AS cn FROM g GROUP BY 1, 2),
      |tot AS (SELECT doc_id, sum(cs) AS ts, sum(cn) AS tn FROM cl GROUP BY doc_id),
      |ah AS (SELECT c.doc_id AS id,
      |  coalesce(bit_or(CASE WHEN cs * tn > ts * cn THEN
      |    (CASE WHEN cell = 63 THEN -9223372036854775808
      |          ELSE 1::BIGINT << CAST(cell AS INTEGER) END) END), 0) AS ahash,
      |  CAST(min(tn) AS BIGINT) AS n_px
      |  FROM cl c JOIN tot USING (doc_id) GROUP BY c.doc_id)""".stripMargin

  private[graft] val WORDS_CTE =
    """WITH t AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM documents)""".stripMargin

  /** DuckDB replica of [[graft.operators.TextAnalysis.gopherQuality]]'s
    * per-doc measures (CTE `m`) — shared by the t_gopher_quality oracle
    * and the d_pipeline_e2e composition. */
  private[graft] val GOPHER_CTES =
    s"""WITH t AS (SELECT doc_id, text,
       |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w,
       |  string_split_regex(text, '\\r?\\n') AS ln FROM documents),
       |m AS (SELECT doc_id,
       |  CAST(len(w) AS BIGINT) AS n_words,
       |  CASE WHEN len(w) > 0 THEN
       |    CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)), (a, b) -> a + b) AS DOUBLE) / len(w)
       |  ELSE 0.0 END AS mean_len,
       |  CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g'))
       |    + 3 * len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
       |    / greatest(length(text), 1) AS sym_ratio,
       |  CAST(len(list_filter(ln, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE)
       |    / greatest(len(ln), 1) AS bullet_ratio,
       |  CAST(len(list_filter(ln, l -> regexp_matches(trim(l), '\\.\\.\\.$$'))) AS DOUBLE)
       |    / greatest(len(ln), 1) AS ellipsis_ratio,
       |  CASE WHEN len(w) > 0 THEN
       |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(w)
       |  ELSE 0.0 END AS alpha_frac
       |  FROM t)""".stripMargin

  /** The Gopher pass verdict on CTE `m`'s UNtruncated measures. */
  private[graft] val GOPHER_PASS =
    """n_words >= 50 AND n_words <= 100000 AND
      |   mean_len >= 3.0 AND mean_len <= 10.0 AND
      |   sym_ratio < 0.1 AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3 AND
      |   alpha_frac >= 0.8""".stripMargin

  private[graft] val SHINGLE_CTES =
    s"""$WORDS_CTE,
       |s AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh FROM t)""".stripMargin

  /** DuckDB replica of [[graft.operators.Similarity]]'s PQ subvector
    * slice: subspace `sub` of 4 contiguous equal slices (1-based
    * inclusive list slicing). */
  private[graft] def pqSubSql(arr: String, sub: String): String =
    s"$arr[(($sub)*(len($arr)//4)+1):((($sub)+1)*(len($arr)//4))]"

  /** DuckDB replica of [[graft.operators.Clustering]]'s sequential-fold
    * squared-L2 — same left-to-right double accumulation as Spark's
    * `aggregate(zip_with(...))`, so distances are bit-identical. */
  private[graft] def l2Sql(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
       | i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))),
       | (x,y) -> x + y)""".stripMargin

  private[graft] def cosSql(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x + y)
       | / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x + y))
       |   * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x + y)))""".stripMargin
}
