package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.{PropertyGraph, Traversal}

/** Scratch verification driver (not part of the driver contract). */
object Probe {
  /** A genuinely-local[32] session for the dev measurement blocks.
    * `getOrCreate()` after the smoke session exists would silently
    * return THAT session (master/extensions are create-time-only
    * configs), so every probe block must stop the old session first —
    * otherwise its "local[32]" timings actually run at local[8]. */
  private def fresh32(old: SparkSession,
                      extensions: Boolean = false): SparkSession = {
    old.stop()
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    val s2 = (if (extensions) b.config("spark.sql.extensions", "graft.GraftExtensions")
              else b).getOrCreate()
    require(s2.sparkContext.master == "local[32]",
      s"expected a fresh local[32] session, got ${s2.sparkContext.master}")
    s2.sparkContext.setLogLevel("ERROR")
    s2
  }
  def main(args: Array[String]): Unit = {
    // Simulate the round driver's smoke check: a PLAIN session (no graft
    // extensions, no warm store) calling SparkEntry.entry.
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[probe] entry() rows=$n (driver smoke-checks rows>0)")
    require(n > 0)

    // Cycle-safety goldens (kept from the round-1 ADVICE probes).
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst").withColumn("label", lit("in")).withColumn("weight", lit(1))
    val start = Seq(1L).toDF("id")
    val fix = Traversal.reachFix(edges, start).as[(Long, Long)].collect().toSet
    println(s"[probe] cyclic reachFix=$fix")
    require(fix == Set((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L)))

    val g = PropertyGraph(
      Seq((1L, "user", "a", Map("flag" -> "x")), (2L, "user", "b", Map.empty[String, String]))
        .toDF("id", "label", "key", "props"),
      Seq((1L, 2L, "in", 1)).toDF("src", "dst", "label", "weight"))
      .dropVertices(col("props").getItem("flag") === "x")
    require(g.vertices.count() == 1 && g.edges.count() == 0)
    println("[probe] null-safe drop cascade OK")

    // Plan dumps for PLANS.md (round 4): the capped LSH candidate join
    // and the fresh-read bucketed-catalog hop.
    if (args.contains("plans")) {
      val sfDir = "/root/testdata/sf0.01"
      println("[probe] === d_minhash_lsh (capped) plan ===")
      operators.Dedup.lshCandidates(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
        .explain("formatted")
      println("[probe] === a19 fresh-read bucketed hop plan ===")
      val full = graph.GraphBuilder.build(spark, sfDir)
      val sub = PropertyGraph(
        full.V.filter(col("label").isin("customer", "nation")),
        full.E.filter(expr(s"src div ${graph.GraphBuilder.B}") === 3))
      sources.GraphStorage.writeBucketedTables(spark, sub, db = "graft_probe", buckets = 8,
        location = Some(java.nio.file.Files.createTempDirectory("graft-probe").toString))
      val bg = sources.GraphStorage.loadBucketedTables(spark, "graft_probe")
      bg.out(bg.hasLabel("customer"), "in")
        .filter(col("label") === "nation")
        .groupBy(col("key")).agg(count(lit(1)).as("n_customers"))
        .explain("formatted")
    }
    // Dev-only connector-scaling measurement (SCALE.md round 14): the
    // paged connector's scale axis is PAGE COUNT, not the sf dir (the
    // gate corpus is fixture-served and constant-size). Batch: one
    // partition per page, so wall-clock should track pages/parallelism.
    // Stream: trigger count = pages/pagesPerTrigger — at a FIXED
    // pagesPerTrigger the cost is micro-batch scheduling, which is why
    // production sizes admission to the arrival rate (the proportional
    // row keeps trigger count constant across the 10× step).
    if (args.contains("paged-scale")) {
      val s2 = fresh32(spark)
      val url = sources.PagedApiFixture.baseUrl
      def time(pages: Int): Double = {
        val t0 = System.nanoTime()
        val n = s2.read.format("graft.sources.PagedApiSource")
          .option("url", s"$url?pages=$pages").option("pages", pages)
          .option("pageSize", 50).option("minIntervalMs", 0)
          .load().count()
        require(n == pages * 50L)
        (System.nanoTime() - t0) / 1e9
      }
      Seq(12, 120, 1200).foreach { p =>
        val best = (1 to 3).map(_ => time(p)).min
        println(f"[probe] paged batch  pages=$p%5d rows=${p * 50}%7d best=$best%.3f s")
      }
      def timeStream(pages: Int, perTrigger: Int): Double = {
        val tmp = java.nio.file.Files.createTempDirectory("probe-sw").toString
        val t0 = System.nanoTime()
        val q = s2.readStream.format("graft.sources.PagedApiSource")
          .option("url", s"$url?pages=$pages").option("pages", pages)
          .option("pageSize", 50).option("minIntervalMs", 0)
          .option("pagesPerTrigger", perTrigger)
          .load()
          .writeStream.format("parquet").option("path", s"$tmp/out")
          .option("checkpointLocation", s"$tmp/ck").outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      Seq((12, 2), (120, 2), (120, 20)).foreach { case (p, pt) =>
        val best = (1 to 3).map(_ => timeStream(p, pt)).min
        println(f"[probe] paged stream pages=$p%5d perTrigger=$pt%3d triggers=${p / pt}%3d best=$best%.3f s")
      }
      s2.stop(); return
    }

    // Dev-only repro of the closureDoubling union/constraint analysis trap.
    if (args.contains("dbg")) {
      val chain = (0L until 63L).map(i => (i, i + 1))
      val e = chain.toDF("src", "dst")
      try {
        val n = Traversal.closureDoubling(e, maxIter = 8).count()
        println(s"[probe] closureDoubling chain count=$n (expect ${64 * 63 / 2})")
      } catch {
        case t: Throwable =>
          println(s"[probe] FAILED: ${t.getClass.getName}: ${t.getMessage}")
          t.printStackTrace()
      }
      spark.stop(); return
    }

    // Dev-only skew experiment: salted vs plain khop on a celebrity graph
    // (one vertex holding 20% of all edges). Records the SCALE.md numbers.
    if (args.contains("skew")) {
      val s2 = fresh32(spark)
      def tt[A](l: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe-skew] $l%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
      }
      // 25M edges, 80% on ONE vertex: the shape where the src-hash layout
      // serializes a hop into a single straggler task. The frontier stays
      // tiny (64 seeds, k=1), isolating the edge-side skew the salt
      // addresses — a large frontier is the case salting does NOT help
      // (replication cost scales with the frontier; measured 1.7× slower
      // at a 1M-pair frontier), which is why it is opt-in.
      val celeb = s2.range(1L, 20000001L).select(lit(0L).as("src"), col("id").as("dst"))
      val tail = s2.range(5000000L).select(
        (pmod(xxhash64(col("id"), lit(1)), lit(5000000L)) + 1L).as("src"),
        (pmod(xxhash64(col("id"), lit(2)), lit(5000000L)) + 1L).as("dst"))
      val edges = celeb.unionByName(tail).localCheckpoint()
      println(s"[probe-skew] edges=${edges.count()}")
      val start = s2.range(0L, 64L).select(col("id")) // includes the celebrity
      for (pass <- 1 to 2; salt <- Seq(0, 32)) {
        s2.conf.set("graft.hop.salt", salt.toString)
        tt(s"pass$pass khop k=1 salt=$salt")(
          Traversal.khop(edges, start, 1, dedupStart = false).count())
      }
      s2.conf.set("graft.hop.salt", "0")
      s2.stop(); return
    }

    // Dev-only breakdown of the g5 until-walk: hop-1 vs BFS vs read-out.
    if (args.contains("g5")) {
      sys.props("graft.verbose") = "1"
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark)
      def tt[A](l: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe-g5] $l%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
      }
      val g = tt("store")(graph.GraphStore.get(s2, dir))
      for (pass <- 1 to 2) {
        println(s"[probe-g5] --- pass $pass ---")
        val step = tt("step")(g.E.filter(col("label") === "in").select(col("src"), col("dst")))
        val startIds = g.hasLabel("lineitem").select(col("id")).distinct()
        val stopIds = g.V.filter(col("label") === "region").select(col("id"))
        val s1 = tt("s1 hop+distinct") {
          val d = startIds.join(step, col("id") === col("src"))
            .select(col("dst").as("id")).distinct()
          d.count(); d
        }
        val contStart = s1.join(stopIds, Seq("id"), "left_anti")
        val ePrime = step.join(stopIds.withColumnRenamed("id", "__stop"),
          col("src") === col("__stop"), "left_anti")
        val onward = tt("bfsDepth")(
          { val o = Traversal.bfsDepth(ePrime, contStart); o.count(); o })
        val endIds = tt("union+distinct") {
          val v = s1.unionByName(onward.select(col("id"))).distinct(); v.count(); v
        }
        tt("readout") {
          endIds.select(col("id").as("__end"))
            .join(g.V.as("v"), col("__end") === col("v.id"))
            .groupBy(col("v.label")).agg(count(lit(1))).count()
        }
      }
      s2.stop(); return
    }

    // Dev-only NN-descent rounds curve: recall@5 vs refinement rounds.
    if (args.contains("nnd")) {
      val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.01")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val exact = operators.Similarity.bruteForceTopK(
        emb, emb, "vec_id", "embedding", k = 5)
      for (r <- 0 to 4) {
        val approx = operators.Similarity.nnDescentTopK(
          emb, "vec_id", "embedding", k = 5, blocks = 16, rounds = r)
        val row = operators.Similarity.annRecall(exact, approx)
          .agg(sum(col("n_exact")), sum(col("n_hit"))).head()
        println(s"[probe] nnd rounds=$r hit=${row.getLong(1)}/${row.getLong(0)}")
      }
      spark.stop(); return
    }

    // Dev-only e21 cost split: exact side vs descent side vs the audit.
    if (args.contains("e21parts")) {
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark, extensions = true)
      def t[A](l: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] $l%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
      }
      val emb = s2.read.parquet(s"$dir/embeddings.parquet")
      for (i <- 1 to 2) {
        val exact = operators.Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 5)
        t(s"exact.count $i")(exact.count())
        val approx = operators.Similarity.nnDescentTopK(emb, "vec_id", "embedding",
          k = 5, blocks = 16, rounds = 1)
        t(s"approx.count $i")(approx.count())
        t(s"audit $i")(operators.Similarity.annRecall(exact, approx)
          .agg(sum(col("n_hit"))).head())
      }
      s2.stop(); return
    }

    // Dev-only breakdown of the x30 gate: topoLayers vs gate join/agg.
    if (args.contains("x30")) {
      sys.props("graft.verbose") = "1"
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark)
      def t[A](l: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] $l%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
      }
      val gs = t("GraphStore.get")(graph.GraphStore.get(s2, dir))
      (1 to 3).foreach { i =>
        val layered = t(s"topoLayers $i")(
          Traversal.topoLayers(gs.edges, prepEdges = false))
        t(s"gate join+agg+count $i")(
          layered.join(gs.vertices.select(col("id"), col("label")), Seq("id"))
            .groupBy(col("label"), col("layer"))
            .agg(count(lit(1)).as("n")).count())
      }
      s2.stop(); return
    }

    // Dev-only breakdown of the x32 corpus + doubling loop.
    if (args.contains("x32")) {
      sys.props("graft.verbose") = "1"
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark)
      import org.apache.spark.sql.expressions.Window
      def t[A](l: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] $l%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
      }
      val docs = s2.read.parquet(s"$dir/documents.parquet")
      val n = t("docs.count")(docs.count())
      val w = math.max(2L, n / 128L)
      val nodes = docs.select((row_number().over(Window.orderBy(col("doc_id")))
        - 1).cast("long").as("nid"))
      val edges = t("corpus gen")(
        { val e = nodes.select(col("nid").as("src"), (col("nid") + lit(w)).as("dst"))
            .filter(col("dst") < n).localCheckpoint(); e.count(); e })
      (1 to 3).foreach { i =>
        val layered = t(s"topoLayersDoubling $i")(
          GateSupport.withShufflePartitions(s2, 8) {
            Traversal.topoLayersDoubling(edges)
          })
        t(s"gate agg+count $i")(
          layered.groupBy(col("layer"))
            .agg(count(lit(1)).as("n_nodes"), sum(col("id")).as("id_sum")).count())
      }
      s2.stop(); return
    }

    // Dev-only: what does a bare spark.read.parquet (footer/schema read)
    // cost per call? ~650 gate executions each call t() 1-4 times.
    if (args.contains("readcost")) {
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark)
      // table("events") asserts this conf precedes its first inference
      s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      for (pass <- 1 to 3) {
        val t0 = System.nanoTime()
        (1 to 20).foreach { _ =>
          graph.GraphBuilder.table(s2, dir, "lineitem")
          graph.GraphBuilder.table(s2, dir, "events")
          graph.GraphBuilder.table(s2, dir, "documents")
        }
        println(f"[probe] 60 table() calls pass$pass ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        val t1 = System.nanoTime()
        (1 to 20).foreach { _ =>
          graph.GraphBuilder.table(s2, dir, "lineitem").count()
        }
        println(f"[probe] 20 lineitem counts pass$pass ${(System.nanoTime() - t1) / 1e9}%6.2f s")
      }
      s2.stop(); return
    }

    // Dev-only sw micro-batch anatomy: per-batch durationMs from the
    // streaming progress log, at varying state partition counts.
    if (args.contains("swprof")) {
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark)
      import org.apache.spark.sql.streaming.Trigger
      import s2.implicits._
      val base = GateSupport.events(s2, dir)
        .select(col("event_id"), col("event_type"), col("user_id")).persist()
      println(s"[probe] events rows=${base.count()} users=${base.select(col("user_id")).distinct().count()}")
      for (parts <- Seq(8, 8, 4, 2, 1)) {
        val tmp = java.nio.file.Files.createTempDirectory("probe-swp")
        val inDir = tmp.resolve("in")
        GateSupport.stageReplayFeed(inDir, (0 until 3).map { i =>
          base.filter(pmod(col("event_id"), lit(3)) === i)
            .select(col("event_type"), col("user_id"))
        })
        val feedSchema = base.select(col("event_type"), col("user_id")).schema
        val t0 = System.nanoTime()
        GateSupport.withConfs(s2,
          "spark.sql.streaming.stateStore.providerClass" ->
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
          "spark.sql.shuffle.partitions" -> parts.toString) {
          val q = streaming.EventPipeline.distinctUsers(
              s2.readStream.schema(feedSchema)
                .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
                .as[streaming.EventPipeline.TypedEvent]).toDF()
            .writeStream.format("memory").queryName(s"swp_$parts${System.nanoTime()}")
            .option("checkpointLocation", s"$tmp/ck")
            .outputMode("update").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          val qs = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
          qs.recentProgress.foreach { p =>
            println(s"[probe] parts=$parts batch=${p.batchId} total=${p.durationMs}")
          }
        }
        println(f"[probe] parts=$parts query wall ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        GateSupport.deleteRecursively(tmp)
      }
      s2.stop(); return
    }

    // Dev-only a14 peel-compose variants: shuffle_hash+ckpt (current) vs
    // broadcast+ckpt vs broadcast+lazy.
    if (args.contains("a14var")) {
      sys.props("graft.verbose") = "1"
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark)
      import org.apache.spark.storage.StorageLevel
      def t[A](l: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] $l%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
      }
      val gs = graph.GraphStore.get(s2, dir)
      val e0 = gs.edges.select(col("src"), col("dst"))
      for (pass <- 1 to 3) {
        println(s"[probe] --- pass $pass ---")
        val dstIds = e0.select(col("dst")).distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        val srcE = e0.join(dstIds.select(col("dst").as("src")), Seq("src"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val coreE = e0.join(dstIds.select(col("dst").as("src")), Seq("src"), "left_semi")
        val cCore = t("doublingBody(core)")(Traversal.doublingBody(coreE, 20))
        def ckptOut(df: org.apache.spark.sql.DataFrame) =
          org.apache.spark.sql.graft.CheckpointUtil.dropConstraints(df.localCheckpoint())
        def compose(hinted: org.apache.spark.sql.DataFrame) =
          srcE.select(col("src").as("origin"), col("dst").as("node"))
            .unionByName(
              srcE.join(hinted, srcE("dst") === hinted("origin"))
                .select(srcE("src").as("origin"), hinted("node").as("node")))
            .distinct()
        val v = pass match {
          case 1 =>
            val out = t("compose shuffle_hash+ckpt")(ckptOut(compose(cCore.hint("shuffle_hash"))))
            t("count (cached)")(out.count())
          case 2 =>
            val out = t("compose broadcast+ckpt")(ckptOut(compose(broadcast(cCore))))
            t("count (cached)")(out.count())
          case _ =>
            val out = compose(broadcast(cCore))
            t("compose broadcast LAZY count")(out.count())
        }
        println(s"[probe] rows=$v")
        srcE.unpersist(false); dstIds.unpersist(false)
        s2.catalog.clearCache()
      }
      s2.stop(); return
    }

    // Dev-only a25 UnionLoop task-count audit (optimization round 17):
    // counts tasks per stage while the gate's recursion executes, proving
    // the scoped shuffle-partition conf reaches the UnionLoop stages (the
    // r16 claim was that it can't; it can when the gate materializes
    // inside the scope). Prints a task-count histogram over all stages.
    if (args.contains("a25tasks")) {
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark)
      val counts = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      s2.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          counts.merge(sc.stageInfo.numTasks, 1, Integer.sum)
      })
      graph.GraphStore.get(s2, dir) // store load outside the audit
      counts.clear()
      val n = SparkEntry.queries("a25_sql_recursive")(s2, dir).count()
      Thread.sleep(500) // let the last stage-completed events drain
      println(s"[probe] a25 rows=$n; stage task-count histogram (tasks -> stages):")
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(s"[probe]   $k tasks x $v stages") }
      s2.stop(); return
    }

    // Dev-only breakdown of the a14 gate: store load vs closure vs count.
    if (args.contains("a14")) {
      sys.props("graft.verbose") = "1"
      val dir = "/root/testdata/sf0.1"
      val s2 = fresh32(spark)
      def t[A](l: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"[probe] $l%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
      }
      val gs = t("GraphStore.get")(graph.GraphStore.get(s2, dir))
      (1 to 3).foreach { i =>
        val c = t(s"closure() build $i")(gs.closure())
        t(s"count $i")(c.count())
      }
    }
    spark.stop()
  }
}
