package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Cap-precondition audit: the dedup/similarity oracles mirror the
    // UNCAPPED pipelines, which is exact only while no hot bucket exceeds
    // the 8192 cap at this sf. If a future corpus breaks that, the gates
    // would fail as a bare hash mismatch — surface the real cause loudly.
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val pre = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.array_min(
          org.apache.spark.sql.functions.transform(
            operators.Dedup.shingles(org.apache.spark.sql.functions.col("text")),
            s => functions.Hashing.md5Long(s, 1))).as("h1"))
        // NULL h1 = docs with <3 words; they never match ngramJaccard's
        // equi-join, so a flood of short docs is not a cap violation.
        .filter(org.apache.spark.sql.functions.col("h1").isNotNull)
      val capMsg = "capped Spark pipelines will hash-mismatch their " +
        "uncapped oracles; shrink the corpus or mirror the cap in SQL"
      val audits = Seq(
        ("lsh band buckets", operators.Dedup.lshOverflow(docs, "doc_id", "text"), capMsg),
        ("simhash band buckets",
          operators.Dedup.simhashOverflow(docs, "doc_id", "text", bits = 60), capMsg),
        ("ngram h1 prefilter", operators.Skew.bucketOverflow(pre, Seq("h1"), 8192), capMsg),
        // d_sparse_neighbors' term posting lists: cap 256 must be inactive
        // at oracle SFs (measured max 155 at sf0.001, 140 at sf0.01; the
        // cap is the sf0.1+ bench/scale path where no oracle runs).
        ("sparse term postings",
          operators.Skew.bucketOverflow(
            operators.TextAnalysis.sparsePostings(docs, "doc_id", "text", r = 5),
            Seq("term"), 256), capMsg),
        ("cosine label blocks", operators.Skew.bucketOverflow(embs, Seq("label"), 8192), capMsg),
        // m8b/m9b run capped hammingNearDup against uncapped oracle
        // cross-joins; degenerate fingerprints (uniform image → aHash 0,
        // short audio → all-zero high bands) make hot bands plausible,
        // so the image/audio band tables get the same audit as simhash.
        ("image aHash bands", operators.Dedup.hammingOverflow(
          operators.Multimodal.decodeBmpAHash(spark,
            operators.Multimodal.encodeBmp(spark, docs, "doc_id", "text")).toDF()
            .select(org.apache.spark.sql.functions.col("id"),
              org.apache.spark.sql.functions.col("ahash")),
          "id", "ahash"), capMsg),
        ("audio fingerprint bands", operators.Dedup.hammingOverflow(
          operators.Multimodal.audioDeltaFingerprint(spark,
            operators.Multimodal.encodeWav(spark, docs, "doc_id", "text"), frameLen = 8),
          "id", "afp"), capMsg),
        // d_shuffle_shard has NO cap and still matches its oracle when a
        // shard overflows — the violation is an OVERSIZED single-task
        // window sort, with its own remediation.
        ("shuffle-shard size", operators.Dedup.shardOverflow(docs, "doc_id", 8, 8192L),
          "the gate output still hash-matches its oracle, but a shard " +
            "outgrew a single window-sort task; resize with Dedup.shuffleShardAuto"))
      audits.foreach { case (what, audit, why) =>
        val n = audit.count()
        if (n > 0) System.err.println(
          s"[verify] CAP-AUDIT VIOLATION: $n hot $what bucket(s) exceed the " +
            s"8192 bound at this sf — $why")
      }
    } catch { case e: Throwable =>
      System.err.println(s"[verify] cap audit FAILED TO RUN (treat as a " +
        s"violation until re-run): ${e.getMessage}")
    }
    // libm-portability audit (ADVICE r11's secondary dq10 theory): the
    // ln-discipline gates floor ln(·)·10⁶ to integers, which assumes
    // Spark's Math.log and DuckDB's ln agree on THIS data. IEEE does
    // not mandate correctly-rounded log, so a term landing within ~1
    // ulp (~3e-9 at these magnitudes) of an integer boundary could
    // floor differently per engine. Probe the dq10 surprise terms'
    // distance to the nearest integer — loud when any value sits
    // within 1e-6, three orders of margin above a 1-ulp flip. (The
    // other ln sites — BM25 idf, zipf, perplexity — share the same
    // floor-micro discipline and coarser effective scales.)
    try {
        import org.apache.spark.sql.functions.{abs, col, count, lit, log, round}
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val ords = spark.read.parquet(s"$sfDir/orders.parquet")
        val nLi = li.count().toDouble   // counted once per table,
        val nOrd = ords.count().toDouble // reused for both columns
        def surprises(df: org.apache.spark.sql.DataFrame, c: String, n: Double) =
          df.groupBy(col(c).cast("string").as("v"))
            .agg(count(lit(1)).as("cnt"))
            .select((log(lit(n) / col("cnt")) * 1000000d).as("t"))
        val close = surprises(li, "l_linestatus", nLi)
          .unionByName(surprises(li, "l_returnflag", nLi))
          .unionByName(surprises(ords, "o_orderstatus", nOrd))
          .unionByName(surprises(ords, "o_orderpriority", nOrd))
          .select(abs(col("t") - round(col("t"))).as("d"))
          .filter(col("d") < 1e-6).count()
        if (close > 0) System.err.println(
          s"[verify] LN-BOUNDARY AUDIT: $close dq10 surprise term(s) sit " +
            "within 1e-6 of an integer floor boundary — a 1-ulp " +
            "Math.log-vs-DuckDB-ln difference could flip the gate; make " +
            "the surprise term integer-exact before trusting a red dq10")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] ln-boundary audit FAILED TO RUN " +
        s"(treat as unaudited until re-run): ${e.getMessage}")
    }
    // cents-precondition audit: SparkEntry.cents() turns every money
    // gate into sum-of-per-row-rounded-cents, which equals the
    // reference's round-after-sum meaning ONLY while the source columns
    // are 2dp-exact (then per-row rounding is the identity on x·100).
    // The 4e-9 measurement in the cents() doc is enforced HERE so a
    // future data regen emitting >2dp values fails loudly instead of
    // silently changing gate semantics while the parity check stays
    // green (both engines would apply the same now-lossy transform).
    try {
        import org.apache.spark.sql.functions.{abs, col, max, round}
        val centsCols = Seq(
          "lineitem" -> "l_extendedprice", "lineitem" -> "l_discount",
          "customer" -> "c_acctbal", "part" -> "p_retailprice",
          "orders" -> "o_totalprice", "events" -> "value")
        centsCols.foreach { case (table, c) =>
          // events must go through the gates' version-aware reader: its
          // parquet TIMESTAMP(NANOS) ts column makes a bare read throw on
          // Spark ≤4.0 without the legacy conf, and an audit that dies on
          // an unrelated column would silently skip the enforcement it
          // exists to provide.
          val df = if (table == "events") GateSupport.events(spark, sfDir)
                   else spark.read.parquet(s"$sfDir/$table.parquet")
          val d = df
            .select(abs(col(c) * 100 - round(col(c) * 100)).as("d"))
            .agg(max(col("d"))).head().getDouble(0)
          if (d > 1e-6) System.err.println(
            s"[verify] CENTS-PRECONDITION VIOLATION: $table.$c has values " +
              f"up to $d%.3g cents away from 2dp-exact — cents()-based " +
              "gates no longer mean round-after-sum; re-derive the money " +
              "discipline for this column before trusting green gates")
        }
    } catch { case e: Throwable =>
      System.err.println(s"[verify] cents-precondition audit FAILED TO RUN " +
        s"(money-gate 2dp precondition is UNVERIFIED): ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
