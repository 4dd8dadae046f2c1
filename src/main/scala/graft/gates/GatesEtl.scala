package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphBuilder, GraphStore, PropertyGraph}

/** ETL dataflow gates (§2.B: the Go pipeline's flatten/parse/catalog/sink surface, the paged-API connector, file-format roundtrips).
  *
  * Split from the former single-object SparkEntry (round 14) — a pure
  * refactor: every entry body is byte-identical, gate names and oracle
  * SQL unchanged; [[SparkEntry]] composes the family maps back together.
  */
private[graft] object GatesEtl extends GateFamily {
  import GateSupport._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // B9 — map inversion (groupBy-agg): segment → sorted distinct nations,
    // the permission→roles inversion of main.go:873-895.
    "b09_invert_map" -> ((s, dir) => {
      t(s, dir, "customer").join(t(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(concat_ws(",", sort_array(collect_set(col("n_name")))).as("nations"))
        .select(col("segment"), col("nations"))
    }),

    // B1 LIVE — the paginated connector reading over REAL HTTP: an
    // in-process loopback fixture (PagedApiFixture) serves the
    // deterministic user corpus with zero egress, the DSv2 reader
    // fetches one page per partition through HttpPageTransport (retry +
    // pacing hooks active; interval 0 for the gate), and the oracle
    // recomputes the fixture's row formula in SQL — live ingestion is
    // driver-gated, not just spec-tested. The sf dir is unused: the
    // "table" is the API.
    "b01_paged_http_ingest" -> ((s, dir) => {
      val url = sources.PagedApiFixture.baseUrl
      s.read.format("graft.sources.PagedApiSource")
        .option("url", s"$url?pages=6").option("pages", 6)
        .option("pageSize", 50).option("minIntervalMs", 0)
        .load()
    }),

    // B1 MAPPED SHAPE — the same live connector reading a SECOND entity
    // kind (groups) through the itemsKey/fields options instead of the
    // built-in users shape: the reference walks six entity kinds with one
    // pagination discipline (main.go:221-713), and the field mapping is
    // what makes one DSv2 connector cover them all. The fixture's group
    // objects carry an extra unprojected field (`kind`), so extra-field
    // tolerance is proven on the live path too. Oracle = the fixture's
    // groups row formula in SQL.
    "b02_paged_groups_ingest" -> ((s, dir) => {
      val url = sources.PagedApiFixture.groupsUrl
      s.read.format("graft.sources.PagedApiSource")
        .option("url", s"$url?pages=4").option("pages", 4)
        .option("pageSize", 25).option("minIntervalMs", 0)
        .option("itemsKey", "groups")
        .option("fields", "groupEmail:string,directMembers:long,adminCreated:boolean")
        .load()
    }),

    // B1 MINTED CREDENTIAL — the full reference credential walk under the
    // oracle: the connector MINTS its own access token via the OAuth2
    // JWT-bearer grant (RS256 assertion signed with the fixture
    // service-account key, exchanged at the fixture's verifying /token
    // endpoint — main.go:745-776's JWTConfigFromJSON + Subject shape),
    // reads the token-guarded corpus, and REFRESHES mid-walk: uses=4
    // kills the first token after page 4 of 6, so the 401→re-mint→retry
    // path is exercised inside the gated run, not just the spec. Serial
    // token-walk mode keeps the request (and so mint) order
    // deterministic. Oracle = the same corpus formula as b01.
    "b03_paged_oauth_ingest" -> ((s, dir) => {
      s.read.format("graft.sources.PagedApiSource")
        .option("url", s"${sources.PagedApiFixture.oauthUsersUrl}?pages=6&uses=4")
        .option("mode", "token")
        .option("pages", 6).option("pageSize", 50).option("minIntervalMs", 0)
        .option("tokenUrl", sources.PagedApiFixture.tokenUrl)
        .option("oauthIssuer", "fixture-sa@example.test")
        .option("oauthScope", "directory.readonly")
        .option("oauthSubject", "admin@example.test")
        .option("oauthKey", sources.PagedApiFixture.privateKeyPem)
        .load()
    }),

    // B11 — active filter: lifecycle filter analogue (main.go:722).
    "b11_filter_active" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // B5 — nested policy explode: nation→bindings[role→members[]] built and
    // double-exploded back (getGCS/getIamPolicy shape, main.go:436-516).
    "b05_policy_explode" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(collect_list(col("c_name")).as("members"))
        .groupBy(col("c_nationkey"))
        .agg(collect_list(struct(col("c_mktsegment").as("role"), col("members"))).as("bindings"))
        .select(col("c_nationkey").as("nationkey"), explode(col("bindings")).as("b"))
        .select(col("nationkey"), col("b.role").as("role"), explode(col("b.members")).as("member"))
    }),

    // B6/B7 — member string parse + type dispatch with allUsers special
    // case (main.go:463-492, 563-566).
    "b06_member_dispatch" -> ((s, dir) => {
      val m = t(s, dir, "customer").select(col("c_custkey").as("custkey"),
        when(col("c_custkey") % 97 === 0, lit("allUsers"))
          .otherwise(concat(lower(col("c_mktsegment")), lit(":"), col("c_name"))).as("member"))
      val parts = split(col("member"), ":")
      m.select(col("custkey"),
        when(size(parts) === 2, parts.getItem(0)).otherwise(lit("group")).as("member_type"),
        when(size(parts) === 2, parts.getItem(1)).otherwise(col("member")).as("email"))
    }),

    // B7 — JSON property parse from the events stream table.
    "b07_json_props" -> ((s, dir) => {
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
    }),

    // J3 — VARIANT shredding (Spark 4's semi-structured type): props
    // parses ONCE into the binary variant encoding, then typed paths
    // extract WITHOUT re-parsing the JSON text per access — the
    // store-semi-structured-columns-at-scale answer (b07 is the
    // string-function twin that re-parses per extraction). variant_get
    // throws on a type mismatch; try_variant_get on an absent path yields
    // NULL (pinned by n_miss = count(non-null) = 0 per group).
    "j3_variant_shred" -> ((s, dir) => {
      val v = parse_json(col("props"))
      events(s, dir)
        .select(col("event_type"),
          variant_get(v, "$.k", "long").as("k"),
          try_variant_get(v, "$.missing", "string").as("miss"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          sum(when(pmod(col("k"), lit(2)) === 0, 1L).otherwise(0L)).as("n_even"),
          count(col("miss")).as("n_miss"))
    }),

    // B8 — three-scope catalog union (org/project/global role scans,
    // main.go:630-646) with an array-typed permissions column.
    "b08_scope_union" -> ((s, dir) => {
      val p = t(s, dir, "part")
      def scan(scope: String, pred: Column) = p.filter(pred).select(
        lit(scope).as("scope"), col("p_partkey").as("partkey"),
        size(split(col("p_type"), " ")).cast("long").as("n_perms"))
      scan("global", col("p_size") <= 10)
        .unionByName(scan("org", col("p_size") > 10 && col("p_size") <= 30))
        .unionByName(scan("project", col("p_size") > 30))
    }),

    // B8 (array form) — a retained ARRAY<STRING> permissions column
    // (init.groovy:4 LIST cardinality): filter on the array, then explode
    // it back to rows. The array exists only inside the plan — the gate
    // output is scalar columns (the driver comparator cannot canonicalize
    // array cells). Tokens come from p_name (the multi-word column in
    // this corpus; p_type is single-word) so the gate proves the array
    // path on rows > 0.
    "b08b_perm_array" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey").as("partkey"), split(col("p_name"), " ").as("perms"))
        .filter(array_contains(col("perms"), "red"))
        .select(col("partkey"), size(col("perms")).cast("long").as("n_perms"),
          explode(col("perms")).as("perm"))
    }),

    // B10 — deterministic dedup: first order per (custkey, status) by rank.
    "b10_dedup_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey").as("custkey"), col("o_orderstatus").as("status"),
          col("o_orderkey").as("orderkey"))
    }),

    // B12 — template render: the reference's row→groovy emitter
    // (main.go:205-211) as a codegen'd format_string.
    "b12_template_render" -> ((s, dir) => {
      t(s, dir, "region").select(format_string(
        "g.addV('region').property(label,'region').property('name','%s').property('rkey','%d')",
        col("r_name"), col("r_regionkey")).as("stmt"))
    }),

    // ORC round trip: documents written as ORC (the other columnar
    // container Spark ships a vectorized reader for), read back, and
    // reduced to a per-lang fingerprint (count, char mass, md5 hash-sum).
    // The oracle computes the same fingerprint straight from the parquet
    // table, so the ORC write∘read must be an exact identity.
    // Schema evolution under mergeSchema: snapshot v1 lacks `source`,
    // snapshot v2 adds a new `rev` column — the read must union the
    // schemas, NULL-fill the gaps, and lose nothing (the crawl-over-
    // crawl reality at 100 TB: column sets drift between ingests). The
    // per-lang fingerprint proves both halves and both schema deltas
    // survived the merged read.
    "j2_schema_evolution" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = java.nio.file.Files.createTempDirectory("graft-evo").toString
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$path/v1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
          col("source"), lit(2L).as("rev"))
        .write.mode("overwrite").parquet(s"$path/v2")
      // The NULL-filled probe counts on `rev`, which v2 writes as the
      // LITERAL 2 — so rev IS NULL holds exactly for v1 rows by
      // construction, matching the oracle's doc_id parity predicate
      // structurally. (Counting source IS NULL would agree only while
      // the source column happens to contain no NULLs of its own.)
      s.read.option("mergeSchema", "true").parquet(s"$path/v1", s"$path/v2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("rev").isNull.cast("long")).as("n_null_filled"),
          sum(coalesce(col("rev"), lit(0L))).as("rev_mass"),
          sum(col("n_chars")).as("char_mass"))
    }),

    // Hive-partitioned write∘read identity PLUS pruning: documents land
    // partitionBy(lang), the read-back filters one language — at 100 TB
    // this layout turns a full-corpus scan into one directory's scan
    // (the filter must become a PartitionFilter, asserted by
    // PlanShapeSpec, not merely a row filter). Same text-mass digest as
    // o1 proving the partitioned writer moved every byte.
    "o3_partition_prune" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = java.nio.file.Files.createTempDirectory("graft-part").toString
      docs.write.mode("overwrite").partitionBy("lang").parquet(path)
      s.read.parquet(path).filter(col("lang") === "en")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("char_mass"),
          sum(functions.Hashing.md5Long(col("text")) % lit(1000000000000L))
            .as("text_hash_sum"))
    }),

    // Parquet BLOOM-FILTER point lookup: orders written UNSORTED (rows
    // scrambled by a hash sort, so every row group's o_orderkey min/max
    // spans ~the whole key range and stats pruning is structurally
    // impossible) with a bloom filter on o_orderkey and small row
    // groups. The point lookup's pushed filter then reaches parquet-mr's
    // RowGroupFilter, whose bloom level drops whole row groups the keys
    // cannot be in — the 100 TB answer to "find 5 keys in an unsorted
    // corpus": O(row groups) bloom probes instead of a full scan, no
    // sort, no shuffle, no external index. StorageAndExportSpec proves
    // the footer carries the filter, that absent keys reject groups, and
    // that omitting the option leaves no index; this gate proves the
    // lookup through the real Spark scan is exact (keys chosen so some
    // exist at every SF and some never do).
    "o4_bloom_skipping" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val path = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(4)
        .sortWithinPartitions(functions.Hashing.md5Long(col("o_orderkey")))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_orderkey", "200000")
        .option("parquet.block.size", (256 * 1024).toString)
        .parquet(path)
      s.read.parquet(path)
        .filter(col("o_orderkey").isin(1L, 7L, 4099L, 65541L, 999999999L))
    }),

    // RUNTIME bloom-filter join (InjectRuntimeFilter) under the oracle:
    // the selective priority filter on orders builds a bloom of the
    // surviving order keys, and lineitem scans through
    // bloom_filter_might_contain BEFORE its exchange — fact rows the join
    // would discard never shuffle, the 100 TB semi-join reduction.
    // Thresholds are the knobs a deployment tunes (creation side under
    // 100MB; application-side floor 0 for the fixture sf); broadcast is
    // off because the optimization targets the SHUFFLE join regime (at
    // 100 TB the dim side is past broadcast size but its filtered keys
    // still fit a bloom). The query MATERIALIZES inside the conf scope
    // (localCheckpoint — batch gates otherwise execute after the gate fn
    // returns and restores the confs) and ASSERTS the injected
    // BloomFilterMightContain in its own optimized plan, so a Spark
    // upgrade that silently stops injecting turns the gate red rather
    // than quietly reverting to a full fact shuffle. Plan recorded in
    // PLANS.md; PlanShapeSpec pins the same shape plus parity with the
    // filter disabled.
    "o5_runtime_bloom_join" -> ((s, dir) => {
      withConfs(s,
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
        val li = t(s, dir, "lineitem")
        val urgent = t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
        val df = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity")).as("sum_qty"), // q1's typing: DOUBLE both sides
            money(sumExact(c4(col("l_extendedprice"), col("l_discount"))), 10000L)
              .as("revenue"))
        val hasBloom = df.queryExecution.optimizedPlan.exists(_.expressions.exists(
          _.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])))
        require(hasBloom, "o5: InjectRuntimeFilter did not inject a bloom " +
          "filter onto the lineitem side — check the runtime.bloomFilter " +
          "confs / join shape before trusting this gate's plan claim")
        // execute NOW, inside the conf scope; pinLocal (not localCheckpoint)
        // so the gated run leaves no cached blocks pinned in the block
        // manager (r15 ADVICE) — the result is a 3-row aggregate.
        pinLocal(df)
      }
    }),

    // SMALL-FILE COMPACTION — the table-maintenance operator every 100 TB
    // lake runs nightly and the one layout op the o-family still lacked:
    // a fragmented write (64 shuffle-scattered files — the shape a
    // high-parallelism streaming sink or over-partitioned job leaves
    // behind) is compacted to range-clustered files via
    // repartitionByRange(doc_id) + maxRecordsPerFile. The gate REQUIRES
    // the file counts (fragmented ≥ 32, compacted == 2) so a silent
    // no-op compaction is red, and the oracle is the o1 identity digest —
    // compaction must move every byte and invent none. Range clustering
    // is the point (vs coalesce): post-compaction files carry disjoint
    // doc_id min/max spans, so row-group pruning works on the id axis
    // where the fragmented layout's spans all overlapped.
    // AQE SKEW-JOIN SPLIT as a driver gate — the RUNTIME half of the
    // skew story promoted from PlanShapeSpec (commit b5e05f1) to the
    // oracle board, the o5 pattern: a shuffle join whose probe side
    // piles 60% of lineitem on ONE key (the reference's allUsers /
    // roles/owner hot memberships, main.go:463-489, are exactly this
    // shape) runs inside scoped thresholds, REQUIRES the skew-split
    // AQEShuffleRead in its own executed adaptive plan, and the DuckDB
    // oracle asserts the split was invisible in the rows. The final
    // groupBy is on `w` (NOT the join key), so the join output carries
    // no required distribution and OptimizeSkewedJoin is free to split
    // without forceApply. The pad column exists to push the hot
    // partition past the scoped threshold at sf0.001; it must APPEAR in
    // the aggregate (pad_len) or column pruning drops it below the join
    // and the 16-byte (k,v) rows never cross the threshold.
    "o7_aqe_skew" -> ((s, dir) => {
      withConfs(s,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
        // coalescing would merge the splits right back below visibility
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true") {
        val vExpr = col("l_orderkey").cast("long") * 10 + col("l_linenumber")
        // repartition(16): AQE splits a skewed reduce partition at
        // MAP-OUTPUT granularity, and the single-file sf fixture scans
        // as ONE map task — an unsplittable hot partition no matter its
        // size. A production fact scan has hundreds of map tasks; this
        // restores that granularity for the fixture.
        val fact = t(s, dir, "lineitem").repartition(16).select(
          when(col("l_orderkey") % 10 < 6, lit(0L))
            .otherwise(col("l_orderkey") % 1000).cast("long").as("k"),
          vExpr.as("v"),
          // incompressible pad: skew detection reads COMPRESSED shuffle
          // sizes, so a constant pad vanishes under LZ4 and the hot
          // partition never crosses the threshold at sf0.001
          concat(md5(vExpr.cast("string")),
            md5((vExpr + 1).cast("string"))).as("pad"))
        val dim = t(s, dir, "part").select(
          (col("p_partkey") % 1000).cast("long").as("k"),
          ((col("p_partkey") % 1000) % 7).cast("long").as("w")).distinct()
        val df = fact.join(dim, "k")
          .groupBy(col("w"))
          .agg(count(lit(1)).as("cnt"), sum(col("v") * col("w")).as("dot"),
            max(length(col("pad"))).as("pad_len"))
        val out = pinLocal(df) // execute NOW, inside the conf scope
        val finalPlan = df.queryExecution.executedPlan.toString
        require(finalPlan.contains("skewed"),
          "o7: no skew-split AQEShuffleRead in the executed adaptive " +
            "plan — the 60%-hot-key join did not trigger " +
            "OptimizeSkewedJoin under the scoped thresholds:\n" + finalPlan)
        out
      }
    }),

    "o6_compaction" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def parquetFiles(p: String): Int =
        new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
      val frag = java.nio.file.Files.createTempDirectory("graft-frag")
      val compacted = java.nio.file.Files.createTempDirectory("graft-compact")
      try {
        docs.repartition(64).write.mode("overwrite").parquet(frag.toString)
        val nFrag = parquetFiles(frag.toString)
        require(nFrag >= 32,
          s"o6: expected a fragmented layout (>=32 files), got $nFrag — " +
            "the compaction gate needs something to compact")
        s.read.parquet(frag.toString)
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(compacted.toString)
        val nComp = parquetFiles(compacted.toString)
        require(nComp == 2,
          s"o6: compaction produced $nComp files, expected 2 — the " +
            "rewrite did not consolidate the fragments")
        // Digest executes NOW (pinLocal) so BOTH temp trees can be deleted
        // in the finally — the r15 board leaked one full parquet copy of
        // documents per gated run because the lazily-returned plan still
        // read `compacted` (r15 ADVICE; same leak class as the r14
        // stageReplayFeed fix).
        pinLocal(s.read.parquet(compacted.toString)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("char_mass"),
            sum(functions.Hashing.md5Long(col("text")) % lit(1000000000000L))
              .as("text_hash_sum")))
      } finally { deleteRecursively(frag); deleteRecursively(compacted) }
    }),

    // BROADCAST JOIN under the oracle — "is this join broadcast-able,
    // and did I broadcast it": the star-shape fact⋈dim⋈dim rollup must
    // plan BOTH joins as BroadcastHashJoin with NO hint — Spark's own
    // size estimation (parquet stats under autoBroadcastJoinThreshold)
    // has to make the call, so a future stats regression that silently
    // degrades the dimension joins to shuffles turns this gate red
    // instead of quietly tripling the exchange count at 100 TB. The
    // require also rejects any SortMergeJoin/ShuffledHashJoin in the
    // executed plan: the ONLY exchange allowed is the final aggregate's.
    "o9_broadcast_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val dim = t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name"))
      val df = cust.join(dim, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name").as("region_name"))
        .agg(count(lit(1)).as("n_customers"))
      val out = pinLocal(df) // execute NOW so the adaptive plan is final
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("BroadcastHashJoin"),
        "o9: no BroadcastHashJoin in the executed plan — Spark's size " +
          "estimation stopped broadcasting the dimension side:\n" + plan)
      require(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        "o9: a shuffle join appeared in what must be an all-broadcast " +
          "star plan:\n" + plan)
      out
    }),

    // DYNAMIC PARTITION OVERWRITE — the incremental-backfill primitive
    // every partitioned 100 TB lake leans on: restating ONE partition
    // (here: a repair that drops the odd doc_ids of the min-lang
    // partition) must rewrite ONLY that partition. Under the default
    // STATIC mode the same overwrite TRUNCATES the whole table to the
    // batch — the classic data-loss foot-gun this mode exists to fix.
    // The gate REQUIRES the untouched partitions keep their exact files
    // (name+size+mtime census — a rewrite mints new part-UUID names),
    // and the oracle recomputes the post-restatement table from source.
    "o8_dynamic_overwrite" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tgt = docs.agg(min(col("lang"))).head().getString(0)
      val base = java.nio.file.Files.createTempDirectory("graft-dynover")
      try {
        withConfs(s, "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
          docs.write.partitionBy("lang").mode("overwrite").parquet(base.toString)
          def census(): Map[String, Set[(String, Long, Long)]] =
            new java.io.File(base.toString).listFiles()
              .filter(f => f.isDirectory && f.getName.startsWith("lang=")
                && f.getName != s"lang=$tgt")
              .map(d => d.getName -> d.listFiles()
                .filter(_.getName.endsWith(".parquet"))
                .map(f => (f.getName, f.length, f.lastModified)).toSet)
              .toMap
          val before = census()
          require(before.nonEmpty, "o8: need at least one untouched partition")
          docs.filter(col("lang") === tgt && col("doc_id") % 2 === 0)
            .write.partitionBy("lang").mode("overwrite").parquet(base.toString)
          require(census() == before,
            "o8: dynamic partition overwrite rewrote untouched partitions " +
              "— the incremental restatement touched the whole table")
          pinLocal(s.read.parquet(base.toString)
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_chars")).as("char_mass"),
              sum(functions.Hashing.md5Long(col("text")) % lit(1000000000000L))
                .as("text_hash_sum")))
        }
      } finally deleteRecursively(base)
    }),

    "o1_orc_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = java.nio.file.Files.createTempDirectory("graft-orc").toString
      docs.write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("lang"))
        // the 60-bit md5 is folded to 12 decimal digits before summing:
        // Σ of raw 2⁶⁰ hashes overflows int64 within ~500 docs
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("char_mass"),
          sum(functions.Hashing.md5Long(col("text")) % lit(1000000000000L))
            .as("text_hash_sum"))
    }),

    // CSV round trip with an EXPLICIT read schema (inference off — the
    // 100 TB rule: schema drift must fail loudly, not silently retype a
    // column), same text-mass digest as o1 proving byte fidelity through
    // quoting/escaping.
    "o2_csv_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = java.nio.file.Files.createTempDirectory("graft-csv").toString
      docs.write.mode("overwrite").option("header", "true").csv(path)
      s.read.schema(docs.schema).option("header", "true").csv(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("char_mass"),
          sum(functions.Hashing.md5Long(col("text")) % lit(1000000000000L))
            .as("text_hash_sum"))
    }),

    // JSONL corpus interchange round trip: documents export as
    // newline-delimited JSON (the training-data wire format) and read
    // back under an EXPLICIT schema in FAILFAST mode — a corrupt line in
    // an export path is a bug, not data. The oracle is the source table:
    // strings and longs survive JSON exactly, so identity proves both
    // directions.
    "j1_jsonl_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-j1").toString
      sources.JsonlCorpus.write(docs, s"$tmp/docs")
      sources.JsonlCorpus.read(s, s"$tmp/docs", docs.schema, mode = "FAILFAST")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // the JSONL round trip is the identity on exact types
    "j1_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    "b09_invert_map" ->
      """SELECT c_mktsegment AS segment,
        |array_to_string(list_sort(list_distinct(list(n_name))), ',') AS nations
        |FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY c_mktsegment""".stripMargin,

    // the fixture's row formula, recomputed without HTTP: 6 pages × 50
    "b01_paged_http_ingest" -> pagedFixtureOracleSql,

    // the SAME corpus served behind the minted-token guard: the grant,
    // the mid-walk refresh, and the guarded reads must be invisible in
    // the rows — b01's formula is the oracle verbatim
    "b03_paged_oauth_ingest" -> pagedFixtureOracleSql,

    // the groups fixture's row formula (4 pages × 25), recomputed without
    // HTTP — the mapped-shape twin of b01
    "b02_paged_groups_ingest" ->
      """SELECT 'grp' || n || '@example.test' AS groupEmail,
        |  CAST(n % 17 AS BIGINT) AS directMembers,
        |  (n % 3 = 0) AS adminCreated,
        |  CAST(n // 25 AS INTEGER) AS page,
        |  CAST(n % 25 AS INTEGER) AS idx
        |FROM (SELECT unnest(generate_series(0, 99)) AS n)""".stripMargin,

    "b11_filter_active" ->
      """SELECT o_orderpriority AS priority, count(*) AS cnt FROM orders
        |WHERE o_orderstatus = 'O' GROUP BY o_orderpriority""".stripMargin,

    // the bloom-filtered join must be invisible in the rows: plain
    // urgent-orders revenue rollup, exact-cents discipline
    "o5_runtime_bloom_join" ->
      s"""SELECT l_returnflag, count(*) AS cnt,
         |  sum(l_quantity) AS sum_qty,
         |  CAST(sum(${c4Sql("l_extendedprice", "l_discount")}) AS DOUBLE) / 10000.0 AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY l_returnflag""".stripMargin,

    // the skew split must be invisible in the rows: plain hot-key join
    // rollup, grouped off the join key
    "o7_aqe_skew" ->
      """SELECT w, count(*) AS cnt, CAST(sum(v * w) AS BIGINT) AS dot,
        |  CAST(max(length(pad)) AS INTEGER) AS pad_len
        |FROM (SELECT CASE WHEN l_orderkey % 10 < 6 THEN 0
        |               ELSE l_orderkey % 1000 END AS k,
        |             l_orderkey * 10 + l_linenumber AS v,
        |             md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR))
        |               || md5(CAST(l_orderkey * 10 + l_linenumber + 1 AS VARCHAR)) AS pad
        |      FROM lineitem) f
        |JOIN (SELECT DISTINCT CAST(p_partkey % 1000 AS BIGINT) AS k,
        |             CAST((p_partkey % 1000) % 7 AS BIGINT) AS w
        |      FROM part) d USING (k)
        |GROUP BY w""".stripMargin,

    // compaction is an identity on the data: the o1 digest recomputed
    // from the source table
    "o6_compaction" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS char_mass,
        |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000000000)
        |    AS BIGINT) AS text_hash_sum
        |FROM documents GROUP BY lang""".stripMargin,

    // the all-broadcast star rollup must be invisible in the rows
    "o9_broadcast_join" ->
      """SELECT r_name AS region_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    // the restated table recomputed from source: the min-lang partition
    // keeps only even doc_ids, every other partition is the identity
    "o8_dynamic_overwrite" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS char_mass,
        |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000000000)
        |    AS BIGINT) AS text_hash_sum
        |FROM documents
        |WHERE NOT (lang = (SELECT min(lang) FROM documents) AND doc_id % 2 = 1)
        |GROUP BY lang""".stripMargin,

    // The fingerprint recomputed straight from the parquet table — the
    // ORC write∘read on the Spark side must be an exact identity.
    "o1_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS char_mass,
        |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000000000)
        |    AS BIGINT) AS text_hash_sum
        |FROM documents GROUP BY lang""".stripMargin,

    // the bloom-indexed point lookup is the identity on the filtered keys
    "o4_bloom_skipping" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (1, 7, 4099, 65541, 999999999)""".stripMargin,

    // the o1 digest restricted to the pruned partition.
    "o3_partition_prune" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS char_mass,
        |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000000000)
        |    AS BIGINT) AS text_hash_sum
        |FROM documents WHERE lang = 'en' GROUP BY lang""".stripMargin,

    // same digest through the CSV writer/reader instead of ORC.
    "o2_csv_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS char_mass,
        |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000000000)
        |    AS BIGINT) AS text_hash_sum
        |FROM documents GROUP BY lang""".stripMargin,

    "b05_policy_explode" ->
      "SELECT c_nationkey AS nationkey, c_mktsegment AS role, c_name AS member FROM customer",

    "b06_member_dispatch" ->
      """SELECT c_custkey AS custkey,
        |CASE WHEN c_custkey % 97 = 0 THEN 'group' ELSE lower(c_mktsegment) END AS member_type,
        |CASE WHEN c_custkey % 97 = 0 THEN 'allUsers' ELSE c_name END AS email
        |FROM customer""".stripMargin,

    "b07_json_props" ->
      """SELECT event_type,
        |CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |count(*) AS cnt FROM events GROUP BY event_type""".stripMargin,

    "j3_variant_shred" ->
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  json_extract_string(props, '$.missing') AS miss FROM events)
        |SELECT event_type, count(*) AS cnt,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
        |  count(miss) AS n_miss
        |FROM e GROUP BY event_type""".stripMargin,

    "b08_scope_union" ->
      """SELECT CASE WHEN p_size <= 10 THEN 'global'
        |            WHEN p_size <= 30 THEN 'org' ELSE 'project' END AS scope,
        |p_partkey AS partkey, CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_perms
        |FROM part""".stripMargin,

    "b08b_perm_array" ->
      """SELECT p_partkey AS partkey,
        |CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_perms,
        |unnest(string_split(p_name, ' ')) AS perm
        |FROM part WHERE list_contains(string_split(p_name, ' '), 'red')""".stripMargin,

    "b10_dedup_rank" ->
      """SELECT o_custkey AS custkey, o_orderstatus AS status, min(o_orderkey) AS orderkey
        |FROM orders GROUP BY o_custkey, o_orderstatus""".stripMargin,

    "b12_template_render" ->
      """SELECT printf('g.addV(''region'').property(label,''region'').property(''name'',''%s'').property(''rkey'',''%d'')',
        |r_name, r_regionkey) AS stmt FROM region""".stripMargin,

    // even doc_ids land in v1 (no rev column → NULL-filled on merge),
    // odd ones in v2 with literal rev=2; the merged read must reproduce
    // exactly that NULL/mass pattern. The parity predicate here IS the
    // v1/v2 split rule, so the agreement is structural, not data-luck.
    "j2_schema_evolution" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_filled,
        |  CAST(2 * sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rev_mass,
        |  CAST(sum(n_chars) AS BIGINT) AS char_mass
        |FROM documents GROUP BY lang""".stripMargin,
  )
}
