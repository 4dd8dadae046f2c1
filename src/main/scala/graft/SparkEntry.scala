package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphBuilder, GraphStore, PropertyGraph}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with equivalent DuckDB SQL in `oracleSql`.
  *
  * The property graph is built from the TPC-H-ish testdata by treating its
  * FK structure as the reference's containment graph (SURVEY.md §7.1):
  * customer —in→ nation —in→ region; orders —in→ customer;
  * lineitem —in→ orders|part|supplier — mirroring the reference's
  * user —in→ group —in→ role —in→ project chain (README.md:20-33).
  */
object SparkEntry {

  private val B = GraphBuilder.B // 72057594037927936 = 2^56, id stride per label
  // memory-sink names must be session-unique; gates can run twice per session
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraphBuilder.table(s, dir, name)

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
  private def cents(c: Column): Column =
    when(c >= 0, floor(c * 100 + lit(0.5)))
      .otherwise(-floor(-c * 100 + lit(0.5))).cast("long")
  /** Order-invariant sum of exact integer units (widened past BIGINT). */
  private def sumExact(units: Column): Column = sum(units.cast("decimal(38,0)"))
  /** Revenue term price·(1−disc) in exact 10⁻⁴-dollar units. */
  private def c4(price: Column, disc: Column): Column =
    cents(price) * (lit(100L) - cents(disc))
  /** Exact integer units → DOUBLE dollars: one IEEE division both engines
    * perform identically on identical inputs — no round() anywhere. */
  private def money(unitsSum: Column, scale: Long): Column =
    unitsSum.cast("double") / lit(scale.toDouble)

  /** Oracle-side (DuckDB SQL) twins of cents/c4 — the same
    * half-away-from-zero branch, so both engines round identically on
    * any sign. */
  private def centsSql(c: String): String =
    s"CAST(CASE WHEN $c >= 0 THEN floor($c * 100 + 0.5) " +
      s"ELSE -floor(-$c * 100 + 0.5) END AS BIGINT)"
  private def c4Sql(price: String, disc: String): String =
    s"${centsSql(price)} * (100 - ${centsSql(disc)})"

  /** PagedApiFixture.pageBody's row formula in SQL — shared by b01 (batch
    * HTTP ingest) and sw22 (streamed ingest), both at 6 pages × 50. */
  private val pagedFixtureOracleSql: String =
    """SELECT 'fix' || n || '@example.test' AS email,
      |  CAST(n // 50 AS INTEGER) AS page,
      |  CAST(n % 50 AS INTEGER) AS idx,
      |  (n % 5 = 0) AS isExternal
      |FROM (SELECT unnest(generate_series(0, 299)) AS n)""".stripMargin

  /** The symmetrized supplier–nation–region containment graph — the
    * x11/x14/x21 family's shared input. */
  private def snrUndirected(s: SparkSession, dir: String): DataFrame = {
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

  /** Flagship query on /root/testdata/sf0.001: which customers reach which
    * region in ≤2 hops — the README.md:20-33 indirect-access chain
    * transposed onto the testdata. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    khop2Regions(spark, "/root/testdata/sf0.001")

  private def khop2Regions(s: SparkSession, dir: String,
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
        try graph.Traversal.khop(g.E.filter(col("label") === "in"),
          g.hasLabel("customer"), 2, prepEdges = true, dedupStart = false)
        finally s.conf.set("graft.hop.salt", prev)
      }
    val regions = g.hasLabel("region")
      .select(col("id").as("rid"), col("props").getItem("name").as("region_name"))
    reached.join(regions, reached("node") === regions("rid"))
      .select((col("origin") - lit(3L * B)).as("custkey"), col("region_name"), col("hop"))
  }

  // ------------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1 — vertex scan: census of the whole vertex set by label.
    "a01_vertex_count_by_label" -> ((s, dir) => {
      GraphStore.get(s, dir).V.groupBy("label").agg(count(lit(1)).as("cnt"))
    }),

    // A2 — label filter: g.V().hasLabel('customer').
    "a02_label_filter" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.hasLabel("customer").select(
        col("key").cast("long").as("custkey"),
        col("props").getItem("name").as("name"))
    }),

    // A3 — property predicate: .has('mktsegment','BUILDING').
    "a03_property_predicate" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.has("customer", "mktsegment", "BUILDING")
        .select(col("key").cast("long").as("custkey"))
    }),

    // Gremlin text surface: the reference's console query shape
    // (README.md:344) parsed and run verbatim by gremlin.GremlinLite —
    // lowers to the same filters/joins as the fluent API.
    "g1_gremlin_text" -> ((s, dir) => {
      gremlin.GremlinLite.run(GraphStore.get(s, dir),
        "g.V().hasLabel('customer').has('mktsegment','BUILDING').out('in').id()")
    }),

    // The reference's Cytoscape export session typed verbatim
    // (README.md:369-380): label-less outE() over all edges, side-effect
    // subgraph capture, cap() yielding the console's vertex/edge census.
    "g2_subgraph_census" -> ((s, dir) => {
      gremlin.GremlinLite.run(GraphStore.get(s, dir),
        "sg = g.V().outE().subgraph('sg').cap('sg').next()")
    }),

    // as()/select(): the tutorial path-projection idiom — label two
    // traversal positions, emit one (c_id, n_id) row per surviving path.
    // Lowers to the same hop join as the fluent API plus one tag
    // join-back (GremlinLite.hop's path-preserving branch).
    "g3_select_pairs" -> ((s, dir) => {
      gremlin.GremlinLite.run(GraphStore.get(s, dir),
        "g.V().hasLabel('customer').has('mktsegment','BUILDING').as('c')" +
          ".out('in').as('n').select('c','n')")
    }),

    // path(): full visit history per surviving path — customer → nation
    // → region ids in hop order. Only path()-bearing queries pay the
    // per-hop history tagging.
    "g4_path" -> ((s, dir) => {
      gremlin.GremlinLite.run(GraphStore.get(s, dir),
        "g.V().hasLabel('customer').has('mktsegment','BUILDING')" +
          ".out('in').out('in').path()")
    }),

    // repeat().until()/emit(): the reference flagship's canonical Gremlin
    // spelling (README.md:20-33 — walk out() until the target label) as
    // console text. From every lineitem, walk containment edges until a
    // region, keeping intermediates (emit()), then the console census.
    // Variable-depth branches: lineitem→supplier→nation→region (3 hops)
    // and lineitem→orders→customer→nation→region (4 hops) both terminate
    // at the same stop label; part is a dead end. Lowers to the
    // cycle-safe set closure (Traversal.reachFix) — the walk the
    // reference's recursive getGroupMembers loops forever on.
    "g5_repeat_until" -> ((s, dir) => {
      gremlin.GremlinLite.run(GraphStore.get(s, dir),
        "g.V().hasLabel('lineitem').repeat(out('in'))" +
          ".until(hasLabel('region')).emit().groupCount().by(label)")
    }),

    // A20 — point lookup by (label, key).
    "a20_point_lookup" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.lookup("customer", "42").select(col("id"), col("label"), col("key"))
    }),

    // A7 — out-edge expansion: all out-edges of nation vertices.
    "a07_out_edges" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.outE(g.hasLabel("nation")).select(col("src"), col("dst"), col("label"), col("weight"))
    }),

    // A8 — edge-target semi-join: orders having ≥1 incoming lineitem edge.
    "a08_edge_semi_join" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val orders = g.hasLabel("orders")
      orders.join(g.E, orders("id") === g.E("dst"), "left_semi")
        .select(col("key").cast("long").as("orderkey"))
    }),

    // A4 — not-exists guard (anti form): orders with NO incoming edge.
    "a04_not_exists_guard" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val orders = g.hasLabel("orders")
      orders.join(g.E, orders("id") === g.E("dst"), "left_anti")
        .select(col("key").cast("long").as("orderkey"))
    }),

    // A10 — adjacency (1-hop out): customers' neighbors.
    "a10_adjacency" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.out(g.hasLabel("customer"))
        .select((col("from_id") - lit(3L * B)).as("custkey"),
          col("label").as("neighbor_label"),
          col("props").getItem("name").as("neighbor_name"))
    }),

    // A13 — bounded k-hop: customers reaching regions in ≤2 hops.
    "a13_khop2_regions" -> ((s, dir) => khop2Regions(s, dir)),

    // A13b — a13 through the salted (skew-aware) hop join; identical rows
    // against the same oracle prove the skew path correct end-to-end.
    "a13b_khop_salted" -> ((s, dir) => khop2Regions(s, dir, salted = true)),

    // A24 — the SALTED hop join itself under the driver oracle: a13b's
    // auto probe correctly measures 0 on the unskewed containment walk
    // (and takes the plain path), so this gate builds a genuinely skewed
    // hub graph — 3 hub vertices each owning ~|lineitem|/3 edges — and
    // runs the hop at the MEASURED auto width, floored at 2: the salted
    // explode+equi-join is guaranteed to execute under the oracle at ANY
    // session parallelism (the auto threshold is relative to E/P, so a
    // P=4 session would measure 0 and silently oracle-check the plain
    // path instead — SkewSpec pins the decision at both parallelisms).
    "a24_khop_salted_hub" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (lit(9L * B) + col("l_suppkey") % 3).as("src"),
        (lit(8L * B) + col("l_orderkey")).as("dst"))
      val start = s.range(3).select((lit(9L * B) + col("id")).as("id"))
      val width = math.max(graph.Traversal.autoSaltBuckets(edges), 2)
      val prev = s.conf.get("graft.hop.salt", "0")
      s.conf.set("graft.hop.salt", width.toString)
      // khop materializes eagerly (one localCheckpoint job), so the conf
      // flip is scoped here — the a13b pattern
      try graph.Traversal.khop(edges, start, 1, prepEdges = true, dedupStart = false)
        .select(col("origin"), col("node"), col("hop").cast("long").as("hop"))
      finally s.conf.set("graft.hop.salt", prev)
    }),

    // A14 — cycle-safe transitive closure over the full graph, via
    // recursive doubling (log-diameter rounds; ≡ reachFix(V) — the
    // frontier form stays exercised by TraversalSpec + khop gates).
    "a14_reach_fixpoint" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.closure()
    }),

    // A6 — vertex upsert idempotence: re-upserting existing customers is a
    // no-op; upserting shifted-key orders inserts. Census proves both.
    "a06_upsert_vertices" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val existing = t(s, dir, "orders").select(
        (lit(3L * B) + col("o_custkey")).as("id"), lit("customer").as("label"),
        col("o_custkey").cast("string").as("key"),
        map(lit("name"), lit("dup")).as("props"))
      val fresh = t(s, dir, "orders").select(
        (lit(6L * B) + col("o_orderkey") + lit(10000000L)).as("id"), lit("orders").as("label"),
        (col("o_orderkey") + lit(10000000L)).cast("string").as("key"),
        map(lit("orderstatus"), lit("NEW")).as("props"))
      g.upsertVertices(existing.unionByName(fresh))
        .V.groupBy("label").agg(count(lit(1)).as("cnt"))
    }),

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

    // SW22 — STREAMING paged ingestion, run as a real Structured
    // Streaming query: the live HTTP connector as a micro-batch source
    // (offset = page number, 2 pages per trigger via admission control,
    // checkpointed so a restart resumes mid-corpus) against the loopback
    // fixture, drained with Trigger.AvailableNow — b01's incremental twin
    // and the reference's continuous-directory-sync shape. Oracle = the
    // same deterministic row formula.
    "sw22_stream_paged_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val url = sources.PagedApiFixture.baseUrl
      val tmp = java.nio.file.Files.createTempDirectory("graft-sw22").toString
      val name = s"sw22_out_${sinkSeq.incrementAndGet()}"
      val q = s.readStream.format("graft.sources.PagedApiSource")
        .option("url", s"$url?pages=6").option("pages", 6)
        .option("pageSize", 50).option("minIntervalMs", 0)
        .option("pagesPerTrigger", 2)
        .load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$tmp/ck")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
    }),

    // B11 — active filter: lifecycle filter analogue (main.go:722).
    "b11_filter_active" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // M5 — TPC-H Q1-style aggregation. Base price in exact cents (the
    // cents/money discipline): the sum is order-invariant, so no
    // partial-agg order can flip a rounding tie.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          money(sumExact(cents(col("l_extendedprice"))), 100L).as("sum_base_price"),
          count(lit(1)).as("count_order"))
    }),

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

    // M6 — document fingerprint (md5) + exact-dup group size.
    "d_exact_dup_fingerprint" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), md5(col("text")).as("h"))
      val groups = d.groupBy(col("h")).agg(count(lit(1)).as("dup_count"))
      d.join(groups, "h").select(col("doc_id"), col("h"), col("dup_count"))
    }),

    // A5 — deterministic first-match fetch (.next(); min id).
    "a05_first_match" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.firstMatch("customer", "mktsegment", "BUILDING").select(col("id"), col("key"))
    }),

    // A9 — edge upsert: re-upserting nation→region edges is a no-op;
    // fresh orders→nation edges insert. Census by src label code proves it.
    "a09_upsert_edges" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val dup = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"),
        lit("in").as("label"), lit(1).as("weight"))
      val fresh = t(s, dir, "orders").select(
        (lit(6L * B) + col("o_orderkey")).as("src"),
        (lit(2L * B) + col("o_orderkey") % 25).as("dst"),
        lit("in").as("label"), lit(1).as("weight"))
      g.upsertEdges(dup.unionByName(fresh)).E
        .groupBy(expr(s"src div ${B}").as("src_label_code"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // A11 — valueMap projection: property map exploded to rows.
    "a11_valuemap_explode" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.hasLabel("part").select(col("id"), explode(col("props")))
        .select(col("id"), col("key").as("pkey"), col("value").as("pval"))
    }),

    // A12 — id projection.
    "a12_ids" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.ids(g.hasLabel("supplier"))
    }),

    // A15 — drop with cascade: remove lineitem vertices and their edges.
    "a15_drop_cascade" -> ((s, dir) => {
      val g = GraphStore.get(s, dir).dropVertices(col("label") === "lineitem")
      g.V.agg(count(lit(1)).as("n_vertices"))
        .crossJoin(g.E.agg(count(lit(1)).as("n_edges")))
    }),

    // A16 — edge-induced subgraph: edges into nations, incident vertices.
    "a16_subgraph" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.subgraph(expr(s"dst div ${B}") === 2)
        .vertices.groupBy("label").agg(count(lit(1)).as("cnt"))
    }),

    // A17 — GraphSON export: one stable JSON document per vertex.
    "a17_export_graphson" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      graph.GraphExport.graphsonVertices(PropertyGraph(g.hasLabel("region"), g.E))
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

    // ------------------------------------------------- M5 relational repertoire

    // Q3-style: top-10 unshipped-revenue orders for one segment. Join order
    // lets Catalyst broadcast the filtered customer dim into orders.
    "q3_top_revenue" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < lit("1997-06-01"))
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-06-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey").as("orderkey"))
        .agg(money(sumExact(c4(col("l_extendedprice"), col("l_discount"))), 10000L)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("orderkey"))
        .limit(10)
    }),

    // Q5-style: revenue by nation for one region (6-table join).
    "q5_region_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name").as("nation"))
        .agg(money(sumExact(c4(col("l_extendedprice"), col("l_discount"))), 10000L)
          .as("revenue"))
    }),

    // Window: top-3 customers by balance per segment.
    // Exact-integer percent_rank / cume_dist over per-nation balances:
    // rank handles ties (same balance → same rank), n_le counts the
    // RANGE frame through the tie group, and both read-outs are floored
    // integer divisions — no double percent ever materializes.
    "w4_percent_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wOrd = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"))
      val wAll = Window.partitionBy(col("c_nationkey"))
      t(s, dir, "customer")
        .select(col("c_custkey").as("custkey"),
          col("c_nationkey").as("nationkey"),
          rank().over(wOrd).cast("long").as("rnk"),
          count(lit(1)).over(wOrd.rangeBetween(
            Window.unboundedPreceding, Window.currentRow)).as("n_le"),
          count(lit(1)).over(wAll).as("n"))
        .select(col("custkey"), col("nationkey"), col("rnk"),
          when(col("n") > 1,
            expr("(rnk - 1) * 1000000L div (n - 1)")).otherwise(lit(0L))
            .as("pr_micro"),
          expr("n_le * 1000000L div n").as("cume_ppm"))
    }),

    "w1_window_top3" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer").withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("c_mktsegment").as("segment"), col("rank"),
          col("c_custkey").as("custkey"), col("c_acctbal").as("acctbal"))
    }),

    // Window: running total of order value per customer.
    "w2_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        money(sumExact(cents(col("o_totalprice"))).over(w), 100L)
          .as("running_total"))
    }),

    // Window: delta vs previous order of the same customer (lag).
    "w3_lag_delta" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      t(s, dir, "orders").select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2).as("delta"))
    }),

    // Global top-k with deterministic tiebreak.
    "k1_global_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey").as("orderkey"), col("o_totalprice").as("totalprice"))
        .limit(15)
    }),

    // Set op: customers that have orders AND are in BUILDING.
    "s1_intersect" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
        .intersect(t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey")))
    }),

    // Set op: BUILDING customers with no orders.
    "s2_except" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
        .except(t(s, dir, "orders").select(col("o_custkey").as("custkey")))
    }),

    // Rollup over (returnflag, linestatus).
    "r1_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // Cube over (orderstatus, orderpriority).
    "r2_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // Grouping sets via the SQL surface.
    "r3_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM li_gs
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")
    }),

    // Scalar string/math functions over a dimension.
    "f1_scalar_string_math" -> ((s, dir) => {
      t(s, dir, "nation").select(
        col("n_nationkey").as("nationkey"),
        upper(substring(col("n_name"), 1, 3)).as("prefix"),
        length(col("n_name")).cast("long").as("name_len"),
        concat_ws("-", col("n_name"), col("n_regionkey")).as("tagged"),
        abs(col("n_nationkey") - 12).as("dist12"),
        (col("n_nationkey") % 5).as("mod5"),
        round(pow(lit(2.0), col("n_regionkey")), 1).as("pow2r"),
        round(sqrt(col("n_nationkey")), 4).as("sqrtk"))
    }),

    // Scalar date functions over orders.
    "f2_scalar_dates" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey").as("orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
        date_add(col("o_orderdate"), 30).as("due_date"),
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"))
    }),

    // Exact distinct count per group.
    "cd1_count_distinct" -> ((s, dir) => {
      t(s, dir, "customer").groupBy(col("c_mktsegment").as("segment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"))
    }),

    // Approximate distinct (HLL++), SELF-EVALUATING (the cd7 pattern):
    // HLL register content is engine-specific, so the raw estimate can
    // never hash-match a foreign oracle — instead the exact count rides
    // the same row and the gate emits the error-bound VERDICT. hll_ok
    // flips (and the hash breaks) if the sketch drifts past 5% relative
    // (5x its configured 1% rsd) or 5 absolute for tiny groups; the
    // oracle recomputes the exact counts and asserts the verdict true.
    "cd2_approx_distinct" -> ((s, dir) => {
      t(s, dir, "orders").groupBy(col("o_orderpriority").as("priority"))
        .agg(approx_count_distinct(col("o_custkey"), 0.01).as("__approx"),
          countDistinct(col("o_custkey")).as("exact_customers"))
        .select(col("priority"), col("exact_customers"),
          (abs(col("__approx") - col("exact_customers")) <=
            greatest(col("exact_customers") / 20, lit(5L))).as("hll_ok"))
    }),

    // KMV distinct sketch: engine-portable approximate distinct (md5 order
    // statistics + IEEE arithmetic) — the oracled twin of cd2's HLL. Runs
    // the bounded-state Aggregator (k longs per group map-side); the
    // declarative window form in Sketch.kmvDistinct is its spec'd equal.
    "cd3_kmv_distinct" -> ((s, dir) => {
      operators.Sketch.kmvDistinctAgg(
        t(s, dir, "orders").select(col("o_orderpriority").as("priority"), col("o_custkey")),
        "priority", "o_custkey", k = 64)
    }),

    // Engine-portable table checksums (XOR of md5 row hashes): the
    // one-number-per-table comparison a migration validation needs.
    "cd4_row_checksum" -> ((s, dir) => {
      def ck(table: String, cols: Seq[String]) =
        operators.Sketch.rowChecksum(t(s, dir, table), cols)
          .select(lit(table).as("tbl"), col("checksum"))
      ck("nation", Seq("n_nationkey", "n_name", "n_regionkey"))
        .unionByName(ck("region", Seq("r_regionkey", "r_name")))
        .unionByName(ck("part", Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size")))
    }),

    // Count-min-sketch heavy hitters over the corpus word stream: depth=4
    // x width=16 cells (width deliberately smaller than the vocabulary so
    // collisions — the sketch's one-sided error — are visible), words
    // whose estimate reaches 1000 occurrences, exact count joined in.
    // md5-celled, so the whole sketch hash-matches cross-engine.
    "cd5_countmin_heavy" -> ((s, dir) => {
      val words = t(s, dir, "documents")
        .select(explode(operators.Dedup.tokens(col("text"))).as("word"))
      operators.Sketch.countMinHeavy(words, "word", threshold = 1000L,
        depth = 4, width = 16)
    }),

    // Q4-style EXISTS: orders with a returned lineitem, by priority.
    "q4_exists_agg" -> ((s, dir) => {
      val returned = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // Q17-style correlated scalar: revenue of small-quantity outlier lines
    // vs each part's own average.
    "q17_avg_quantity_outliers" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val avgQ = li.groupBy(col("l_partkey").as("pk"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(avgQ, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(money(sumExact(cents(col("l_extendedprice"))), 700L).as("avg_yearly"))
    }),

    // HAVING: segments with more than 15% of customers. The total is a
    // broadcast 1-row aggregate joined into the plan — one job, no
    // driver-side count() action.
    "h1_having" -> ((s, dir) => {
      val total = t(s, dir, "customer").agg(count(lit(1)).as("total"))
      t(s, dir, "customer").groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt") > col("total") * 0.15)
        .select(col("segment"), col("cnt"))
    }),

    // Pivot: customer counts, nation rows x fixed segment columns.
    "p1_pivot" -> ((s, dir) => {
      t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // Unpivot/melt — pivot's inverse: the four lineitem measures reshaped
    // wide→long to (measure, value) rows. Spark's native `unpivot` lowers
    // to an Expand projection: zero shuffle, 4× rows, codegen'd — the
    // reshape an eval/metrics table needs before a generic groupBy(measure).
    "p2_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey").as("orderkey"),
          col("l_linenumber").cast("long").as("linenumber"),
          col("l_quantity").as("quantity"),
          col("l_extendedprice").as("extendedprice"),
          col("l_discount").as("discount"), col("l_tax").as("tax"))
        .unpivot(Array(col("orderkey"), col("linenumber")),
          Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
          "measure", "value")
    }),

    // P3 — native pivot (long → wide): per-returnflag row, one integer
    // quantity-sum column per linestatus. The values are PINNED (pivot
    // without them runs an extra distinct scan to discover columns, and
    // an unpinned column set is nondeterministic schema at 100 TB).
    "p3_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag").as("returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy(col("returnflag"))
        .pivot("l_linestatus", Seq("O", "F"))
        .sum("qty")
        .select(col("returnflag"), col("O").as("qty_o"), col("F").as("qty_f"))
    }),

    // R5 — ROLLUP hierarchy aggregate: (returnflag, linestatus) with
    // per-flag subtotals and a grand total in ONE pass (Expand feeds a
    // single aggregation — no self-union of scans); grouping_id
    // disambiguates NULL-as-subtotal from NULL data.
    "r5_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag").as("returnflag"),
          col("l_linestatus").as("linestatus"),
          col("l_quantity").cast("long").as("qty"))
        .rollup(col("returnflag"), col("linestatus"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().as("gid"))
    }),

    // cube completes the grouping-sets family next to r5's rollup: all
    // four (returnflag, linestatus) grouping combinations in ONE Expand
    // pass — 4× the pre-agg rows map-side, never a second scan.
    "r6_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag").as("returnflag"),
          col("l_linestatus").as("linestatus"),
          col("l_quantity").cast("long").as("qty"))
        .cube(col("returnflag"), col("linestatus"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().as("gid"))
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

    // Exact ROC-AUC (Mann–Whitney with midrank ties) of the Flesch
    // readability score as an is-English detector — "does this quality
    // signal actually rank the target class higher", fully rational.
    "ev1_roc_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = operators.TextAnalysis.readability(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          Seq("doc_id"))
      operators.Eval.rocAuc(scored, "flesch_micro", "is_en")
    }),

    // Reciprocal rank of BM25 retrieval: four single-term corpus-word
    // queries, relevance = a "title match" (the term among the doc's
    // first 5 words — deterministic and independent of the ranker's own
    // score), first relevant rank in the top-20 → rr_micro. The
    // ranking-quality eval over the t_bm25 machinery.
    "ev3_mrr" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val terms = Seq("spark", "join", "window", "batch")
      val ranked = terms.map { term =>
        operators.TextAnalysis.bm25TopK(docs, "doc_id", "text",
            query = Seq(term), k = 20)
          .withColumn("query", lit(term))
      }.reduce(_ unionByName _)
      val rel = docs.select(col("doc_id"),
          explode(array_distinct(slice(
            operators.TextAnalysis.tokens(col("text")), 1, 5))).as("query"))
        .filter(col("query").isin(terms.map(x => x: Any): _*))
      operators.Eval.mrr(ranked, rel, "query", "doc_id", "rank")
    }),

    // Precision@20 / recall@20 over the same four BM25 queries and the
    // same title-match relevance — the set-overlap eval next to ev3's
    // rank eval, all integer ratios.
    "ev4_precision_recall" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val terms = Seq("spark", "join", "window", "batch")
      val ranked = terms.map { term =>
        operators.TextAnalysis.bm25TopK(docs, "doc_id", "text",
            query = Seq(term), k = 20)
          .withColumn("query", lit(term))
      }.reduce(_ unionByName _)
      val rel = docs.select(col("doc_id"),
          explode(array_distinct(slice(
            operators.TextAnalysis.tokens(col("text")), 1, 5))).as("query"))
        .filter(col("query").isin(terms.map(x => x: Any): _*))
      operators.Eval.precisionRecallAtK(ranked, rel, "query", "doc_id", k = 20)
    }),

    // Decile lift/gains of the Flesch readability score as an is-English
    // ranker — ev1 asks "does the score order the class correctly"
    // (AUC), this asks the deployment question "if I keep only the top
    // k/10 of the corpus by this score, how much of the target class do
    // I capture": per-decile lift and cumulative gain, all integer
    // ratios over one deterministic ntile split.
    "ev5_lift_deciles" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = operators.TextAnalysis.readability(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          Seq("doc_id"))
      operators.Eval.liftDeciles(scored, "flesch_micro", "is_en", "doc_id")
    }),

    // Per-class precision/recall/F1 of the n-gram language identifier
    // against the labeled lang column — the class-resolved view of
    // ev2's single-number kappa over the same confusion cells; F1's
    // 2pr/(p+r) reduces to 2tp/(2tp+fp+fn), so every figure is one
    // integer division.
    "ev6_f1_per_class" -> ((s, dir) => {
      val cells = operators.TextAnalysis.langConfusion(
        t(s, dir, "documents"), "doc_id", "text", "lang")
      operators.Eval.f1PerClass(cells, "lang", "pred_lang", "cnt")
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

    // Cohen's κ between the langid heuristic and the labeled lang column
    // — chance-corrected agreement over the t_lang_confusion cells,
    // integer sufficient statistics + one sign-explicit micro division.
    "ev2_cohens_kappa" -> ((s, dir) => {
      operators.Eval.cohenKappa(
        operators.TextAnalysis.langConfusion(
          t(s, dir, "documents"), "doc_id", "text", "lang"),
        "lang", "pred_lang", "cnt")
    }),

    // Fuzzy match: region-name pairs by edit distance.
    "f3_fuzzy_levenshtein" -> ((s, dir) => {
      val a = t(s, dir, "region").select(col("r_name").as("name_a"))
      val b = t(s, dir, "region").select(col("r_name").as("name_b"))
      a.crossJoin(b).filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
        .filter(col("dist") <= 6)
    }),

    // NULL handling: nullif/coalesce/null-safe equality.
    "f4_null_handling" -> ((s, dir) => {
      val status = nullif(col("o_orderstatus"), lit("O"))
      t(s, dir, "orders").select(
        col("o_orderkey").as("orderkey"),
        coalesce(status, lit("OPEN")).as("status_or_open"),
        status.isNull.as("was_open"),
        (status <=> lit("F")).as("is_f_nullsafe"))
    }),

    // Q22-style: above-average-balance customers with no orders. The
    // average is a broadcast 1-row aggregate in the same plan (no
    // driver-side .first() round-trip), then anti-join.
    "q22_dormant_accounts" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      // bal > avg(bal) as the exact cross-multiplied integer comparison
      // bal_cents·n > Σbal_cents — avg(double) would depend on partial-sum
      // order; this cannot. Both sides decimal-widened (the sumExact
      // discipline): a LongType sum/product would wrap silently at scale
      // while the oracle's HUGEINT never does.
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(sumExact(cents(col("c_acctbal"))).as("bal_sum_c"), count(lit(1)).as("n_pos"))
      val finished = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      cust.crossJoin(broadcast(avgBal))
        .filter(cents(col("c_acctbal")).cast("decimal(38,0)") * col("n_pos")
          > col("bal_sum_c"))
        .join(finished, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("cnt"),
          money(sumExact(cents(col("c_acctbal"))), 100L).as("total_bal"))
    }),

    // Q7-style volume shipping: revenue between one nation pair (both
    // directions) by ship year — the classic two-role nation join (the
    // 25-row dimension joins twice under different names).
    "q7_volume_shipping" -> ((s, dir) => {
      val cn = t(s, dir, "nation")
        .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
      val sn = t(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(cn, col("c_nationkey") === col("cnk"))
        .join(sn, col("s_nationkey") === col("snk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(money(sumExact(c4(col("l_extendedprice"), col("l_discount"))), 10000L)
          .as("revenue"))
    }),

    // Q8-style market share: one supplier nation's share of AMERICA-
    // customer revenue by order year, floor-micro over the pinned
    // 2dp-rounded sums (the q14 exactness pattern).
    "q8_market_share" -> ((s, dir) => {
      val vol = c4(col("l_extendedprice"), col("l_discount"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation").select(col("n_nationkey").as("cnk"),
          col("n_regionkey")), col("c_nationkey") === col("cnk"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation").select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation")), col("s_nationkey") === col("snk"))
        .filter(col("r_name") === "AMERICA")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          money(sumExact(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0L))),
            10000L).as("nation_volume"),
          money(sumExact(vol), 10000L).as("total_volume"))
        // both operands are bit-identical doubles derived from exact
        // integers, so the floored ratio is engine-exact too
        .withColumn("share_micro",
          floor(lit(1000000d) * col("nation_volume") / col("total_volume")).cast("long"))
    }),

    // Q6-style forecast-revenue delta: one scan, all predicates pushed to
    // the parquet scan, single scalar aggregate — the pure-filter probe.
    "q6_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01") &&
          col("l_shipdate") < lit("1999-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        // price_cents·disc_hundredths is the exact 10⁻⁴-dollar term
        .agg(money(sumExact(cents(col("l_extendedprice")) * cents(col("l_discount"))),
          10000L).as("revenue"))
    }),

    // Q10-style returned-item report: top 20 customers by revenue lost to
    // returns in one quarter (4-table join; nation joined for the name).
    "q10_returned_items" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-07-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey").as("custkey"), col("c_name").as("name"),
          col("n_name").as("nation"))
        .agg(money(sumExact(c4(col("l_extendedprice"), col("l_discount"))), 10000L)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("custkey"))
        .limit(20)
    }),

    // Q12-style late-shipment census (this schema has no shipmode/commit
    // columns, so "late" = shipped > 90 days after the order date): per
    // order priority, how many lineitems shipped late vs on time.
    "q12_late_shipments" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          sum(when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, 1L)
            .otherwise(0L)).as("late_count"),
          sum(when(datediff(col("l_shipdate"), col("o_orderdate")) <= 90, 1L)
            .otherwise(0L)).as("ontime_count"))
    }),

    // Q14-style promotion effect: PROMO-part revenue share for one ship
    // year, in floor-micro units over the 2dp-rounded sums (the division
    // happens after both operands are pinned, so it is engine-exact).
    "q14_promo_effect" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01") && col("l_shipdate") < lit("1999-01-01"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          money(sumExact(when(col("p_type") === "PROMO",
            c4(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0L))), 10000L)
            .as("promo_revenue"),
          money(sumExact(c4(col("l_extendedprice"), col("l_discount"))), 10000L)
            .as("total_revenue"))
        .withColumn("promo_micro",
          floor(lit(1000000d) * col("promo_revenue") / col("total_revenue")).cast("long"))
    }),

    // Q18-style large-volume orders: orders whose total quantity clears a
    // threshold, with the customer attached. Quantities are integral
    // doubles, so the sums are order-invariant exact — no rounding needed.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 200)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
          col("o_orderkey").as("orderkey"), col("o_orderdate").as("orderdate"),
          col("total_qty"))
    }),

    // Q19-style discounted revenue under OR-of-AND part predicates — the
    // disjunctive-pushdown probe (each disjunct pairs a brand with a
    // quantity band, like the TPC-H original pairs brands with containers).
    "q19_branded_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#13" && col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#19" && col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#25" && col("l_quantity").between(20, 40)))
        .agg(money(sumExact(c4(col("l_extendedprice"), col("l_discount"))), 10000L)
          .as("revenue"))
    }),

    // ------------------------------------------- M6 training-data pipeline ops

    // MinHash signatures (4 hashes over word 3-gram shingles).
    "d_minhash_sig" -> ((s, dir) => {
      operators.Dedup.minhashSignature(t(s, dir, "documents"), "text", k = 4)
        .select(col("doc_id"), col("h1"), col("h2"), col("h3"), col("h4"))
    }),

    // MinHash + LSH banding: candidate near-dup pairs (4 bands x 2 rows).
    // Oracle parity note (also d_ngram_jaccard, d_dup_clusters): the
    // DuckDB oracles mirror the UNCAPPED pipeline; equivalence is exact
    // below the 8192 hot-bucket cap, which gate corpora never reach
    // (sf0.1 has 5000 docs). The capped path is OperatorsSpec-covered.
    "d_minhash_lsh" -> ((s, dir) => {
      operators.Dedup.lshCandidates(t(s, dir, "documents"), "doc_id", "text")
    }),

    // 16-bit SimHash fingerprint per document.
    "d_simhash" -> ((s, dir) => {
      operators.Dedup.simhash(t(s, dir, "documents"), "doc_id", "text")
    }),

    // SimHash hamming-ball near-dup join (Manku et al. WWW'07): 60-bit
    // fingerprints, 4 pigeonhole bands of 15 bits (lossless blocking —
    // a pair within Hamming 3 agrees exactly on some band), popcount
    // exact filter. The bitwise sibling of d_minhash_lsh's probabilistic
    // banding. 60 bits, not the operator's 48 default: the low-entropy
    // word-salad corpus clusters fingerprints, and wider bands keep the
    // band buckets thin (the cap stays as the backstop).
    "d_simhash_neardup" -> ((s, dir) => {
      operators.Dedup.simhashNearDup(t(s, dir, "documents"), "doc_id", "text", bits = 60)
    }),

    // Exact 3-gram Jaccard on 1-hash-prefiltered candidate pairs.
    "d_ngram_jaccard" -> ((s, dir) => {
      operators.Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text")
    }),

    // EXACT θ=0.8 shingle-Jaccard self-join with NO false negatives:
    // prefix filtering (AllPairs/PPJoin) under a rarest-shingle-first
    // global order — the deterministic complement of d_minhash_lsh's
    // probabilistic banding. The oracle is the brute-force all-pairs
    // join, so a hash match PROVES the lossless-blocking claim.
    "d_prefix_join" -> ((s, dir) => {
      operators.Dedup.prefixFilterJoin(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Asymmetric containment (|A∩B|/|A|, |A∩B|/|B|) over the same
    // candidate pairs — the quote/excerpt detector symmetric Jaccard
    // systematically under-scores.
    "d_ngram_containment" -> ((s, dir) => {
      operators.Dedup.ngramContainment(t(s, dir, "documents"), "doc_id", "text")
    }),

    // The 100 TB containment path: signature-only estimate (k longs + one
    // set-size scalar per doc cross the verification join, never the
    // shingle sets) — m/k agreement inverted through inclusion-exclusion.
    "d_containment_est" -> ((s, dir) => {
      operators.Dedup.containmentEstimate(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Estimator-quality audit (the e10 pattern for containment): the
    // signature estimate against the exact verifier on the pairs both
    // surface, reduced to one (n_pairs, mae, max-error) row in exact
    // 1e-4 integer units — the number that says whether the scale path
    // is trustworthy.
    "d_containment_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val est = operators.Dedup.containmentEstimate(docs, "doc_id", "text")
      val exact = operators.Dedup.ngramContainment(docs, "doc_id", "text")
      est.join(exact, Seq("id_a", "id_b"))
        .select(round(col("cont_ab_est") * 10000).cast("long").as("eu"),
          round(col("cont_ab") * 10000).cast("long").as("xu"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(abs(eu - xu)) div count(1)").as("mae_x10000"),
          max(abs(col("eu") - col("xu"))).as("max_x10000"))
    }),

    // LSH candidate-quality audit: exact Jaccard over every d_minhash_lsh
    // pair, reduced to one (n_candidates, n_true, precision) row at
    // threshold 0.5 — the number the band/row configuration is tuned by.
    "d_lsh_precision" -> ((s, dir) => {
      operators.Dedup.lshPrecision(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Brute-force exact cosine top-5 for a small query set (ANN baseline).
    "e1_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // Hard-negative mining (DPR/SimCSE data prep): per query the 5
    // hardest in-band negatives — cos in [0.15, 0.35), i.e. above the
    // easy-negative floor (~p90 of this corpus's cosine mass, so ~90%
    // of pairs drop BEFORE the top-k shuffle) and below the suspected-
    // positive ceiling. Broadcast queries, one corpus pass, fused
    // native cosine.
    "e16_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.hardNegatives(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, floor = 0.15, ceil = 0.35, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // Binary-quantized ANN: sign-bit signatures (64 dims → two packed
    // 32-bit words, a 32× memory cut vs float32) generate 20 Hamming
    // candidates per query, exact cosine reranks to top 5 — the
    // candidate scan never touches a float vector, the scale path for a
    // RAM-resident index over a 100 TB embedding corpus. Hamming is kept
    // in-row so e10-style recall audits can see why a miss missed.
    "e22_binary_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.hammingRerank(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, candidates = 20, k = 5, native = true)
    }),

    // IVF recall-vs-nprobe curve: the SAME deterministic iters=0 index
    // probed at nprobe ∈ {1, 2, 4}, each sweep point summarized as
    // corpus recall vs the exact top-3 — the dial chart an operator
    // reads before picking the serving nprobe (e4b fixes one point;
    // this prices the whole dial). Index builds once; three probes
    // share it.
    "e24_nprobe_curve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 20)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 3, native = true)
      val (cent, lists) = operators.Similarity.buildIvfIndex(
        emb, "vec_id", "embedding", nlist = 8, iters = 0)
      Seq(1, 2, 4).map { np =>
        val ap = operators.Similarity.ivfQueryIndex(
          cent, lists, qs, "vec_id", "embedding", k = 3, nprobe = np,
          native = true)
        operators.Similarity.annRecall(exact, ap)
          .agg(coalesce(sum(col("n_exact")), lit(0L)).as("n_exact"),
            coalesce(sum(col("n_hit")), lit(0L)).as("n_hit"))
          .select(lit(np.toLong).as("nprobe"), col("n_exact"), col("n_hit"),
            expr("n_hit * 1000000L div n_exact").as("recall_ppm"))
      }.reduce(_ unionByName _)
    }),

    // The binary path's OTHER dial: recall vs candidate-pool size at
    // fixed 64 bits — candidates ∈ {10, 20, 40}, one corpus-recall row
    // per point. Completes the ANN price-chart trio (e21: descent
    // rounds, e24: IVF nprobe, e25: Hamming pool) — each dial costs
    // integer work only until the rerank, so widening the pool is the
    // cheap recall lever.
    "e25_candidates_curve" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5, native = true)
      Seq(10, 20, 40).map { c =>
        val ap = operators.Similarity.hammingRerank(
          emb, qs, "vec_id", "embedding", dim = 64, candidates = c, k = 5,
          native = true)
        operators.Similarity.annRecall(exact, ap)
          .agg(coalesce(sum(col("n_exact")), lit(0L)).as("n_exact"),
            coalesce(sum(col("n_hit")), lit(0L)).as("n_hit"))
          .select(lit(c.toLong).as("candidates"), col("n_exact"), col("n_hit"),
            expr("n_hit * 1000000L div n_exact").as("recall_ppm"))
      }.reduce(_ unionByName _)
    }),

    // Recall audit of the binary-quantized path (the e10 pattern): e22's
    // sign-bit Hamming candidates + cosine rerank vs the exact top-5 —
    // the number that prices the 32× memory cut in recall. Per-query
    // (n_exact, n_hit, recall) over the same 10 queries.
    "e23_binary_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5, native = true)
      val approx = operators.Similarity.hammingRerank(
        emb, qs, "vec_id", "embedding", dim = 64, candidates = 20, k = 5,
        native = true)
      operators.Similarity.annRecall(exact, approx)
    }),

    // kNN classifier eval: majority label of the 5 nearest corpus
    // neighbors vs the true label, per-label accuracy over a
    // deterministic 20% eval slice — the training-free embedding-quality
    // probe (see Similarity.knnClassify).
    "e13_knn_classify" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.knnClassify(
        emb, emb.filter(col("vec_id") % 10 < 2), "vec_id", "embedding", "label",
        k = 5, native = true)
    }),

    // Random-hyperplane LSH ANN: bucketed candidates, top-3 per query.
    "e2_lsh_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.lshTopK(
        emb, emb.filter(col("vec_id") < 50), "vec_id", "embedding", k = 3, bits = 4, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // NN-descent k-NN graph (graph-based ANN — the family HNSW lives in):
    // md5-block seed graph, ONE neighbors-of-neighbors refinement round,
    // exact rescoring. Deterministic end-to-end, so the oracle replays the
    // whole descent; O(N·k²) per round where all-pairs is O(N²).
    "e20_nn_descent" -> ((s, dir) => {
      operators.Similarity.nnDescentTopK(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 5, blocks = 16, rounds = 1, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // IVF ANN with the Lloyd-iterated float quantizer, SELF-EVALUATING
    // (the cd7 pattern): float centroid means make the per-query result
    // set engine-specific, so the gate scores it against the exact
    // brute-force top-k computed in the same plan and emits the recall
    // VERDICT — recall_ok flips (and the hash breaks) if probing 2 of 8
    // Lloyd cells ever recalls under 40% of the true top-3 (measured 55%
    // on the synthetic near-random embeddings at every SF; the bound
    // leaves 9 hits of float-summation-order slack). e4b keeps the
    // hash-exact per-row form on the seed-pinned (iters=0) quantizer.
    "e4_ivf_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 20)
      val approx = operators.Similarity.ivfTopK(
        emb, qs, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 2, native = true)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 3, native = true)
      operators.Similarity.annRecall(exact, approx)
        .agg(count(lit(1)).as("n_queries"), sum(col("n_exact")).as("n_exact"),
          (sum(col("n_hit")) * 5 >= sum(col("n_exact")) * 2).as("recall_ok"))
    }),

    // Deterministic IVF twin of e4 (the x2→x4 pattern): iters=0 pins the
    // coarse quantizer to the md5-seeded input vectors — exact doubles,
    // no float centroid means — so probe-and-rescore is hash-checkable
    // cross-engine while e4 keeps the Lloyd-iterated float form.
    "e4b_ivf_fixed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.ivfTopK(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 2, iters = 0, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // IVF index persisted AS TABLES and served from disk: build once
    // (iters=0 deterministic quantizer), write centroids + cid-
    // partitioned inverted lists to parquet, reload, query through the
    // reloaded index. Hash-matched against the SAME independent DuckDB
    // IVF replay as the in-memory e4b — proving the parquet round trip
    // (array<double> is lossless) and the partition-pruned serving path
    // (nprobe cells = nprobe directories) end to end.
    "e17_ivf_index_persist" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (centroids, lists) = operators.Similarity.buildIvfIndex(
        emb, "vec_id", "embedding", nlist = 8, iters = 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft-e17").toString
      centroids.write.mode("overwrite").parquet(s"$tmp/centroids")
      lists.write.mode("overwrite").partitionBy("cid").parquet(s"$tmp/lists")
      operators.Similarity.ivfQueryIndex(
        s.read.parquet(s"$tmp/centroids"), s.read.parquet(s"$tmp/lists"),
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 3, nprobe = 2, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // Product-quantization codes: m=4 subspaces x k=16 deterministic
    // (md5-seeded, iters=0) centroids — integer codes, hash-exact in any
    // engine; the compression half of the IVF+PQ serving architecture.
    // Gate emits the flat (vec_id, sub, code) triples (the e6 posexplode
    // convention: scalar rows at the gate boundary; pqCodes keeps the
    // array form for API callers).
    "e7_pq_codes" -> ((s, dir) => {
      operators.Similarity.pqCodesFlat(t(s, dir, "embeddings"), "vec_id", "embedding")
    }),

    // IVF + PQ asymmetric-distance search (FAISS IVFADC shape): probe 2
    // of 8 coarse cells, score candidates by query-subvector-to-codebook
    // reconstruction distance folded in subspace order (deterministic).
    "e8_ivfpq_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.ivfPqTopK(
        emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", kTop = 3)
        .select(col("query_id"), col("neighbor_id"), col("adist"), col("rank"))
    }),

    // Nearest-class-centroid assignment: exact integer micro-unit class
    // means (labelCentroids) + argmin squared-L2 per vector — the
    // label-purity audit, engine-exact end to end.
    "e9_centroid_assign" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = operators.Clustering.labelCentroids(emb, "embedding", "label")
      operators.Clustering.nearestCentroid(emb, cents, "vec_id", "embedding", "label")
    }),

    // One deterministic Lloyd update step (integer micro-units): seed from
    // class means, re-assign, emit each predicted cluster's re-computed
    // centroid as (clabel, dim, cv) — the oracle-able core of IVF codebook
    // training (kmeansLite is the float production twin).
    "e12_lloyd_step" -> ((s, dir) => {
      operators.Clustering.lloydStep(t(s, dir, "embeddings"), "vec_id", "embedding", "label")
    }),

    // ANN recall@5: LSH (bits=4) top-5 measured against the exact
    // brute-force top-5 over the same queries — the index-quality
    // evaluation, one row per query.
    "e10_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 10)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5, native = true)
      val approx = operators.Similarity.lshTopK(
        emb, qs, "vec_id", "embedding", k = 5, bits = 4, native = true)
      operators.Similarity.annRecall(exact, approx)
    }),

    // Estimator-quality audit for the descent (the e10 pattern): the
    // descent runs over the FULL corpus; the exact ground truth is built
    // for a deterministic md5 quarter-sample of queries (the x22b
    // sampled-pivot precedent — exact all-queries ground truth is the one
    // O(N²) term in the audit, and a fixed-hash sample keeps the estimate
    // unbiased and engine-reproducible). One summary row in integer micro
    // units: the number that says whether one round of neighbors-of-
    // neighbors is enough at this corpus, or more rounds are worth their
    // shuffles.
    "e21_nnd_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(
        graft.functions.Hashing.md5Long(col("vec_id"), 101) % 4 === 0)
      val exact = operators.Similarity.bruteForceTopK(
        emb, qs, "vec_id", "embedding", k = 5, native = true)
      val approx = operators.Similarity.nnDescentTopK(
        emb, "vec_id", "embedding", k = 5, blocks = 16, rounds = 1, native = true)
      operators.Similarity.annRecall(exact, approx)
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_exact")).as("n_exact"), sum(col("n_hit")).as("n_hit"))
        .withColumn("recall_micro", expr("n_hit * 1000000L div n_exact"))
    }),

    // Embedding-cosine near-dup pairs within coarse clusters (IVF blocking).
    "e3_cosine_neardup" -> ((s, dir) => {
      operators.Similarity.cosineNearDup(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label", threshold = 0.3,
        native = true)
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

    // Round-8 quality pipeline, composed in ONE plan: corpus LM ->
    // per-doc coverage -> percentile cutoff (drop the bottom quintile by
    // coverage) -> exclude docs carrying any cross-document duplicated
    // 8-token span. Every stage is separately oracled (t_lm_coverage,
    // t_quality_cut shape, d_substring_spans); this gate verifies the
    // CHAIN, one row per document.
    "d_pipeline_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = operators.TextAnalysis.ngramLm(docs, "text")
      val cov = operators.TextAnalysis.lmCoverage(docs, lm, "doc_id", "text")
        .select(col("doc_id"), col("coverage"))
      val cut = operators.Dedup.percentileCut(cov, "coverage", 0.2, exact = true)
      val dup = operators.Dedup.substringSpans(docs, "doc_id", "text")
        .select(col("doc_id")).distinct().withColumn("__dup", lit(true))
      cut.join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("coverage"), col("kept"),
          coalesce(col("__dup"), lit(false)).as("dup_doc"),
          (col("kept") && !coalesce(col("__dup"), lit(false))).as("final_keep"))
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

    // Deterministic pre-training shuffle: md5-ordered shard + position
    // assignment (reproducible on any engine/partitioning — no rand()).
    "d_shuffle_shard" -> ((s, dir) => {
      operators.Dedup.shuffleShard(t(s, dir, "documents"), "doc_id")
    }),

    // Auto-sized twin: nShards DERIVED from the corpus count
    // (max(minShards, ceil(n / maxShardRows))) — the production entry
    // point for un-sized corpora. maxShardRows=40 puts the 500-doc gate
    // corpus at 13 shards, so the gate proves the derivation, not the
    // minShards floor.
    "d_shuffle_shard_auto" -> ((s, dir) => {
      operators.Dedup.shuffleShardAuto(t(s, dir, "documents"), "doc_id",
        maxShardRows = 40L, minShards = 2)
    }),

    // Overflow audit twin: shards whose realized size exceeds the
    // caller's plan. nShards=2/maxShardRows=200 deliberately undersizes
    // the 500-doc corpus so the report is NON-empty — the gate proves
    // the audit fires, not that it stays silent.
    "d_shard_overflow" -> ((s, dir) => {
      operators.Dedup.shardOverflow(t(s, dir, "documents"), "doc_id",
        nShards = 2, maxShardRows = 200L)
    }),

    // Domain-mixture epoch realization (DoReMi-style): src0 upsampled
    // 2.5x, src1 downsampled 0.25x, everything else 1.0 — epochs by
    // deterministic md5 coin per (doc, epoch); pure projection+explode.
    "d_mixture" -> ((s, dir) => {
      operators.Dedup.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 0.25))
        .select(col("doc_id"), col("source"), col("epoch"))
    }),

    // Balanced per-domain quota: the 5 docs per source with smallest
    // (md5, id) — a deterministic stratified eval head.
    "d_stratified_head" -> ((s, dir) => {
      operators.Dedup.stratifiedHead(t(s, dir, "documents"), "doc_id", "source", n = 5)
        .select(col("doc_id"), col("source"))
    }),

    // Temperature-scaled mixture weights (UniMax τ=1/2): w_d ∝ √n_d,
    // normalized — micro-unit integer sum so the normalization is exact
    // and order-independent; one tiny agg, corpus never re-shuffles.
    "d_temperature_mix" -> ((s, dir) => {
      operators.Dedup.temperatureWeights(t(s, dir, "documents"), "source")
    }),

    // Bloom-bitset decontamination screen: 1024-bit filter, 3 md5 hashes,
    // benchmark = every 25th doc's text. bloom_hit is the constant-space
    // map-side flag; exact_hit the ground truth — the result exhibits the
    // no-false-negative invariant and the tunable false positives.
    "d_bloom_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Dedup.bloomDecontaminate(
        docs, docs.filter(col("doc_id") % 25 === 0), "doc_id", "text",
        mBits = 1024, kHashes = 3)
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

    // Matryoshka funnel ANN: coarse top-20 on the first 8 dims, exact
    // full-dim rescore to top-5 — the MRL coarse-to-fine serving shape
    // (prefix pass broadcast-joined, survivors-only full scoring).
    "e11_mrl_funnel" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.mrlFunnel(
        emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        dims = 8, coarseK = 20, k = 5, native = true)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }),

    // End-to-end pipeline composition: Gopher quality gate → exact-dup
    // canonicalization → 90/5/5 split → per-split doc/token totals.
    // Each stage is an already-oracled operator; this verifies the CHAIN.
    "d_pipeline_e2e" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val kept = docs.join(
        operators.TextAnalysis.gopherQuality(docs, "doc_id", "text")
          .filter(col("passes")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      // Window-min canonicalization, ONE pass over `kept` — the
      // groupBy+self-semi-join form would evaluate the regex-heavy
      // quality gate twice (same shape as d_exact_dup_fingerprint).
      val deduped = kept
        .withColumn("__mn", min(col("doc_id"))
          .over(Window.partitionBy(md5(col("text")))))
        .filter(col("doc_id") === col("__mn")).drop("__mn")
      operators.Dedup.trainValTestSplit(deduped, "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(operators.TextAnalysis.tokens(col("text"))).cast("long"))
            .as("total_tokens"))
    }),

    // Multimodal: opaque blob + metadata pass (size + digest).
    "m1_media_meta" -> ((s, dir) => {
      operators.Multimodal.mediaMeta(
        operators.Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text"))
    }),

    // Multimodal: frame-sampling explode (every 64th char code).
    "m2_frame_sample" -> ((s, dir) => {
      operators.Multimodal.frameSample(t(s, dir, "documents"), "doc_id", "text", 64)
    }),

    // Multimodal: REAL MP4 container metadata — each document encoded as
    // a valid ISO BMFF box tree (ftyp/moov/mvhd/trak/tkhd/mdat), then
    // decodeMp4's version-aware box walk reads back brand, timescale,
    // duration, 16.16 dimensions, and mdat byte count. The oracle
    // recomputes every field from the text's byte length alone, so the
    // walk is verified against an independent engine (the m4/m5 pattern).
    "m12_mp4_boxwalk" -> ((s, dir) => {
      operators.Multimodal.decodeMp4(s,
        operators.Multimodal.encodeMp4(s, t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
    }),

    // Multimodal: real feature extraction on the opaque blob — 4-bucket
    // byte-value histogram (no codec required).
    "m3_byte_histogram" -> ((s, dir) => {
      operators.Multimodal.byteHistogram(
        operators.Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text"))
    }),

    // GraphX bridge: connected components on the supplier-nation-region
    // subgraph (undirected reachability, component = min vertex id).
    "x1_connected_components" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val sub = PropertyGraph(
        g.V.filter(col("label").isin("supplier", "nation", "region")),
        g.E.filter(expr(s"src div ${B}").isin(4, 2)))
      graph.GraphXBridge.connectedComponents(s, sub, numParts = 8)
    }),

    // GraphX static PageRank, SELF-EVALUATING (the cd7 pattern): float
    // ranks are summation-order-dependent in the last ulp, so the gate
    // joins GraphX's result against the integer fixed-point twin
    // (pageRankFixed — same initial rank 1.0, same 0.15 + 0.85·Σ step,
    // same iteration count; GraphX additionally normalizes final ranks to
    // sum to |V|, so the twin is normalized the same way before compare)
    // and emits the deterministic rank_micro plus the VERDICT: graphx_ok
    // flips (and the hash breaks) if GraphX ever drifts more than 5e-4
    // from the normalized integer fixpoint. The oracle recomputes
    // rank_micro (x4's unrolled recurrence) and asserts the verdict true.
    "x2_pagerank" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val sub = PropertyGraph(
        g.V.filter(col("label").isin("supplier", "nation", "region")),
        g.E.filter(expr(s"src div ${B}").isin(4, 2)))
      val gx = graph.GraphXBridge.pageRank(s, sub, iters = 3, numParts = 8)
        .withColumnRenamed("id", "__gid")
      val fx = graph.GraphXBridge.pageRankFixed(sub.E.select("src", "dst"), iters = 3)
      val norm = fx.agg(sum(col("rank_micro")).as("__total"), count(lit(1)).as("__n"))
      fx.crossJoin(broadcast(norm))
        .join(gx, col("id") === col("__gid"))
        .select(col("id"), col("rank_micro"),
          (abs(col("rank") - col("rank_micro") * col("__n") / col("__total"))
            <= lit(5e-4)).as("graphx_ok"))
    }),

    // A18 — bulk load + idempotent merge through the persistent store:
    // write a subgraph, replay a duplicate batch plus fresh vertices,
    // reload, census. Replaces the reference's 1h+ statement-at-a-time
    // gremlin :load (README.md:286-300).
    "a18_bulk_load_merge" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-a18").toString
      val g = GraphStore.get(s, dir)
      val sub = PropertyGraph(
        g.V.filter(col("label").isin("region", "nation")),
        g.E.filter(expr(s"src div ${B}") === 2))
      sources.GraphStorage.write(sub, tmp)
      val dupNations = g.hasLabel("nation")
      val freshZones = t(s, dir, "region").select(
        (lit(9L * B) + col("r_regionkey")).as("id"), lit("zone").as("label"),
        col("r_regionkey").cast("string").as("key"),
        map(lit("name"), col("r_name")).as("props"))
      sources.GraphStorage.merge(s, tmp, dupNations.unionByName(freshZones), g.E.limit(0))
      sources.GraphStorage.load(s, tmp).V
        .groupBy("label").agg(count(lit(1)).as("cnt"))
    }),

    // A18 (text form) — the reference's actual interchange loop closed:
    // render region/nation rows into its emitted Groovy upsert-script
    // shapes (vertex template main.go:205-211, lookup-bind + guarded addE
    // main.go:310-322), re-parse the text with sources.GroovyLoader, write
    // a store, replay the same batch through the idempotent merge (must be
    // a no-op), and census what came back.
    "a18b_groovy_load" -> ((s, dir) => {
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-a18b").toString
      val vScripts = t(s, dir, "region").select(format_string(
        "if (g.V().hasLabel('region').has('rkey','%s').hasNext() == false) {\n" +
          " g.addV('region').property(label, 'region').property('rkey', '%s').property('name', '%s').next()\n}",
        col("r_regionkey"), col("r_regionkey"), col("r_name")).as("chunk"))
        .unionByName(t(s, dir, "nation").select(format_string(
          "if (g.V().hasLabel('nation').has('nkey','%s').hasNext() == false) {\n" +
            " g.addV('nation').property(label, 'nation').property('nkey', '%s').property('name', '%s').next()\n}",
          col("n_nationkey"), col("n_nationkey"), col("n_name")).as("chunk")))
      val eScripts = t(s, dir, "nation").select(format_string(
        "u1 = g.V().hasLabel('nation').has('nkey', '%s' ).next()\n" +
          "g1 = g.V().hasLabel('region').has('rkey', '%s').next()\n" +
          "if ( g.V(u1).outE('in').where(inV().hasId( g1.id() )).hasNext() == false) {\n" +
          " e1 = g.V(u1).addE('in').to(g1).property('weight', 1).next()\n}",
        col("n_nationkey"), col("n_regionkey")).as("chunk"))
      val (v, e) = sources.GroovyLoader.load(
        vScripts.unionByName(eScripts).as[String],
        Map("region" -> "rkey", "nation" -> "nkey"))
      sources.GraphStorage.write(PropertyGraph(v, e), tmp)
      sources.GraphStorage.merge(s, tmp, v, e) // replay — idempotent no-op
      val loaded = sources.GraphStorage.load(s, tmp)
      loaded.V.groupBy("label").agg(count(lit(1)).as("cnt"))
        .unionByName(loaded.E
          .select(concat(lit("edge:"), col("label")).as("label"))
          .groupBy("label").agg(count(lit(1)).as("cnt")))
    }),

    // A19 — the schema/layout story made measurable: write the graph as
    // catalog-bucketed tables (bucketBy src/id — the restart-surviving,
    // zero-Exchange layout), reload from the catalog, and run a hop-join
    // on the fresh read. StorageAndExportSpec asserts the plan shape
    // (no Exchange); this gate asserts the hop's RESULT.
    "a19_bucketed_layout" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      // The layout proof only needs the hop's slice (customer vertices +
      // their nation out-edges) — writing the full graph each run would
      // time the sink, not the layout.
      val sub = PropertyGraph(
        g.V.filter(col("label").isin("customer", "nation")),
        g.E.filter(expr(s"src div ${B}") === 3))
      sources.GraphStorage.writeBucketedTables(s, sub, db = "graft_a19", buckets = 8,
        location = Some(java.nio.file.Files.createTempDirectory("graft-a19").toString))
      val bg = sources.GraphStorage.loadBucketedTables(s, "graft_a19")
      bg.out(bg.hasLabel("customer"), "in")
        .filter(col("label") === "nation")
        .groupBy(col("key")).agg(count(lit(1)).as("n_customers"))
        .select(col("key").as("nation_key"), col("n_customers"))
    }),

    // Streaming-shaped batch: tumbling 1h windows over the events table.
    "sw1_tumbling_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          money(sumExact(cents(col("value"))), 100L).as("sum_value"))
        .select(col("window.start").as("ws"), col("event_type"), col("cnt"), col("sum_value"))
    }),

    // Sliding 2h windows every 1h.
    "sw2_sliding_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
    }),

    // Batch session windows (gaps-and-islands): split each user's events
    // into sessions separated by >30min silence — the batch twin of
    // streaming.EventPipeline.sessionize, as one window pass + agg
    // (no per-user state, scales as a single shuffle on user_id).
    "sw3_session_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val brk = when(
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w) > lit(1800L * 1000000L),
        lit(1L)).otherwise(lit(0L))
      events(s, dir)
        .withColumn("session_id",
          sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
    }),

    // A/B experiment read-out: deterministic md5 arm split, conversion =
    // any 'purchase', pooled two-proportion z in integer micro-units
    // (see EventPipeline.abTest).
    "sw7_abtest" -> ((s, dir) => {
      streaming.EventPipeline.abTest(events(s, dir))
    }),

    // First-order event-transition matrix with integer-micro conditional
    // probabilities — the behavioral bigram table (see
    // EventPipeline.transitionMatrix).
    "sw6_transitions" -> ((s, dir) => {
      streaming.EventPipeline.transitionMatrix(events(s, dir))
    }),

    // Cohort retention triangle: users cohorted by first-seen day, one
    // row per (cohort, day-offset) with its active-user count — the
    // funnel's longitudinal sibling (see EventPipeline.retentionCohorts).
    "sw5_retention" -> ((s, dir) => {
      streaming.EventPipeline.retentionCohorts(events(s, dir))
    }),

    // Earliest-entry conversion funnel view → click → purchase, whole
    // funnel within 1 hour of the user's first view (greedy ClickHouse
    // windowFunnel semantics; see EventPipeline.funnel). One exchange on
    // user_id serves the chained step windows AND the depth aggregate.
    "sw4_funnel" -> ((s, dir) => {
      streaming.EventPipeline.funnel(events(s, dir),
        Seq("view", "click", "purchase"), windowMicros = 3600L * 1000000L)
    }),

    // As-of join: for each click, the most recent purchase at-or-before it
    // by the same user. Spark-first plan: union both sides and take the
    // last non-null purchase in one event-time window pass — ONE shuffle
    // on user_id, instead of the O(n·m) inequality join Spark would plan
    // as a broadcast nested loop. Purchases sort before clicks at equal
    // ts (is_l tiebreak) to get <= semantics.
    "z1_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("event_id"), col("ts"), lit(1).as("is_l"),
        lit(null).cast("timestamp").as("p_ts"), lit(null).cast("double").as("p_val"))
      val buys = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), lit(null).cast("long").as("event_id"), col("ts"), lit(0).as("is_l"),
        col("ts").as("p_ts"), col("value").as("p_val"))
      // p_val as the final sort key: if a user ever had two purchases at
      // the same ts, last() deterministically takes the max value (the
      // oracle dedups to max(value) per (user, ts) for the same reason).
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("is_l"), col("p_val"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(buys)
        .withColumn("purchase_ts", last(col("p_ts"), ignoreNulls = true).over(w))
        .withColumn("purchase_value", last(col("p_val"), ignoreNulls = true).over(w))
        .filter(col("is_l") === 1)
        .select(col("user_id"), col("event_id"), col("ts").as("click_ts"),
          col("purchase_ts"), col("purchase_value"))
    }),

    // Range join: events against a tiny value-band dimension. The bands
    // table is broadcast, so the inequality join is a broadcast nested
    // loop over 5 rows — the correct 100 TB plan (no shuffle of events).
    "z2_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        (0L, 0.0, 100.0), (1L, 100.0, 200.0), (2L, 200.0, 300.0),
        (3L, 300.0, 400.0), (4L, 400.0, 1.0e9)).toDF("band_id", "lo", "hi")
      events(s, dir)
        .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("cnt"),
          money(sumExact(cents(col("value"))), 100L).as("sum_value"))
    }),

    // Interval × interval overlap join with BOTH sides data-sized (what
    // z2's broadcast cannot cover): per-user daily activity intervals ×
    // per-event-type daily intervals, bin-blocked on the hour so the
    // overlap predicate runs as a hash equi-join, never a nested loop.
    "z3_interval_overlap" -> ((s, dir) => {
      val ev = events(s, dir)
      val a = ev.groupBy(col("user_id"), to_date(col("ts")).cast("string").as("day"))
        .agg(min(unix_micros(col("ts"))).as("start"), max(unix_micros(col("ts"))).as("end"))
      val b = ev.groupBy(col("event_type"), to_date(col("ts")).cast("string").as("day2"))
        .agg(min(unix_micros(col("ts"))).as("start2"), max(unix_micros(col("ts"))).as("end2"))
      operators.IntervalJoin.overlapJoin(a, b, binWidth = 3600L * 1000000L)
        .select(col("user_id"), col("day"), col("event_type"),
          (least(col("end"), col("end2")) - greatest(col("start"), col("start2")))
            .as("overlap_micros"))
    }),

    // Exact interpolated percentiles per group (sort-based, so no
    // float-summation order issues — deterministic across engines).
    "f5_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_quantity, 0.99)"), 4).as("p99"),
          count(lit(1)).as("cnt"))
    }),

    // GraphX triangle count over a customer–nation–region graph with
    // 2-hop shortcut edges (each customer closes one triangle).
    "x3_triangle_count" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(
        (lit(3L * B) + col("c_custkey")).as("src"), (lit(2L * B) + col("c_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"), (lit(1L * B) + col("n_regionkey")).as("dst"))
      val cr = t(s, dir, "customer").join(t(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select((lit(3L * B) + col("c_custkey")).as("src"),
          (lit(1L * B) + col("n_regionkey")).as("dst"))
      graph.GraphXBridge.triangleCount(s, cn.unionByName(nr).unionByName(cr), numParts = 8)
        .filter(col("n_triangles") > 0)
    }),

    // Deterministic fixed-point PageRank (integer micro-rank units) on the
    // supplier–nation–region graph — the cross-engine-verifiable twin of
    // x2's GraphX float PageRank.
    "x4_pagerank_fixed" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"), (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"), (lit(1L * B) + col("n_regionkey")).as("dst"))
      graph.GraphXBridge.pageRankFixed(sn.unionByName(nr), iters = 3)
    }),

    // REAL media decode, hash-verified end-to-end: text → valid 24-bit BMP
    // bytes → pure-JVM decoder (magic/offset/bpp parse, bottom-up un-flip)
    // → exact per-channel sums. The oracle recomputes the sums straight
    // from the text, so the byte-level encode∘decode must invert exactly.
    "m4_bmp_roundtrip" -> ((s, dir) => {
      val media = operators.Multimodal.encodeBmp(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeBmp(s, media).toDF()
    }),

    // COMPRESSED-image twin of m4: text → real PNG bytes (JDK ImageIO
    // writer, genuinely deflate-compressed) → real ImageIO decoder →
    // exact per-channel sums. PNG is lossless and the raster layout is
    // identical to the BMP twin's, so the oracle recomputing the sums
    // straight from the text proves the whole compressed codec path —
    // encode, deflate, inflate, decode — inverts exactly.
    // REAL resize on the decoded-pixel path: PNG → ImageIO decode →
    // nearest-neighbor ×½ (pixel (2x, 2y) sampled — exact integer
    // arithmetic, no interpolation) → PNG re-encode → decode → exact
    // channel sums. The oracle recomputes the sampled positions straight
    // from the text, so decode∘resize∘encode∘decode must all invert.
    "m11_png_resize" -> ((s, dir) => {
      val media = operators.Multimodal.encodeImage(
        s, t(s, dir, "documents"), "doc_id", "text", format = "png")
      operators.Multimodal.decodeImage(s,
        operators.Multimodal.resizeImage(s, media, factor = 2)).toDF()
    }),

    "m10_png_roundtrip" -> ((s, dir) => {
      val media = operators.Multimodal.encodeImage(
        s, t(s, dir, "documents"), "doc_id", "text", format = "png")
      operators.Multimodal.decodeImage(s, media).toDF()
    }),

    // Audio twin: text → valid RIFF/WAVE PCM16 → chunk-walking decoder →
    // exact sample count + energy sum.
    "m5_wav_roundtrip" -> ((s, dir) => {
      val media = operators.Multimodal.encodeWav(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeWav(s, media).toDF()
    }),

    // Exactly-8-step reachability by binary relation exponentiation
    // (Traversal.hopPower: 3 squarings instead of 8 sequential hops) over
    // the symmetrized supplier–nation–region graph — the log-round
    // traversal primitive behind repeat().times(n).dedup(), gated.
    "a21_hop_power" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"), (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"), (lit(1L * B) + col("n_regionkey")).as("dst"))
      val e = sn.unionByName(nr)
      val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      graph.Traversal.hopPower(und, 8)
    }),

    // Weighted shortest paths (Bellman-Ford, exact BIGINT distances) from
    // the region vertices over the REVERSED containment graph, with
    // deterministic synthetic weights — the weight property the reference
    // writes on every edge (main.go:321), finally traversed as a weight.
    "x8_weighted_sssp" -> ((s, dir) => {
      val ns = t(s, dir, "nation").select(
        (lit(1L * B) + col("n_regionkey")).as("src"),
        (lit(2L * B) + col("n_nationkey")).as("dst"),
        (col("n_nationkey") % 3 + 1).cast("long").as("w"))
      val sp = t(s, dir, "supplier").select(
        (lit(2L * B) + col("s_nationkey")).as("src"),
        (lit(4L * B) + col("s_suppkey")).as("dst"),
        (col("s_suppkey") % 5 + 1).cast("long").as("w"))
      val seeds = t(s, dir, "region").select((lit(1L * B) + col("r_regionkey")).as("id"))
      graph.Traversal.sssp(ns.unionByName(sp), seeds)
    }),

    // Borůvka minimum spanning forest over the containment graph plus two
    // md5-weighted rings (the base graph is a tree — rings add the cycles
    // an MST must break). THE parallel MST: Prim/Kruskal are sequential by
    // construction; Borůvka merges every component each round, ≤ log₂ V
    // rounds of joins. The (w, u, v) lexicographic edge order makes the
    // forest unique, so the oracle replays sequential Prim under the same
    // order and must land on the identical edge set.
    // Condensation layering: collapse every cycle to its SCC, then
    // longest-path-layer the quotient DAG — the composition that lifts
    // x30's DAG-only layering to ARBITRARY digraphs (the condensation of
    // any digraph is acyclic, so topoLayers' cycle-throw can never
    // fire). Graph: suppliers → the 25-nation directed ring (one
    // genuine SCC) → regions; output (component, layer, n_members) —
    // suppliers singletons at 0, the ring SCC at 1, regions at 2.
    "x31_condensation_layers" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nring = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(2L * B) + (col("n_nationkey") + 1) % 25).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      val e = sn.unionByName(nring).unionByName(nr)
      val comp = graph.Traversal.scc(e).localCheckpoint()
      val ce = e
        .join(comp.select(col("id").as("src"), col("component").as("csrc")),
          Seq("src"))
        .join(comp.select(col("id").as("dst"), col("component").as("cdst")),
          Seq("dst"))
        .filter(col("csrc") =!= col("cdst"))
        .select(col("csrc").as("src"), col("cdst").as("dst")).distinct()
      graph.Traversal.topoLayers(ce)
        .withColumnRenamed("id", "component")
        .join(comp, Seq("component"))
        .groupBy(col("component"), col("layer"))
        .agg(count(lit(1)).as("n_members"))
    }),

    // Longest-path (topological) layering of the containment DAG — the
    // lineage-scheduler read-out: layer = what can run in parallel, max
    // layer = critical-path depth. The FK graph is a DAG by construction
    // (every 'in' edge points up the hierarchy); customers that never
    // ordered are in-degree-0 sources at layer 0, so labels can span
    // layers — the per-(label, layer) census is the gate output.
    "x30_topo_layers" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      graph.Traversal.topoLayers(g.edges, prepEdges = false)
        .join(g.vertices.select(col("id"), col("label")), Seq("id"))
        .groupBy(col("label"), col("layer"))
        .agg(count(lit(1)).as("n"))
    }),

    "x29_boruvka_mst" -> ((s, dir) => {
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      val nring = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(2L * B) + (col("n_nationkey") + 1) % 25).as("dst"))
      val sup = t(s, dir, "supplier")
      val sn = sup.select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        (lit(2L * B) + col("s_nationkey")).as("dst"))
      val scnt = sup.agg(count(lit(1)).as("ns"))
      val sring = sup.crossJoin(broadcast(scnt)).select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        // 0-based s_suppkey in this corpus: wrap with (sk + 1) % count
        (lit(4L * B) + (col("s_suppkey") + 1) % col("ns")).as("dst"))
      val e = nr.unionByName(nring).unionByName(sn).unionByName(sring)
        .withColumn("w", functions.Hashing.md5Long(concat(
          least(col("src"), col("dst")).cast("string"), lit("_"),
          greatest(col("src"), col("dst")).cast("string"))) % 1000000)
      graph.Traversal.boruvkaMst(e)
    }),

    // k-core decomposition (k=3): iterative peel of the full containment
    // graph to its maximal min-undirected-degree-3 subgraph — the
    // periphery-stripping sanitation pass (converges in ≤5 rounds here;
    // the oracle unrolls 10 idempotent peel rounds). Output: each core
    // vertex with its degree inside the core.
    "x9_kcore" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      // assumeDistinct: the store's edges are distinct (src, dst) pairs
      // and the FK containment graph is a DAG (strictly layered
      // lineitem→orders→customer→nation→region), so no reverse pair
      // exists — the symmetrize-distinct exchange is provably redundant.
      graph.Traversal.kCore(g.E, k = 3, assumeDistinct = true)
    }),

    // BM25 lexical retrieval: global top-20 documents for a fixed query
    // over the corpus, integer micro-unit scores (see TextAnalysis.bm25TopK
    // — exact, addition-order-invariant). Query mixes the one rare term
    // ('dup', df≈25/500) with two stop-ish terms, so idf does real work.
    "t_bm25" -> ((s, dir) => {
      operators.TextAnalysis.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        query = Seq("dup", "query", "data"), k = 20)
    }),

    // Sparse-vector nearest neighbors: TF-IDF cosine top-3 per document
    // via an inverted-index self-join on term — the lexical candidate
    // generator (vs e1's dense brute-force and e2's LSH).
    "d_sparse_neighbors" -> ((s, dir) => {
      operators.TextAnalysis.sparseCosineTopK(
        t(s, dir, "documents"), "doc_id", "text", r = 5, k = 3)
    }),

    // Z-order layout audit over part(p_size, floor(p_retailprice)):
    // Morton-code cells (low 6 bits dropped ≈ one file each under a
    // zval-sorted write) with per-cell min/max of BOTH dimensions — the
    // parquet-footer stats that make either predicate column prunable.
    "y1_zorder_cells" -> ((s, dir) => {
      operators.Layout.zOrderCells(t(s, dir, "part"),
        col("p_size"), floor(col("p_retailprice")).cast("long"), cellBits = 6)
    }),

    // Personalized PageRank (same integer fixed-point recipe), teleport
    // mass pinned to the region vertices: rank = proximity to the regions
    // through the containment chain, not global importance.
    "x7_ppr_regions" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"), (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"), (lit(1L * B) + col("n_regionkey")).as("dst"))
      val seeds = t(s, dir, "region").select((lit(1L * B) + col("r_regionkey")).as("id"))
      graph.GraphXBridge.pageRankPersonalized(sn.unionByName(nr), seeds, iters = 3)
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

    // Deterministic 10% hash sample of the corpus.
    "d_hash_sample" -> ((s, dir) => {
      operators.Dedup.hashSample(t(s, dir, "documents"), "doc_id", pct = 10)
        .select(col("doc_id"), col("bucket"))
    }),

    // Incremental snapshot dedup: a deterministic 20% hash-slice of the
    // corpus plays the "new crawl snapshot", the other 80% the existing
    // corpus; each delta doc keeps only if no verified (Jaccard >= 0.5)
    // near-dup already exists in base. The per-ingest production pattern
    // — the delta probes the corpus's band-bucket index, never self-joins
    // the corpus (see Dedup.incrementalDedup).
    // First-claim novelty score: a doc's distinct shingles that NO
    // earlier doc (smaller doc_id) contains — the contribution metric a
    // curriculum/data-valuation pass ranks sources by ("how much new
    // text does this feed add"), and the per-doc view of what
    // d_exact_dup_fingerprint decides wholesale. Shingles travel as
    // 60-bit md5 hashes; text never crosses an exchange.
    "d_novelty" -> ((s, dir) => {
      val ds = t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(
          operators.Dedup.shingles(col("text")))).as("sh"))
        // distinct AFTER hashing so a (theoretical) 60-bit collision
        // collapses the same way the oracle's DISTINCT-on-hash does
        .select(col("doc_id"), functions.Hashing.md5Long(col("sh")).as("g"))
        .distinct()
      val own = ds.groupBy(col("g")).agg(min(col("doc_id")).as("owner"))
      ds.join(own, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum((col("owner") === col("doc_id")).cast("long")).as("n_novel"))
        .withColumn("novelty_ppm", expr("n_novel * 1000000L div n_shingles"))
    }),

    "d_incremental_dedup" -> ((s, dir) => {
      val slice = graft.functions.Hashing.md5Long(col("doc_id")) % 100
      val docs = t(s, dir, "documents")
      operators.Dedup.incrementalDedup(
        docs.filter(slice >= 20), docs.filter(slice < 20),
        "doc_id", "text", tau = 0.5)
    }),

    // Snapshot change detection (crawl-over-crawl audit): snapshot A is
    // the corpus minus its top-10% hash slice, snapshot B minus the
    // bottom-10% with the 40s slice rewritten — so all four verdicts
    // (added / removed / changed / same) occur deterministically. Only
    // (key, 60-bit fingerprint) pairs reach the full-outer join; text
    // never shuffles (Dedup.snapshotDiff).
    "d_snapshot_diff" -> ((s, dir) => {
      val slice = graft.functions.Hashing.md5Long(col("doc_id")) % 100
      val docs = t(s, dir, "documents")
      val snapA = docs.filter(slice < 90).select(col("doc_id"), col("text"))
      val snapB = docs.filter(slice >= 10).select(col("doc_id"),
        when(slice.between(40, 49), concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")).as("text"))
      operators.Dedup.snapshotDiff(snapA, snapB, "doc_id", Seq("text"))
        .select(col("key").as("doc_id"), col("status"), col("old_fp"), col("new_fp"))
    }),

    // SCD-2 history: three deterministic snapshot versions (v2 rewrites
    // the 40s slice and deletes the 95+ slice; v3 also rewrites the 20s
    // slice and restores the deleted docs) collapsed to per-key validity
    // intervals — deletion closes a run, reappearance opens a new one.
    "d_scd2_history" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val slice = graft.functions.Hashing.md5Long(col("doc_id")) % 100
      def fp(c: Column) = graft.functions.Hashing.md5Long(
        concat(length(c).cast("string"), lit(":"), c))
      val t2 = when(slice.between(40, 49), concat(col("text"), lit(" [rev2]")))
        .otherwise(col("text"))
      val t3 = when(slice.between(20, 29), concat(col("text"), lit(" [rev3]")))
        .otherwise(t2)
      val v1 = docs.select(col("doc_id"), lit(1L).as("version"), fp(col("text")).as("fp"))
      val v2 = docs.filter(slice < 95)
        .select(col("doc_id"), lit(2L).as("version"), fp(t2).as("fp"))
      val v3 = docs.select(col("doc_id"), lit(3L).as("version"), fp(t3).as("fp"))
      operators.Dedup.scdHistory(
        v1.unionByName(v2).unionByName(v3), "doc_id", "version", "fp", latest = 3L)
    }),

    // Deterministic 90/5/5 train/val/test split (same shard anywhere).
    "d_train_split" -> ((s, dir) => {
      operators.Dedup.trainValTestSplit(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"), col("split"))
    }),

    // Stratified EXACT-proportion 80/10/10 split per language —
    // d_train_split's per-row hash hits proportions only in expectation
    // (a small stratum can miss a split entirely); the eval-set builder
    // wants them exact per stratum. Deterministic (md5, id) order inside
    // each stratum.
    "d_stratified_split" -> ((s, dir) => {
      operators.Dedup.stratifiedSplit(
        t(s, dir, "documents"), "doc_id", "lang")
        .select(col("doc_id"), col("lang"), col("split"))
    }),

    // Multi-source BFS: minimum hop distance from the lineitem layer to
    // everything it reaches (lineitem=0 -> orders/part/supplier=1 ->
    // customer/nation=2 -> nation/region=3/4; nation's min is 2 via the
    // supplier path — the MIN semantics the per-origin khop can't give
    // without materializing every pair). The oracle's recursion guard is
    // pinned to bfsDepth's maxIter (64): parity must not silently depend
    // on graph diameter staying under a smaller ad-hoc bound.
    "x6_bfs_depth" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.bfsDepth(g.hasLabel("lineitem"))
    }),

    // Strongly connected components of the above-uniform-transition
    // graph: edges are event-type bigrams whose conditional probability
    // exceeds the uniform 20% (sw6's matrix, thresholded — an asymmetric
    // "more likely than chance" relation), components labeled by min
    // co-reachable id — directed-cycle structure the plain closure (a14)
    // can't name. The general Traversal.scc runs on string keys here.
    "x10_scc" -> ((s, dir) => {
      val tm = streaming.EventPipeline.transitionMatrix(events(s, dir))
      val e = tm.filter(col("p_micro") >= 200000L)
        .select(col("from_type").as("src"), col("to_type").as("dst"))
      graph.Traversal.scc(e)
    }),

    // Exact neighborhood function (Palmer's ANF): the hop-distance
    // distribution of the symmetrized supplier–nation–region graph —
    // N(h) as cum_pairs per hop, the effective-diameter read-out. Exact
    // via one all-vertex min-hop sweep (khop) + a tiny per-hop aggregate.
    "x11_anf" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      val e = sn.unionByName(nr)
      val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      // diameter of the containment graph is 4 at every SF (s–n–r–n'–s');
      // maxHop 5 keeps one empty-level margin as the convergence witness
      graph.Traversal.neighborhoodFunction(und, maxHop = 5)
    }),

    // Exact harmonic centrality (Σ 1/d grouped by distance, integer
    // micro units): the O(pairs) exact twin on the containment graph.
    "x21_harmonic" -> ((s, dir) => {
      graph.Traversal.harmonicCentrality(snrUndirected(s, dir), maxHop = 5)
    }),

    // Stress centrality (Shimbel) — the integer betweenness: per vertex,
    // the COUNT of shortest (s,t) paths passing through it (ordered
    // pairs). Path counts compose exactly in long arithmetic where
    // Brandes' fractional betweenness cannot cross engines; the oracle
    // replays it by brute walk enumeration + min-hop filtering.
    "x22_stress" -> ((s, dir) => {
      graph.Traversal.stressCentrality(snrUndirected(s, dir), maxHop = 5)
    }),

    // The sampled-source scale path (Brandes–Pich pivots), run as code:
    // deterministic hash-sampled sources ∪ hubs sweep, same composition.
    // Pivot estimates concentrate only with a handful of pivots per
    // locality — below 1000 vertices a 25% sample leaves 0-or-1 pivots
    // per nation and the estimator is legitimately garbage — so the
    // pivot fraction is a deterministic function of graph size: 25%
    // when V ≥ 1000 (the bench SF: real sampling, verified within
    // 50%), the full population below (where the spec separately
    // proves raw ≡ exact). SELF-EVALUATING (cd7 pattern): the exact
    // stress rides in-row (memoized — x22's sweep is reused); sp_ok
    // cross-multiplies raw·n_sources vs exact·n_sampled in pure
    // integers — no floored quotient to disagree on.
    "x22b_stress_sampled" -> ((s, dir) => {
      val und = snrUndirected(s, dir)
      val nV = und.select(col("src")).distinct().count()
      val mod = if (nV >= 1000) 4 else 1
      val exact = graph.Traversal.stressCentrality(und, maxHop = 5)
      graph.Traversal.stressCentralitySampled(und, maxHop = 5, sampleMod = mod)
        .join(exact, Seq("id"))
        .select(col("id"), col("stress"),
          (abs(col("raw") * col("n_sources") - col("stress") * col("n_sampled")) * 2
            <= col("stress") * col("n_sampled")).as("sp_ok"))
    }),

    // Vertex eccentricity (bounded): per-vertex max min-hop distance —
    // the periphery/radius read-out, derived FREE from the same memoized
    // sweep x11/x14/x21 share (one O(pairs) closure serves five gates).
    "x25_eccentricity" -> ((s, dir) => {
      graph.Traversal.eccentricity(snrUndirected(s, dir), maxHop = 5)
    }),

    // Degree assortativity (Newman's r): do hubs attach to hubs? The
    // supplier–nation–region graph is hub-and-spoke, so r is strongly
    // negative — the one-number warning that hop joins on this graph
    // funnel through few celebrity vertices (what a13b's salted variant
    // exists for). Exact integer sufficient statistics ride in-row.
    "x23_assortativity" -> ((s, dir) => {
      graph.Traversal.degreeAssortativity(snrUndirected(s, dir))
    }),

    // Local clustering coefficient per vertex over the triangle-bearing
    // customer–nation–region graph (x3's): 2·T(v)/(deg(v)·(deg(v)−1))
    // in floor-micro units — the per-vertex refinement of x3's census.
    "x24_clustering_coeff" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(
        (lit(3L * B) + col("c_custkey")).as("src"), (lit(2L * B) + col("c_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"), (lit(1L * B) + col("n_regionkey")).as("dst"))
      val cr = t(s, dir, "customer").join(t(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select((lit(3L * B) + col("c_custkey")).as("src"),
          (lit(1L * B) + col("n_regionkey")).as("dst"))
      graph.Traversal.localClustering(cn.unionByName(nr).unionByName(cr))
    }),

    // The same centrality from per-vertex HyperBall sketches — O(V)
    // state, no pair materialized (Boldi–Vigna's original read-out).
    // SELF-EVALUATING (cd7 pattern): exact value rides in-row; hb_ok
    // flips (breaking the hash) if the estimate drifts past 2%.
    "x21b_harmonic_hyperball" -> ((s, dir) => {
      val und = snrUndirected(s, dir)
      graph.Traversal.hyperBallCentrality(und, maxHop = 5)
        .join(graph.Traversal.harmonicCentrality(und, maxHop = 5), Seq("id"))
        .select(col("id"), col("harmonic_micro"),
          (abs(col("harmonic_est_micro") - col("harmonic_micro")) * 50
            <= col("harmonic_micro")).as("hb_ok"))
    }),

    // Effective diameter (90th percentile of the distance distribution):
    // the smallest h whose N(h) covers ≥90% of all connected pairs —
    // derived from the exact ANF curve with one broadcast total.
    "x14_eff_diameter" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      val e = sn.unionByName(nr)
      val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val anf = graph.Traversal.neighborhoodFunction(und, maxHop = 5)
      val total = anf.agg(max(col("cum_pairs")).as("total"))
      anf.crossJoin(broadcast(total))
        .filter(col("cum_pairs") * 10 >= col("total") * 9)
        .agg(min(col("hop")).as("effective_diameter"), max(col("total")).as("total_pairs"))
    }),

    // HyperBall (Boldi–Vigna): the same curve from per-vertex HLL
    // sketches — O(V) fixed-size state per round, no pair ever
    // materializes; THE 100 TB path where x11's exact closure cannot fit.
    // SELF-EVALUATING (the cd7 pattern): HLL registers are
    // engine-specific, so the exact curve (memoized — the x11 sweep's
    // collected rows are reused, not recomputed) rides the same rows and
    // the gate emits the error-bound VERDICT per hop — hb_ok flips (and
    // the hash breaks) if any hop's estimate drifts past 2% of the exact
    // cumulative pair count. The oracle recomputes the exact curve
    // (x11's WITH RECURSIVE) and asserts the verdict true.
    "x11b_hyperball" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      val e = sn.unionByName(nr)
      val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val est = graph.Traversal.hyperBall(und, maxHop = 5)
      graph.Traversal.neighborhoodFunction(und, maxHop = 5)
        .join(est, Seq("hop"))
        .select(col("hop"), col("n_pairs"), col("cum_pairs"),
          (abs(col("est_pairs") - col("cum_pairs")) * 50 <= col("cum_pairs"))
            .as("hb_ok"))
    }),

    // Growth accounting over the events log: per day — DAU, rolling
    // 7-day actives (range join against the tiny broadcast days table;
    // the log never self-joins), newly seen users, cumulative users.
    "sw8_active_users" -> ((s, dir) => {
      streaming.EventPipeline.activeUsers(events(s, dir), windowDays = 7)
    }),

    // PQ reconstruction distortion: per-vector squared error of the
    // codebook reconstruction (floor-micro) — how much information the
    // m-byte codes actually lost; the eval that sizes a codebook.
    "e15_pq_distortion" -> ((s, dir) => {
      operators.Similarity.pqDistortion(t(s, dir, "embeddings"), "vec_id", "embedding")
    }),

    // Windowed trending: per hour, the top-3 event types by count
    // (deterministic ties) — the dashboard top-k over event-time windows.
    "sw9_trending" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = events(s, dir)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("ws")).orderBy(col("cnt").desc, col("event_type"))
      hourly.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
    }),

    // Hourly anomaly z-scores: each (hour, type) count against its
    // trailing 24 observed buckets — z = (x·n − Σx)/√(n·Σx² − (Σx)²),
    // every operand an exact integer window sum, so the IEEE sqrt/divide
    // is engine-identical; floor-micro output, NULL on zero variance.
    // Integer EWMA (α = 1/4) over per-type hourly counts — the smoother
    // next to sw10's trailing z-scores; the sequential recursion folds
    // per key, exact in milli units on both engines.
    "sw17_ewma" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(col("event_type"),
          window(col("ts"), "1 hour").getField("start").as("ws"))
        .agg(count(lit(1)).as("cnt"))
      streaming.EventPipeline.ewmaMilli(hourly, "event_type", "ws", "cnt",
        alphaDen = 4)
    }),

    // Holt linear smoothing (level + trend) over per-type hourly counts
    // — sw17's single-state EWMA lags a steady ramp by αDen buckets
    // forever; the trend state closes that gap, making forecast = l + b
    // the capacity-planning read-out. Same exact-milli integer fold,
    // every division sign-split to truncate toward zero on both engines.
    "sw20_holt_linear" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(col("event_type"),
          window(col("ts"), "1 hour").getField("start").as("ws"))
        .agg(count(lit(1)).as("cnt"))
      streaming.EventPipeline.holtMilli(hourly, "event_type", "ws", "cnt",
        alphaDen = 4, betaDen = 8)
    }),

    // One-sided CUSUM changepoint detection over per-type hourly counts:
    // sw10's z-score sees one bucket, CUSUM accumulates persistent drift
    // above the per-type mean (+ a mean/4 allowance) until it crosses
    // 5× the reference — the sequential level-shift alarm. Reference =
    // the exact integer per-type mean in milli; everything else is the
    // exact fold.
    "sw21_cusum" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(col("event_type"),
          window(col("ts"), "1 hour").getField("start").as("ws"))
        .agg(count(lit(1)).as("cnt"))
      val base = hourly.groupBy(col("event_type"))
        .agg(expr("sum(cnt) * 1000L div count(*)").as("ref_milli"))
      streaming.EventPipeline.cusumMilli(
        hourly.join(broadcast(base), Seq("event_type")),
        "event_type", "ws", "cnt", "ref_milli")
    }),

    // Seasonal-profile anomaly: each (event_type, hour) bucket against
    // ITS OWN hour-of-day baseline — sw10's trailing z-score flags level
    // shifts but also fires on every benign daily peak; dividing by the
    // slot's historical mean first ("Tuesday 9am vs all 9ams") is the
    // standard de-seasonalized form. ratio = cnt·slot_n / slot_total,
    // flagged at ≥ 2× as floored micro — all integer, both engines agree.
    "sw19_seasonal_profile" -> ((s, dir) => {
      val hourly = events(s, dir)
        .groupBy(col("event_type"),
          window(col("ts"), "1 hour").getField("start").as("ws"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("hod", hour(col("ws")).cast("long"))
      val base = hourly.groupBy(col("event_type"), col("hod"))
        .agg(sum(col("cnt")).as("slot_total"), count(lit(1)).as("slot_n"))
      hourly.join(base, Seq("event_type", "hod"))
        .withColumn("ratio_micro", expr("cnt * slot_n * 1000000L div slot_total"))
        .filter(col("ratio_micro") >= 2000000L)
        .select(col("event_type"), col("ws"), col("hod"), col("cnt"),
          col("ratio_micro"))
    }),

    "sw10_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = events(s, dir)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("ws"))
        .rowsBetween(-24, -1)
      hourly
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("cnt")).over(w))
        .withColumn("sxx", sum(col("cnt") * col("cnt")).over(w))
        .filter(col("n") >= 12)
        .select(col("ws"), col("event_type"), col("cnt"),
          when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
            floor((col("cnt") * col("n") - col("sx")) /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * 1000000).cast("long")).as("z_micro"))
    }),

    // SW11 — STREAMING exact dedup, run as a real Structured Streaming
    // query (file source → dropDuplicatesWithinWatermark → memory sink),
    // not a batch stand-in: the events table is replayed with
    // at-least-once duplicates (every 3rd event appears twice) and the
    // deduped stream must equal the plain batch table — the streaming twin
    // of d_exact_dup_fingerprint for the LLM-ingest path. The feed is ONE
    // parquet file ⇒ one micro-batch, so watermark eviction cannot race
    // the duplicates and the result is deterministic; in a long-running
    // deployment the same watermark bounds the dedup state (unlike plain
    // dropDuplicates, whose state grows with the whole stream).
    "sw11_stream_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = events(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), col("ts"), col("value"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sw11").toString
      ev.unionByName(ev.filter(col("event_id") % 3 === 0))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val name = s"sw11_out_${sinkSeq.incrementAndGet()}"
      val q = streaming.EventPipeline.dedupStream(
          s.readStream.schema(ev.schema).parquet(s"$tmp/in"), "1 hour")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$tmp/ck")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
    }),

    // SW16 — stream-static enrichment: the events stream joins the
    // customer dimension (broadcast, STATELESS — no watermark, no state
    // store; the dim is re-resolved per micro-batch, which at 100 TB is
    // exactly how slowly-changing dims stay fresh mid-stream). Output ≡
    // the batch join, the oracle.
    "sw16_stream_enrich" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("event_type"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sw16").toString
      ev.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      val name = s"sw16_out_${sinkSeq.incrementAndGet()}"
      val q = s.readStream.schema(ev.schema).parquet(s"$tmp/in")
        .join(broadcast(dim), Seq("user_id"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$tmp/ck")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
        .select(col("event_id"), col("user_id"), col("event_type"), col("segment"))
    }),

    // SW15 — REAL streaming sessionization: flatMapGroupsWithState +
    // EventTimeTimeout over a replayed file-source stream (one file per
    // micro-batch, mtime-ordered), two far-future sentinel batches
    // pushing the watermark past every real session's close so the
    // memory sink holds the COMPLETE session set — which equals the
    // batch gaps-and-islands twin, the oracle. State per user is the
    // open-session list, evicted on close: bounded by concurrency,
    // never O(stream).
    "sw15_stream_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val gapMs = 1800L * 1000
      // ms truncation on the input: sessionize state runs on epoch
      // millis, and the oracle truncates identically
      val ev = events(s, dir)
        .withColumn("ts", expr("timestamp_millis(unix_millis(ts))"))
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sw15").toString
      val maxTs = ev.agg(max(col("ts"))).as[java.sql.Timestamp].head()
      def sentinel(days: Int) = Seq((-1L,
        new java.sql.Timestamp(maxTs.getTime + days * 86400000L))).toDF("user_id", "ts")
      val inDir = java.nio.file.Paths.get(tmp, "in")
      java.nio.file.Files.createDirectories(inDir)
      Seq(("b0", ev), ("b1", sentinel(10)), ("b2", sentinel(20)))
        .zipWithIndex.foreach { case ((n, df), i) =>
          df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$n")
          val part = new java.io.File(s"$tmp/$n").listFiles()
            .find(_.getName.endsWith(".parquet")).get.toPath
          val staged = inDir.resolve(f"$i%02d.parquet")
          java.nio.file.Files.copy(part, staged)
          // FileStreamSource orders by mtime — pin the replay order
          java.nio.file.Files.setLastModifiedTime(staged,
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
        }
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      val name = s"sw15_out_${sinkSeq.incrementAndGet()}"
      val q = streaming.EventPipeline.sessionize(
          stream.as[streaming.EventPipeline.SessionEvent], gapMs)
        .toDF()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$tmp/ck")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name).filter(col("user_id") >= 0)
        .select(col("user_id"), col("start").as("session_start"),
          col("end").as("session_end"), col("n_events"))
    }),

    // SW12 — REAL stream-stream interval join: clicks and purchases run
    // as two watermarked file-source streams through clickAttribution
    // (join state evicted once the watermark passes the window — bounded
    // by traffic·window, never O(stream)); the inner join emits exactly
    // the batch interval join, which is the oracle. One file per side ⇒
    // deterministic (all matches emit in the single micro-batch).
    "sw12_stream_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = events(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-sw12").toString
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      clicks.coalesce(1).write.mode("overwrite").parquet(s"$tmp/clicks")
      buys.coalesce(1).write.mode("overwrite").parquet(s"$tmp/buys")
      val joined = streaming.EventPipeline.clickAttribution(
        s.readStream.schema(clicks.schema).parquet(s"$tmp/clicks"),
        s.readStream.schema(buys.schema).parquet(s"$tmp/buys"),
        watermark = "1 hour", joinWindow = "30 minutes", joinType = "inner")
      val name = s"sw12_out_${sinkSeq.incrementAndGet()}"
      // A stream-stream join provisions FOUR state stores per shuffle
      // partition; at this volume store setup dominates the join, so the
      // streaming query runs at 8 partitions (the conf pins at query
      // START and is restored right after — batch gates are unaffected).
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = joined.writeStream.format("memory").queryName(name)
          .option("checkpointLocation", s"$tmp/ck")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.table(name)
    }),

    // SW18 — the LEFT_OUTER stream-stream join: unconverted clicks ALSO
    // emit (purchase columns NULL) — but an outer row may only emit once
    // the watermark PROVES no in-window purchase can still arrive, which
    // a finite stream's last batch never proves on its own. Two staged
    // sentinel batches per side (the sw15 pattern: sentinel #1 advances
    // the watermark, sentinel #2 triggers the batch that evicts with it)
    // drive the final watermark past every click's deadline, so the
    // result equals the batch LEFT JOIN exactly — which is the oracle.
    "sw18_stream_left_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val ev = events(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-sw18").toString
      val maxTs = ev.agg(max(col("ts"))).as[java.sql.Timestamp].head()
      def stage(sub: String, data: DataFrame, sentinel: Int => DataFrame): String = {
        val inDir = java.nio.file.Paths.get(tmp, sub)
        java.nio.file.Files.createDirectories(inDir)
        Seq(data, sentinel(10), sentinel(20)).zipWithIndex.foreach { case (df, i) =>
          df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/${sub}_b$i")
          val part = new java.io.File(s"$tmp/${sub}_b$i").listFiles()
            .find(_.getName.endsWith(".parquet")).get.toPath
          val staged = inDir.resolve(f"$i%02d.parquet")
          java.nio.file.Files.copy(part, staged)
          // FileStreamSource orders by mtime — pin the replay order
          java.nio.file.Files.setLastModifiedTime(staged,
            java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
        }
        inDir.toString
      }
      def sentTs(days: Int) = new java.sql.Timestamp(maxTs.getTime + days * 86400000L)
      val clicks = ev.filter(col("event_type") === "click").select(col("user_id"), col("ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val cDir = stage("clicks", clicks,
        d => Seq((-1L, sentTs(d))).toDF("user_id", "ts"))
      val bDir = stage("buys", buys,
        d => Seq((-1L, sentTs(d), 0.0)).toDF("user_id", "ts", "value"))
      val joined = streaming.EventPipeline.clickAttribution(
        s.readStream.schema(clicks.schema).option("maxFilesPerTrigger", "1").parquet(cDir),
        s.readStream.schema(buys.schema).option("maxFilesPerTrigger", "1").parquet(bDir),
        watermark = "1 hour", joinWindow = "30 minutes", joinType = "left_outer")
      val name = s"sw18_out_${sinkSeq.incrementAndGet()}"
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = joined.writeStream.format("memory").queryName(name)
          .option("checkpointLocation", s"$tmp/ck")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.table(name).filter(col("user_id") >= 0)
        .select(col("user_id"), col("click_ts"), col("purchase_ts"), col("value"))
    }),

    // SW13 — foreachBatch incremental graph merge, the reference's
    // IAM-graph ingest made streaming: events arrive in TWO micro-batches
    // (the second an at-least-once REPLAY of every 5th event), each batch
    // upserting user vertices, event-type vertices, and user→type edges
    // through the same idempotent anti-join merge as the batch path
    // (A6/A9). The final census must equal the batch distinct counts —
    // replays cannot double-insert. Output: (part, n).
    "sw13_stream_graph_merge" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.streaming.Trigger
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("event_type"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sw13").toString
      ev.coalesce(1).write.parquet(s"$tmp/in/b1")
      ev.filter(col("event_id") % 5 === 0).coalesce(1).write.parquet(s"$tmp/in/b2")
      val empty = PropertyGraph(
        Seq.empty[(Long, String, String, Map[String, String])]
          .toDF("id", "label", "key", "props"),
        Seq.empty[(Long, Long, String, Int)].toDF("src", "dst", "label", "weight"))
      val state = new streaming.EventPipeline.GraphState(empty)
      val q = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1") // force the replay into its own batch
        .parquet(s"$tmp/in/*")
        .writeStream
        .option("checkpointLocation", s"$tmp/ck")
        .foreachBatch(streaming.EventPipeline.graphMergeBatch(state, 8L * B, 9L * B) _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val g = state.graph
      g.vertices.groupBy(col("label")).agg(count(lit(1)).as("n"))
        .select(col("label").as("part"), col("n"))
        .unionByName(g.edges.agg(count(lit(1)).as("n"))
          .select(lit("in_edges").as("part"), col("n")))
    }),

    // SW14 — incremental count-min maintenance: the events stream splits
    // into two DISJOINT micro-batches whose (r, b, c) cell increments
    // merge additively into O(depth·width) running state — CMS is linear,
    // so the final sketch equals the batch sketch of the whole stream,
    // which is exactly what the oracle computes. Per-type estimates probe
    // min-over-depth with the exact count in-row (the cd5 read-out shape).
    "sw14_stream_countmin" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val ev = events(s, dir).select(col("event_id"), col("event_type"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-sw14").toString
      ev.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$tmp/in/b1")
      ev.filter(col("event_id") % 2 =!= 0).coalesce(1).write.parquet(s"$tmp/in/b2")
      val state = new streaming.EventPipeline.CmState(
        Seq.empty[(Int, Long, Long)].toDF("r", "b", "c"))
      val q = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$tmp/in/*")
        .writeStream
        .option("checkpointLocation", s"$tmp/ck")
        .foreachBatch(
          streaming.EventPipeline.cmMergeBatch(state, "event_type", 4, 16) _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val probe = operators.Sketch.cmsCells(
        ev.select(col("event_type")).distinct(), "event_type", 4, 16)
      val est = probe.join(broadcast(state.cells), Seq("r", "b"))
        .groupBy(col("k")).agg(min(col("c")).as("est_count"))
      val exact = ev.groupBy(col("event_type").as("k"))
        .agg(count(lit(1)).as("exact_count"))
      est.join(exact, Seq("k"))
        .select(col("k").as("event_type"), col("est_count"), col("exact_count"))
    }),

    // MinHash calibration: estimated Jaccard (signature agreement share,
    // exact basis points — matches·10000/8) next to the exact n-gram
    // Jaccard on the SAME candidate pairs — the sketch-quality eval that
    // says whether 8 hashes are enough for this corpus.
    "d_minhash_estimate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sig = operators.Dedup.minhashSignature(docs, "text", k = 8)
        .select(col("doc_id") +: (1 to 8).map(i => col(s"h$i")): _*)
      val a = sig.toDF("id_a" +: (1 to 8).map(i => s"a$i"): _*)
      val b = sig.toDF("id_b" +: (1 to 8).map(i => s"b$i"): _*)
      val matches = (1 to 8).map(i =>
        when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)
      val est = a.join(b, col("a1") === col("b1") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), (matches * 1250L).as("est_bp"))
      operators.Dedup.ngramJaccard(docs, "doc_id", "text")
        .join(est, Seq("id_a", "id_b"))
        .select(col("id_a"), col("id_b"), col("est_bp"), col("jaccard"))
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

    // Exact integer Gram matrix XᵀX over int8 codes in ONE aggregation
    // pass (bounded-state Aggregator: d(d+1)/2 longs per task) — the
    // sufficient statistic behind PCA/covariance; integer codes make it
    // order/partitioning-invariant and cross-engine exact.
    "e14_gram" -> ((s, dir) => {
      val q = operators.Similarity.quantizeInt8(
        t(s, dir, "embeddings"), "vec_id", "embedding")
      operators.Similarity.gramMatrix(q.select(col("q")), "q", d = 64)
    }),

    // Pairwise-cosine histogram over a deterministic md5 quarter-sample —
    // the embedding-space QA read-out (near-dup flooding spikes at 1.0,
    // anisotropy shifts the mass right); `mod` keeps the sampled pair
    // count ~constant as the corpus grows.
    "e19_sim_histogram" -> ((s, dir) => {
      operators.Similarity.cosineHistogram(
        t(s, dir, "embeddings"), "vec_id", "embedding")
    }),

    // Dominant principal direction of the embedding corpus by 3 exact
    // integer power-method rounds over the e14 Gram — the anisotropy /
    // rogue-common-direction probe behind PCA whitening. The corpus is
    // touched once (the Gram pass); iterations are d-row arithmetic.
    "e18_power_iteration" -> ((s, dir) => {
      val q = operators.Similarity.quantizeInt8(
        t(s, dir, "embeddings"), "vec_id", "embedding")
      operators.Similarity.powerIteration(
        operators.Similarity.gramMatrix(q.select(col("q")), "q", d = 64))
    }),

    // Point-in-time join: every (doc, as-of version) probe fetches the
    // fingerprint that was valid THEN from the SCD-2 history — the
    // feature-store lookup that makes training reproducible (no leakage
    // from later versions). Equi-join on the key, interval filter on the
    // ≤3-row-per-key history; absent rows = deleted at that version.
    "z4_pit_join" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val slice = graft.functions.Hashing.md5Long(col("doc_id")) % 100
      def fp(c: Column) = graft.functions.Hashing.md5Long(
        concat(length(c).cast("string"), lit(":"), c))
      val t2 = when(slice.between(40, 49), concat(col("text"), lit(" [rev2]")))
        .otherwise(col("text"))
      val t3 = when(slice.between(20, 29), concat(col("text"), lit(" [rev3]")))
        .otherwise(t2)
      val v1 = docs.select(col("doc_id"), lit(1L).as("version"), fp(col("text")).as("fp"))
      val v2 = docs.filter(slice < 95)
        .select(col("doc_id"), lit(2L).as("version"), fp(t2).as("fp"))
      val v3 = docs.select(col("doc_id"), lit(3L).as("version"), fp(t3).as("fp"))
      val hist = operators.Dedup.scdHistory(
        v1.unionByName(v2).unionByName(v3), "doc_id", "version", "fp", latest = 3L)
      // deterministic probes: every doc asked as-of version (hash % 3) + 1;
      // a probe landing in a deletion gap keeps its row with fp_then NULL
      // (the entity did not exist then — that IS the answer)
      val probes = docs.select(col("doc_id"),
        (graft.functions.Hashing.md5Long(concat(col("doc_id").cast("string"),
          lit("#asof"))) % 3 + 1).as("as_of"))
      val h = hist.select(col("doc_id").as("h_id"), col("fp"),
        col("valid_from"), col("valid_to"))
      probes.join(h, col("doc_id") === col("h_id") &&
          col("as_of").between(col("valid_from"), col("valid_to")), "left")
        .select(col("doc_id"), col("as_of"), col("fp").as("fp_then"))
    }),

    // Data-quality expectations sweep (Deequ-style, one aggregation
    // pass): per-rule measured value + pass verdict over lineitem —
    // completeness, range, uniqueness, set-membership.
    "dq1_expectations" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val metrics = li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("null_orderkey"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("qty_out_of_range"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)).as("bad_returnflag"),
        (count(lit(1)) - count_distinct(struct(col("l_orderkey"), col("l_linenumber"))))
          .as("dup_pk"))
      metrics.select(explode(array(
        struct(lit("null_orderkey").as("rule"), col("null_orderkey").as("violations"),
          (col("null_orderkey") === 0).as("passes")),
        struct(lit("qty_in_1_50").as("rule"), col("qty_out_of_range").as("violations"),
          (col("qty_out_of_range") === 0).as("passes")),
        struct(lit("returnflag_in_set").as("rule"), col("bad_returnflag").as("violations"),
          (col("bad_returnflag") === 0).as("passes")),
        struct(lit("pk_unique").as("rule"), col("dup_pk").as("violations"),
          (col("dup_pk") === 0).as("passes")))).as("r"))
        .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
          col("r.passes").as("passes"))
    }),

    // Referential-integrity audit: orphaned foreign keys counted by
    // anti-joins along the star schema — the load-validation gate.
    "dq2_ref_integrity" -> ((s, dir) => {
      def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String) =
        fact.select(col(fk)).join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
          .agg(count(lit(1)).as("orphans"))
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val li = t(s, dir, "lineitem"); val p = t(s, dir, "part"); val su = t(s, dir, "supplier")
      orphans(o, "o_custkey", c, "c_custkey").select(lit("orders->customer").as("edge"), col("orphans"))
        .unionByName(orphans(li, "l_orderkey", o, "o_orderkey")
          .select(lit("lineitem->orders").as("edge"), col("orphans")))
        .unionByName(orphans(li, "l_partkey", p, "p_partkey")
          .select(lit("lineitem->part").as("edge"), col("orphans")))
        .unionByName(orphans(li, "l_suppkey", su, "s_suppkey")
          .select(lit("lineitem->supplier").as("edge"), col("orphans")))
    }),

    // k-truss of the verified near-dup graph (Jaccard ≥ 0.5 edges): keep
    // only edges closing ≥1 triangle — the cohesive dup CORES, with the
    // chain-merge bridge edges LSH clustering is prone to peeled away.
    "x13_ktruss" -> ((s, dir) => {
      val pairs = operators.Dedup.ngramJaccard(t(s, dir, "documents"), "doc_id", "text")
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      graph.Traversal.kTruss(pairs, k = 3)
        .select(col("a").as("id_a"), col("b").as("id_b"), col("support"))
    }),

    // Perceptual average-hash over REAL decoded BMPs: 8×8 luminance grid,
    // bit = cell brighter than the image (exact integer cross-multiply) —
    // the image near-dup fingerprint.
    "m8_ahash" -> ((s, dir) => {
      val media = operators.Multimodal.encodeBmp(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeBmpAHash(s, media).toDF()
    }),

    // Image near-dup: the aHash fingerprints through the SAME banded
    // hamming-ball join the text simhash uses (Dedup.hammingNearDup,
    // bits=64, radius 3) — recall 1 within the ball, capped hot bands.
    "m8b_image_neardup" -> ((s, dir) => {
      val media = operators.Multimodal.encodeBmp(s, t(s, dir, "documents"), "doc_id", "text")
      val fps = operators.Multimodal.decodeBmpAHash(s, media).toDF()
        .select(col("id"), col("ahash"))
      operators.Dedup.hammingNearDup(fps, "id", "ahash", bits = 64, maxHamming = 3)
    }),

    // Audio fingerprint (Shazam-lite energy-delta hash): bit i = frame
    // i+1 louder than frame i over the REAL decoded PCM16 frames — the
    // audio member of the near-dup fingerprint triple (text simhash,
    // image aHash, audio energy-delta), exact integers end to end.
    // 8-sample frames throughout: the synthetic docs are 48-550 chars, so
    // 256-sample frames would leave 1-3 frames (a 1-2 bit fingerprint);
    // 8 samples give the full 64 delta bits real audio would get from
    // longer frames.
    "m9_audio_fp" -> ((s, dir) => {
      val media = operators.Multimodal.encodeWav(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.audioDeltaFingerprint(s, media, frameLen = 8)
    }),

    // Audio near-dup: the energy-delta fingerprints through the same
    // banded hamming-ball join as text and images (radius 3).
    "m9b_audio_neardup" -> ((s, dir) => {
      val media = operators.Multimodal.encodeWav(s, t(s, dir, "documents"), "doc_id", "text")
      val fps = operators.Multimodal.audioDeltaFingerprint(s, media, frameLen = 8)
      operators.Dedup.hammingNearDup(fps, "id", "afp", bits = 64, maxHamming = 3)
    }),

    // Luby maximal independent set with deterministic md5 priorities over
    // the symmetrized supplier–nation–region graph — the symmetry-breaking
    // primitive (conflict-free parallel work-sets); expected O(log n)
    // rounds of one join + one min aggregate over O(V) state.
    "x12_mis" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      graph.Traversal.maximalIndependentSet(sn.unionByName(nr))
    }),

    // Negative edge sampling (word2vec/GNN contrastive pairs): 3
    // unigram-weighted pseudo-random non-neighbors per customer, drawn
    // from the customer→nation edge list's dst multiset — md5-positioned
    // into a sharded-prefix-sum canonical order (no global sort), draws
    // hitting a real neighbor or self rejected. Fully deterministic;
    // the oracle replays the same shard ranks and md5 draws.
    "x15_negative_sampling" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(
        (lit(3L * B) + col("c_custkey")).as("src"),
        (lit(2L * B) + col("c_nationkey")).as("dst"))
      graph.Traversal.negativeSample(cn, k = 3)
    }),

    // Random-walk corpus (DeepWalk positive pairs, x15's counterpart): 2
    // deterministic md5-steered walks of ≤3 steps from every region and
    // nation down the containment fan-out (region→nation→customer);
    // customer sinks end walks early — no padding. The oracle replays
    // every path step by step.
    "x16_random_walks" -> ((s, dir) => {
      val rn = t(s, dir, "nation").select(
        (lit(1L * B) + col("n_regionkey")).as("src"),
        (lit(2L * B) + col("n_nationkey")).as("dst"))
      val nc = t(s, dir, "customer").select(
        (lit(2L * B) + col("c_nationkey")).as("src"),
        (lit(3L * B) + col("c_custkey")).as("dst"))
      graph.Traversal.randomWalks(rn.unionByName(nc), walks = 2, len = 3)
    }),

    // HITS hubs/authorities (integer max-normalized, 2 fixed
    // iterations): customers/suppliers are pure hubs, regions pure
    // authorities, nations both — the directed complement to PageRank
    // on the containment graph. Exact BIGINTs, oracle-unrolled.
    "x17_hits" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(
        (lit(3L * B) + col("c_custkey")).as("src"),
        (lit(2L * B) + col("c_nationkey")).as("dst"))
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      graph.GraphXBridge.hitsFixed(cn.unionByName(sn).unionByName(nr), iters = 2)
    }),

    // Link-prediction candidates: top-3 non-adjacent pairs per vertex
    // by the integer Resource-Allocation index (Σ 10⁶ div deg(w) over
    // common neighbors — exact, order-free; Adamic-Adar's ln would cost
    // cross-engine ulps) on the symmetrized supplier–nation–region
    // graph. The positive-candidate half of link-prediction training;
    // x15 supplies the negatives.
    "x19_link_predict" -> ((s, dir) => {
      val sn = t(s, dir, "supplier").select(
        (lit(4L * B) + col("s_suppkey")).as("src"),
        (lit(2L * B) + col("s_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      graph.Traversal.linkPredict(sn.unionByName(nr), k = 3)
    }),

    // Sampled neighbor aggregation (GraphSAGE mini-batch prep): per
    // nation, the exact cent-sum of account balance over ≤8 md5-sampled
    // customers — the cap bounds join fan-in per vertex at s rows
    // whatever the degree distribution (the celebrity-vertex answer for
    // GNN feature gathering).
    "x20_neighbor_agg" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nc = cust.select(
        (lit(2L * B) + col("c_nationkey")).as("src"),
        (lit(3L * B) + col("c_custkey")).as("dst"))
      val feats = cust.select(
        (lit(3L * B) + col("c_custkey")).as("id"),
        round(col("c_acctbal") * 100).cast("long").as("feature"))
      graph.Traversal.neighborAgg(nc, feats, s = 8)
    }),

    // Synchronous label propagation, 4 fixed rounds, min-label
    // tie-break: communities on the symmetrized customer–nation–region
    // containment graph. Deterministic by construction; the oracle
    // replays all 4 rounds.
    "x18_label_prop" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(
        (lit(3L * B) + col("c_custkey")).as("src"),
        (lit(2L * B) + col("c_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      graph.Traversal.labelPropagationMemo(cn.unionByName(nr), rounds = 4)
    }),

    // Tiled image statistics over REAL decoded BMP pixels: 8×8 blocks,
    // exact per-channel sums — patch-level pre-compute; tiles, not
    // pixels, leave the decode task.
    "m7_image_tiles" -> ((s, dir) => {
      val media = operators.Multimodal.encodeBmp(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeBmpTiles(s, media, tile = 8).toDF()
    }),

    // Deterministic weighted sampling (8 draws, P ∝ token count, exact):
    // ticket/min-hash form — the per-row ticket minimum folds in codegen,
    // the global argmin is a struct-min aggregate; no float pow.
    "d_weighted_sample" -> ((s, dir) => {
      val weighted = t(s, dir, "documents").select(col("doc_id"),
        size(operators.Dedup.tokens(col("text"))).cast("long").as("w"))
      operators.Dedup.weightedSample(weighted, "doc_id", "w", draws = 8)
    }),

    // CD8 — sample-quantile sketch next to its exact value: bottom-1024-
    // by-hash uniform sample (one TakeOrdered pass) read at the same
    // ceil-rank rule as the exact refiner; deterministic sample ⇒ the
    // ESTIMATE itself is oracled, and the in-row abs_err shows the
    // O(1/√k) sketch quality (the cd7 carry-exact pattern).
    // Bloom-filter cardinality (Swamidass & Baldi): distinct count
    // estimated from the FILL of an m-bit array with k seeded md5
    // positions — n̂ = −(m/k)·ln(1 − X/m). The linear-sketch counter
    // whose state (m bits) is mergeable by OR across partitions/streams,
    // next to cd2's HLL and cd3's KMV. Self-evaluating (the cd7
    // pattern): the exact distinct count rides in-row and bloom_ok
    // asserts the estimate lands within 10% — bit positions and fill are
    // exact integers any engine reproduces.
    // CountSketch (Charikar–Chen–Farach-Colton): the UNBIASED frequency
    // sketch next to cd5's count-min (which only over-estimates) —
    // signed hashing cancels collision noise in expectation, and the
    // median of d=3 signed cells is exact integer algebra
    // (median-of-3 = sum − max − min). Estimates for cd5's 16 heaviest
    // keys ride next to their exact counts; everything is md5-derived,
    // so both engines build the identical sketch.
    "cd10_countsketch" -> ((s, dir) => {
      val w = 1024L
      // CountSketch is LINEAR, so sketch(corpus) = sketch of the per-key
      // count vector: ONE corpus aggregate (map-side-combined), then all
      // hashing happens on the |keys|-row table — the first cut sketched
      // raw rows (3 unioned corpus scans, 13.8 s at sf1), this form is
      // one aggregate + O(|keys|) work. In a stream you'd feed
      // per-micro-batch partial counts the same way (sw14's pattern).
      // One md5 per key; buckets are disjoint 10-bit fields and signs
      // disjoint single bits of the same 60-bit value.
      // localCheckpoint: the tiny per-key table feeds 7 branches (3 cell
      // selects, top, 3 probe selects) — uncut, EACH replays the corpus
      // aggregate (measured 14.9 s at sf1; cut: one corpus pass)
      val counted = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("string").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("exact"))
        .withColumn("h", functions.Hashing.md5Long(col("k")))
        .localCheckpoint()
      def hb(i: Int) = shiftright(col("h"), 10 * (i - 1)) % w
      def sg(i: Int) = when(
        shiftright(col("h"), 40 + i) % 2 === 0, 1L).otherwise(-1L)
      val cells = (1 to 3).map(i =>
          counted.select(lit(i).as("i"), hb(i).as("b"),
            (sg(i) * col("exact")).as("s")))
        .reduce(_ unionByName _)
        .groupBy(col("i"), col("b")).agg(sum(col("s")).as("c"))
      val top = counted.orderBy(col("exact").desc, col("k")).limit(16)
      val probes = (1 to 3).map(i =>
          top.select(col("k"), col("exact"), lit(i).as("i"),
            hb(i).as("b"), sg(i).as("s")))
        .reduce(_ unionByName _)
      probes.join(cells, Seq("i", "b"))
        .select(col("k"), col("exact"), (col("s") * col("c")).as("est_i"))
        .groupBy(col("k"), col("exact"))
        .agg((sum(col("est_i")) - max(col("est_i")) - min(col("est_i")))
          .as("est"))
        .withColumn("err", col("est") - col("exact"))
    }),

    "cd9_bloom_cardinality" -> ((s, dir) => {
      val m = 65536L
      val vals = t(s, dir, "orders")
        .select(col("o_custkey").cast("string").as("v")).distinct()
      val pos = (1 to 3).map(i =>
          vals.select((functions.Hashing.md5Long(col("v"), i) % m).as("pos")))
        .reduce(_ unionByName _).distinct()
      vals.agg(count(lit(1)).as("n_exact"))
        .crossJoin(pos.agg(count(lit(1)).as("bits_set")))
        .select(lit(m).as("m"), lit(3L).as("k"), col("bits_set"), col("n_exact"),
          floor(lit(-m.toDouble / 3.0)
            * log(lit(1.0) - col("bits_set").cast("double") / lit(m.toDouble))
            * 1000).cast("long").as("est_milli"))
        .withColumn("bloom_ok",
          abs(col("est_milli") - col("n_exact") * 1000) * 10
            <= col("n_exact") * 1000)
    }),

    "cd8_sample_quantiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("lid"))
      val bps = Seq(2500, 5000, 7500, 9000, 9900)
      val est = operators.Sketch.sampleQuantiles(li, "cents", "lid", bps, k = 1024)
      val exact = operators.Sketch.exactQuantiles(li.select(col("cents")), "cents", bps)
        .select(col("bp"), col("value").as("exact"))
      est.join(exact, Seq("bp"))
        .select(col("bp"), col("sample_rank"), col("est"), col("exact"),
          abs(col("est") - col("exact")).as("abs_err"))
    }),

    // A23 — GraphML interchange ROUND TRIP as a BOARD GATE: the
    // write→read loop was spec-only (StorageAndExportSpec on a toy
    // graph); here the real supplier→nation→region subgraph goes
    // GraphML text → DOM parse → PropertyGraph and must census
    // identically to g6's GraphSON loop — one oracle serves both
    // interchange formats, and the reference's Cytoscape export
    // (README.md:386) gains its read direction.
    "a23_graphml_roundtrip" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val sub = PropertyGraph(
        g.V.filter(col("label").isin("supplier", "nation", "region")),
        g.E.filter(expr(s"src div $B").isin(4L, 2L)))
      val tmp = java.nio.file.Files.createTempFile("graft-a23", ".xml").toString
      graph.GraphExport.writeGraphML(sub, tmp)
      val back = graph.GraphExport.readGraphML(s, tmp)
      val vc = back.vertices.groupBy(col("label").as("part"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("key")).as("n_keys"),
          count_distinct(col("props").getItem("name")).as("n_names"))
      val ec = back.edges.agg(count(lit(1)).as("n"),
        sum(col("weight")).cast("long").as("n_keys"),
        count_distinct(col("src")).as("n_names"))
        .select(lit("edges").as("part"), col("n"), col("n_keys"), col("n_names"))
      vc.unionByName(ec)
    }),

    // G6 — typed-GraphSON interchange ROUND TRIP: the supplier→nation→
    // region subgraph exports in the TinkerPop 2.0 module shape
    // (README.md:484-489) and reads back through the schema-pinned
    // reader; the census proves ids, labels, promoted keys, props, and
    // edge weights all survived. Closes the GraphSON loop the way
    // GroovyLoader closed the Groovy one.
    "g6_graphson_roundtrip" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val sub = PropertyGraph(
        g.V.filter(col("label").isin("supplier", "nation", "region")),
        g.E.filter(expr(s"src div $B").isin(4L, 2L)))
      val tmp = java.nio.file.Files.createTempDirectory("graft-g6").toString
      graph.GraphExport.writeGraphsonTyped(sub, tmp)
      val back = graph.GraphExport.readGraphsonTyped(s, tmp)
      val vc = back.vertices.groupBy(col("label").as("part"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("key")).as("n_keys"),
          count_distinct(col("props").getItem("name")).as("n_names"))
      val ec = back.edges.agg(count(lit(1)).as("n"),
        sum(col("weight")).cast("long").as("n_keys"),
        count_distinct(col("src")).as("n_names"))
        .select(lit("edges").as("part"), col("n"), col("n_keys"), col("n_names"))
      vc.unionByName(ec)
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

    // Cross-source contamination matrix: exact Jaccard of shingle SETS
    // between every source pair — "which ingestion feeds overlap". The
    // per-source set sizes and pairwise intersections come from one
    // distinct (source, shingle) table; the self-join's per-shingle
    // fan-out is bounded by #sources², not corpus size.
    "d_source_overlap" -> ((s, dir) => {
      val ss = t(s, dir, "documents")
        .select(col("source"),
          explode(operators.Dedup.shingles(col("text"))).as("sh"))
        .distinct()
      val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      ss.join(ss.select(col("source").as("source_b"), col("sh")), Seq("sh"))
        .filter(col("source") < col("source_b"))
        .groupBy(col("source").as("source_a"), col("source_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("source").as("source_a"), col("sz").as("sz_a")),
          Seq("source_a"))
        .join(sizes.select(col("source").as("source_b"), col("sz").as("sz_b")),
          Seq("source_b"))
        .select(col("source_a"), col("source_b"), col("inter"),
          col("sz_a"), col("sz_b"),
          expr("inter * 1000000L div (sz_a + sz_b - inter)").as("jaccard_micro"))
    }),

    // Fuzzy entity-key join: Levenshtein ≤ 1 customer-name pairs via
    // deletion-neighborhood blocking (FastSS) — candidates share a
    // deletion variant, exact levenshtein verifies candidates ONLY;
    // the corpus is never cross-joined (the oracle, being SQL, is).
    "d_fuzzy_join" -> ((s, dir) => {
      operators.Dedup.editNeighbors(t(s, dir, "customer"), "c_custkey", "c_name")
    }),

    // Incremental aggregate maintenance: the q1-style summary rebuilt by
    // MERGING yesterday's partial state with the delta partition's —
    // sums/counts are algebraic, so the merged result is bit-equal to the
    // full recompute (the oracle computes the full form). The refresh
    // pattern that makes a 100 TB daily stats job delta-sized.
    "r4_incremental_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val slice = graft.functions.Hashing.md5Long(col("l_orderkey")) % 10
      def partial(df: DataFrame) = df.groupBy(
          col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"))
      partial(li.filter(slice >= 1)).unionByName(partial(li.filter(slice < 1)))
        .groupBy(col("returnflag"), col("linestatus"))
        .agg(sum(col("sum_qty")).as("sum_qty"), sum(col("n")).as("n"))
        .withColumn("avg_qty_micro", expr("sum_qty * 1000000 div n"))
    }),

    // KMV sketch set algebra: distinct of A, B, A∪B, A∩B from two k-min
    // sketches (theta-sketch intersection rule, integer math) with the
    // exact four counts riding along — sketch-level set operations, the
    // capability that replaces re-scanning raw sets.
    "cd7_kmv_setops" -> ((s, dir) => {
      val keys = t(s, dir, "lineitem").select(col("l_orderkey").as("key"))
      // slice by a SEEDED hash so membership is independent of the
      // sketch's own hash values (same-hash slicing would bias the k-mins)
      val slice = graft.functions.Hashing.md5Long(col("key"), 9) % 100
      operators.Sketch.kmvSetOps(
        keys.filter(slice < 60), keys.filter(slice >= 40), "key", k = 256)
    }),

    // EXACT percentiles with NO global sort: iterative power-of-two range
    // refinement (Sketch.exactQuantiles) — each pass is one bucketized
    // aggregation scan, all five targets ride the same passes. The
    // orderBy-free answer to "p50/p99 of a 100 TB column".
    "cd6_quantiles_nosort" -> ((s, dir) => {
      val cents = t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      operators.Sketch.exactQuantiles(cents, "cents", Seq(2500, 5000, 7500, 9000, 9900))
    }),

    // Winsorization at exact p1/p99 (the sort-free quantiles composed
    // into outlier capping): values clip into [p1, p99], clip counts
    // audited — the robust-statistics cleaning pass.
    "f6_winsorize" -> ((s, dir) => {
      val cents = t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      val th = operators.Sketch.exactQuantiles(cents, "cents", Seq(100, 9900))
        .groupBy().agg(
          min(when(col("bp") === 100, col("value"))).as("lo"),
          min(when(col("bp") === 9900, col("value"))).as("hi"))
      cents.crossJoin(broadcast(th)).agg(
        count(lit(1)).as("n"),
        sum(greatest(least(col("cents"), col("hi")), col("lo"))).as("sum_winsorized"),
        sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_clipped_high"))
    }),

    // Framed audio features over REAL decoded PCM16: 256-sample frames,
    // integer-exact energy and zero-crossing counts — the VAD/silence
    // front-end, computed inside the decode task (samples never shuffle).
    "m6_audio_features" -> ((s, dir) => {
      val media = operators.Multimodal.encodeWav(s, t(s, dir, "documents"), "doc_id", "text")
      operators.Multimodal.decodeWavFrames(s, media, frameLen = 256).toDF()
    }),

    // Degree histogram of the whole graph: out-degree -> #vertices,
    // INCLUDING the outdeg=0 bucket (sink vertices never appear as src).
    "x5_degree_histogram" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      val deg = g.E.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
      g.V.select(col("id")).join(deg, Seq("id"), "left")
        .select(coalesce(col("outdeg"), lit(0L)).as("outdeg"))
        .groupBy(col("outdeg")).agg(count(lit(1)).as("n_vertices"))
    }),

    // End-to-end near-dup CLUSTERING: LSH candidate pairs -> undirected
    // transitive closure -> canonical (minimum) doc per dup cluster. The
    // "keep one per cluster" pass every training-data dedup ends with,
    // composed from the capped LSH join and the cycle-safe fixpoint
    // (clusters are symmetric graphs — cycles by construction).
    "d_dup_clusters" -> ((s, dir) => {
      // Min-id label propagation (state O(vertices)), NOT the all-pairs
      // transitive closure: a web-scale boilerplate cluster of 10⁵-10⁶
      // near-identical docs would make the closure materialize 10¹⁰-10¹²
      // (origin, node) rows, while the label column stays one row per doc.
      // min-over-closure ≡ min label, so the WITH RECURSIVE oracle is
      // unchanged. NOTE the oracle mirrors the UNCAPPED pipeline: parity
      // holds below the 8192 hot-bucket cap (guaranteed at gate scales —
      // sf docs < 8192); the capped path is spec-covered instead.
      val pairs = operators.Dedup.lshCandidates(t(s, dir, "documents"), "doc_id", "text")
      graph.Traversal.minLabel(pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
        .select(col("id").as("doc_id"), col("label").as("canonical"))
    }),

    // Quality-aware canonical: d_dup_clusters' cluster labels with the
    // representative chosen by MAX quality score (tie → min id) instead
    // of min id — the keep-the-cleanest-copy rule production dedup
    // applies. Singletons (docs in no pair) are their own cluster and
    // keep themselves. Argmax is two hash aggregates, not a per-cluster
    // sort window (see Dedup.keepBest). Same oracle-parity note as
    // d_dup_clusters: the WITH RECURSIVE oracle mirrors the uncapped
    // pair join, exact below the 8192 hot-bucket cap; quality values
    // are the floor4-quantized engine-exact t_quality_score numbers,
    // so cross-engine argmax agreement is exact, not approximate.
    "d_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val q = operators.TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      val pairs = operators.Dedup.lshCandidates(docs, "doc_id", "text")
      val clusters = graph.Traversal.minLabel(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      val members = docs.select(col("doc_id"))
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster"))
      operators.Dedup.keepBest(members, q, "doc_id", "cluster", "quality")
    }),

    // The dedup pipeline END-TO-END, one plan: LSH candidate pairs →
    // min-label clustering → quality-aware keep-best → the CANONICAL
    // CORPUS itself — one row per surviving document with the cluster it
    // represents, how many members it absorbed, and its token count (the
    // numbers a corpus card reports after dedup). The dedup twin of
    // d_pipeline_quality's chain gate: every stage is separately oracled
    // (d_minhash_lsh, d_dup_clusters, d_keep_best); this verifies the
    // composition. Same uncapped-oracle parity note as d_dup_clusters.
    "d_pipeline_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val q = operators.TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      val pairs = operators.Dedup.lshCandidates(docs, "doc_id", "text")
      val clusters = graph.Traversal.minLabel(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      val members = docs.select(col("doc_id"))
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster"))
      val kb = operators.Dedup.keepBest(members, q, "doc_id", "cluster", "quality")
      val sizes = kb.groupBy(col("canonical")).agg(count(lit(1)).as("n_members"))
      kb.filter(col("keep"))
        .join(sizes, Seq("canonical"))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .select(col("doc_id"), col("canonical"), col("quality"), col("n_members"),
          size(operators.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    }),

    // SEMANTIC dedup end-to-end: embedding-cosine near-dup pairs (e3's
    // IVF-style label blocking) → min-id label propagation → canonical
    // representative per embedding-similarity cluster — the
    // embedding-space twin of d_dup_clusters' lexical MinHash pipeline.
    // Same oracle-parity note as d_dup_clusters: the WITH RECURSIVE
    // oracle mirrors the uncapped pair join, exact below the 8192 cap.
    "d_semantic_dup" -> ((s, dir) => {
      val pairs = operators.Similarity.cosineNearDup(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label",
        threshold = 0.3, native = true)
      graph.Traversal.minLabel(pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
        .select(col("id").as("vec_id"), col("label").as("canonical"))
    }),

    // Matryoshka prefix truncation + L2 renormalize (16 of 64 dims),
    // exploded to scalar rows for the comparator.
    "e6_matryoshka" -> ((s, dir) => {
      operators.Similarity.matryoshka(t(s, dir, "embeddings"), "vec_id", "embedding", 16)
        .select(col("vec_id"), posexplode(col("mvec")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("val"))
    }),

    // Concat-and-chunk sequence packing: 512-token context windows over
    // 8 deterministic shards (per-shard prefix-sum window — no global
    // single-reducer ordering at any corpus size).
    "t_pack_chunks" -> ((s, dir) => {
      operators.TextAnalysis.packChunks(t(s, dir, "documents"), "doc_id", "text", budget = 512)
    }),

    // Train<->benchmark contamination: shared distinct 3-gram counts for
    // pairs over the threshold; bench = the deterministic 10% hash sample,
    // train = the rest (the pre-training decontamination pass).
    "d_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = operators.Dedup.hashSample(docs, "doc_id", 10).drop("bucket")
      val train = docs.join(bench.select("doc_id"), Seq("doc_id"), "left_anti")
      operators.Dedup.contamination(train, bench, "doc_id", "text")
    }),

    // Exact substring-duplication spans (Lee et al. 2021 shape): 8-token
    // windows whose hash recurs in >= 2 docs, one row per flagged span.
    "d_substring_spans" -> ((s, dir) => {
      operators.Dedup.substringSpans(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Span-level decontamination: 8-token windows of the train split
    // (doc_id % 10 != 0) that appear verbatim anywhere in the held-out
    // probe split (doc_id % 10 = 0) — the cross-corpus twin of
    // d_substring_spans, finding the LEAKED SPAN at its position where
    // d_contamination can only flag the whole document.
    "d_cross_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Dedup.crossSpans(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
    }),

    // Merged duplicated-span cut list: gaps-and-islands union of the
    // flagged 8-token windows into maximal per-doc token intervals.
    "d_span_intervals" -> ((s, dir) => {
      operators.Dedup.spanIntervals(
        operators.Dedup.substringSpans(t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", k = 8)
    }),

    // Cross-corpus decontamination END-TO-END in one plan: train spans
    // that leak from the probe split (crossSpans) → merged intervals
    // (spanIntervals) → train docs rebuilt with the leaked spans cut out
    // (applyCuts). Each stage is separately oracled (d_cross_spans,
    // d_span_intervals, d_apply_cuts); this gate verifies the CHAIN —
    // the decontamination twin of d_pipeline_quality's composition.
    "d_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      val leaks = operators.Dedup.crossSpans(
        train, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      operators.Dedup.applyCuts(train,
        operators.Dedup.spanIntervals(leaks, "doc_id", k = 8), "doc_id", "text")
    }),

    // The apply half of substring dedup end-to-end: recurring 8-token
    // windows → merged intervals → documents rebuilt with the intervals
    // cut out (clean_text + removed-token count, uncut docs unchanged).
    "d_apply_cuts" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.Dedup.applyCuts(docs,
        operators.Dedup.spanIntervals(
          operators.Dedup.substringSpans(docs, "doc_id", "text"), "doc_id", k = 8),
        "doc_id", "text")
    }),

    // Content-defined chunking dedup (FastCDC at token granularity):
    // boundaries after md5≡0 (mod 8) words, per-doc share of chunks that
    // recur anywhere in the corpus — catches shared boilerplate BLOCKS
    // that whole-doc fingerprints and fixed-stride windows both miss,
    // position-shift-proof because boundaries are content-local.
    "d_cdc_chunks" -> ((s, dir) => {
      operators.Dedup.cdcChunkDedup(t(s, dir, "documents"), "doc_id", "text")
    }),

    // Exact closeness centrality (Wasserman–Faust) — the fourth read-out
    // of the ONE memoized distance sweep (x11/x14/x21/x25's): integer
    // reach/dist-sum statistics, one floored micro division.
    "x26_closeness" -> ((s, dir) => {
      graph.Traversal.closenessCentrality(snrUndirected(s, dir), maxHop = 5)
    }),

    // Newman modularity of the x18 label-prop partition, exact in
    // integers (one numerator, one denominator, one floored division) —
    // the "was that community structure real?" score next to x18.
    "x27_modularity" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(
        (lit(3L * B) + col("c_custkey")).as("src"),
        (lit(2L * B) + col("c_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      val edges = cn.unionByName(nr)
      graph.Traversal.modularity(edges,
        graph.Traversal.labelPropagationMemo(edges, rounds = 4))
    }),

    // Densest-subgraph parallel peel (Bahmani ε=0): the whole round
    // trace — exact integer peel condition deg·n ≤ m2, floored micro
    // density per round — over the customer–nation–region graph. The
    // leaf customers peel away and density concentrates on the
    // dimension core.
    "x28_densest" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(
        (lit(3L * B) + col("c_custkey")).as("src"),
        (lit(2L * B) + col("c_nationkey")).as("dst"))
      val nr = t(s, dir, "nation").select(
        (lit(2L * B) + col("n_nationkey")).as("src"),
        (lit(1L * B) + col("n_regionkey")).as("dst"))
      graph.Traversal.densestSubgraphTrace(cn.unionByName(nr), rounds = 6)
    }),

    // Column-profile report over lineitem's numeric measures (the
    // dataset-card statistic block next to dq1's expectations): per
    // column, rows / nulls / distincts / min / max / sum — all in exact
    // cents. One scan, four map-side-combinable aggregates unioned.
    "dq3_profile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def prof(name: String): DataFrame = {
        val cents = floor(col(name) * 100 + 0.5).cast("long")
        li.agg(
          count(lit(1)).as("n_rows"),
          sum(col(name).isNull.cast("long")).as("n_null"),
          countDistinct(cents).as("n_distinct"),
          min(cents).as("min_cents"),
          max(cents).as("max_cents"),
          sum(cents).as("sum_cents"))
          .select(lit(name).as("column"), col("*"))
      }
      prof("l_quantity").unionByName(prof("l_extendedprice"))
        .unionByName(prof("l_discount")).unionByName(prof("l_tax"))
    }),

    // Pearson correlation of quantity (units) vs discount (cents), exact
    // integer sufficient statistics; the single float op is ONE
    // correctly-rounded IEEE sqrt (bit-identical cross-engine, unlike a
    // float Σ), so the floor is engine-exact. Sums stay inside int64 to
    // ~10⁸ rows at these magnitudes ((Σx)² is the binding product);
    // larger corpora shift the statistic to per-partition deltas first.
    "dq5_correlation" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("x"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("varx_num"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("vary_num"))
        .withColumn("corr_micro",
          when(col("varx_num") <= 0 || col("vary_num") <= 0, lit(0L))
            .otherwise(floor(lit(1000000d) * col("cov_num").cast("double")
              / sqrt(col("varx_num").cast("double") * col("vary_num").cast("double")))
              .cast("long")))
    }),

    // PSI drift between 1996- and 1997-shipped price distributions over
    // 10 fixed $10k buckets — dataset-shift detection between snapshots.
    // Counts exact; the term is one mirrored IEEE expression (two exact
    // divides and one ln of an exact-integer ratio, t_bm25 convention).
    "dq7_psi" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .select(year(col("l_shipdate")).as("yr"),
          expr("least(9L, cast(floor(l_extendedprice * 100 + 0.5) as bigint) div 1000000)")
            .as("bucket"))
        .filter(col("yr").isin(1996, 1997))
      val agg = base.groupBy(col("bucket")).agg(
        sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("p"),
        sum(when(col("yr") === 1997, 1L).otherwise(0L)).as("q"))
      val tots = agg.agg(sum(col("p")).as("np"), sum(col("q")).as("nq"))
      agg.crossJoin(broadcast(tots))
        .filter(col("p") > 0 && col("q") > 0)
        .select(col("bucket"), col("p"), col("q"),
          floor(lit(1000000d)
            * (col("p").cast("double") / col("np").cast("double")
              - col("q").cast("double") / col("nq").cast("double"))
            * log((col("p") * col("nq")).cast("double")
              / (col("q") * col("np")).cast("double")))
            .cast("long").as("psi_term_micro"))
    }),

    // Frequent co-ordered part pairs (market-basket mining): distinct
    // (order, part) pairs self-joined within the order key — per-order
    // fan-out is (basket choose 2), bounded by basket size, the classic
    // a-priori first pass. Support ≥ 2, top-20 fully tie-broken.
    "k2_frequent_pairs" -> ((s, dir) => {
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      op.join(op.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .groupBy(col("pk").as("part_a"), col("pk2").as("part_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(col("support").desc, col("part_a"), col("part_b"))
        .limit(20)
    }),

    // Association rules from the k2 pair supports: confidence and lift
    // per directed rule in exact integer micro units — the second
    // a-priori pass (rule generation) that turns co-occurrence counts
    // into rankable implications. Per-item supports and the basket count
    // ride broadcast joins; nothing beyond k2's pair aggregate shuffles.
    "k3_assoc_rules" -> ((s, dir) => {
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val nb = op.agg(countDistinct(col("ok")).as("n"))
      val item = op.groupBy(col("pk")).agg(count(lit(1)).as("sup"))
      val pairs = op.join(op.select(col("ok"), col("pk").as("pk2")), Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .groupBy(col("pk"), col("pk2")).agg(count(lit(1)).as("sup_ab"))
        .filter(col("sup_ab") >= 2)
      val rules = pairs.select(col("pk").as("ante"), col("pk2").as("cons"), col("sup_ab"))
        .unionByName(pairs.select(col("pk2").as("ante"), col("pk").as("cons"), col("sup_ab")))
      rules
        .join(broadcast(item.select(col("pk").as("ante"), col("sup").as("sup_a"))), Seq("ante"))
        .join(broadcast(item.select(col("pk").as("cons"), col("sup").as("sup_c"))), Seq("cons"))
        .crossJoin(broadcast(nb))
        .select(col("ante"), col("cons"), col("sup_ab"),
          col("sup_a"), col("sup_c"),
          expr("sup_ab * 1000000L div sup_a").as("conf_micro"),
          expr("sup_ab * n * 1000000L div (sup_a * sup_c)").as("lift_micro"))
        .orderBy(col("conf_micro").desc, col("ante"), col("cons"))
        .limit(40)
    }),

    // Functional-dependency audit: for each declared A→B, how many A
    // values map to >1 distinct B (violations) and the worst fan-out —
    // the schema-inference / key-discovery primitive next to dq2's
    // referential check. Each FD is one two-level aggregate (map-side
    // partial per (A, B), then per-A distinct count); nothing joins.
    "dq8_fd_check" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ords = t(s, dir, "orders")
      def fd(df: DataFrame, name: String, a: String, b: String) =
        df.groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
            max(col("nb")).as("max_rhs_distinct"))
          .select(lit(name).as("fd"), col("n_lhs"),
            col("n_violating_lhs"), col("max_rhs_distinct"))
      fd(li, "l_orderkey->l_linestatus", "l_orderkey", "l_linestatus")
        .unionByName(fd(li, "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"))
        .unionByName(fd(li, "l_partkey->l_suppkey", "l_partkey", "l_suppkey"))
        .unionByName(fd(ords, "o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"))
    }),

    // Median-absolute-deviation outlier screen over extendedprice cents —
    // the robust alternative to dq1's fixed-range expectations (a mean±3σ
    // rule moves with the outliers it is hunting; two exact medians do
    // not). Both medians come from the sort-free quantile refiner, the
    // 3·1.4826 normal-consistency cut is the exact rational 44478/10000,
    // so no float enters and both engines count identical outliers.
    "dq9_mad_outliers" -> ((s, dir) => {
      val cents = t(s, dir, "lineitem")
        .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      operators.Sketch.madOutliers(cents, "cents")
    }),

    // Join-cardinality statistic (what a cost-based optimizer estimates
    // from per-key histograms, here computed exactly): |A ⋈ B| =
    // Σ_k cnt_A(k)·cnt_B(k) from two tiny per-key aggregates — then
    // self-proved against the actual join count in the same row. The
    // 100 TB use is running the PREDICTION side only: two aggregates
    // instead of materializing a join you may not afford.
    "dq11_join_size" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ords = t(s, dir, "orders")
      val lc = li.groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("ca"))
      val oc = ords.groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("cb"))
      val pred = lc.join(oc, Seq("k"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("predicted"))
      val actual = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("actual"))
      pred.crossJoin(actual)
        .withColumn("stat_exact", col("predicted") === col("actual"))
    }),

    // k-anonymity audit over quasi-identifiers (nation, market
    // segment): any combination shared by fewer than k=5 customers is a
    // re-identification risk — the privacy gate a training-data release
    // runs next to t_redact's PII scrub. Per-cell census with the
    // at-risk verdict in-row; one map-side-combinable aggregate.
    "dq12_k_anonymity" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nationkey"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"))
        .withColumn("at_risk", col("n") < 5)
    }),

    // Shannon entropy profile of the categorical columns — the
    // class-balance statistic next to dq3's numeric block (a collapsed
    // enum shows up as entropy ≈ 0 long before a referential check
    // fails). Deterministic integer form: each value's surprise
    // ⌊10⁶·ln(n/cnt)⌋ floors FIRST, the weighted sum and final div are
    // exact — a ≤1e-6-per-term lower bound both engines compute
    // identically (the t_bm25 ln discipline).
    "dq10_entropy" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ords = t(s, dir, "orders")
      def ent(df: DataFrame, name: String): DataFrame = {
        val cnts = df.groupBy(col(name).cast("string").as("v"))
          .agg(count(lit(1)).as("cnt"))
        val tot = cnts.agg(sum(col("cnt")).as("n"),
          count(lit(1)).as("n_distinct"))
        cnts.crossJoin(broadcast(tot))
          .select(col("n"), col("n_distinct"),
            (col("cnt") * floor(log(col("n").cast("double")
              / col("cnt").cast("double")) * 1000000).cast("long")).as("term"))
          .groupBy(col("n"), col("n_distinct"))
          .agg(sum(col("term")).as("mass"))
          .select(lit(name).as("column"), col("n"), col("n_distinct"),
            expr("mass div n").as("entropy_micro"))
      }
      ent(li, "l_linestatus").unionByName(ent(li, "l_returnflag"))
        .unionByName(ent(ords, "o_orderstatus"))
        .unionByName(ent(ords, "o_orderpriority"))
    }),

    // Benford first-digit audit over extendedprice cents: observed
    // frequency vs the log-law expectation per digit — the fraud/synthetic-
    // data smell test next to dq1's expectations.
    "dq6_benford" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val digits = t(s, dir, "lineitem")
        .select(substring(cents.cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
      val tot = digits.agg(sum(col("observed")).as("n"))
      digits.crossJoin(broadcast(tot))
        .select(col("digit"), col("observed"),
          expr("observed * 1000000L div n").as("obs_micro"),
          floor(lit(1000000d)
            * log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
            / log(lit(10.0))).cast("long").as("benford_micro"))
    }),

    // Q2-style min-price supplier: for each small part, the EUROPE
    // suppliers quoting the regional minimum lineitem price — the
    // correlated-min pattern. No arithmetic touches the doubles (min +
    // equality on stored values), so the gate is bit-exact by reading.
    "q2_min_price_supplier" -> ((s, dir) => {
      val offers = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("l_partkey"), col("s_name"), col("l_extendedprice"))
      val minp = offers.groupBy(col("l_partkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
      offers.join(minp, Seq("l_partkey"))
        .filter(col("l_extendedprice") === col("min_price"))
        .join(t(s, dir, "part").filter(col("p_size") < 10),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey").as("partkey"), col("p_name").as("part_name"),
          col("s_name").as("supplier_name"), col("min_price"))
        .distinct()
    }),

    // Q9-style product-type profit (no supplycost column, so cost =
    // half retail per unit): profit by supplier nation × order year over
    // the widget product line. Exact 10⁻⁴-dollar integer per line (prices
    // 2dp-exact, quantity integral; 0.5·retail·qty = 50·retail_cents·qty),
    // summed order-invariantly, one division at the end.
    "q9_product_profit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "part").filter(col("p_name").contains("widget")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(money(sumExact(c4(col("l_extendedprice"), col("l_discount"))
          - lit(50L) * cents(col("p_retailprice")) * col("l_quantity").cast("long")),
          10000L).as("profit"))
    }),

    // Q11-style important stock: parts whose NATION_1-supplied revenue
    // mass exceeds 0.1% of the nation's total — the scalar-subquery
    // threshold rides the same plan as a broadcast 1-row aggregate, both
    // sides pinned to 2dp before the comparison.
    "q11_important_stock" -> ((s, dir) => {
      val natLines = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_1")
        .select(col("l_partkey"), col("l_extendedprice"))
      // part_cents·1000 > nation_cents is the exact form of
      // part_value > 0.1% of nation value — no FP threshold.
      val perPart = natLines.groupBy(col("l_partkey").as("partkey"))
        .agg(sumExact(cents(col("l_extendedprice"))).as("pv_c"))
      val thr = natLines.agg(sumExact(cents(col("l_extendedprice"))).as("tot_c"))
      perPart.crossJoin(broadcast(thr))
        .filter(col("pv_c") * 1000 > col("tot_c"))
        .select(col("partkey"), money(col("pv_c"), 100L).as("part_value"))
    }),

    // Q13-style customer distribution: how many customers placed k
    // non-urgent orders (k = 0 included via the left join) — the
    // two-level aggregate over a left outer join.
    "q13_customer_distribution" -> ((s, dir) => {
      val nonUrgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      t(s, dir, "customer")
        .join(nonUrgent, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // Q15-style top supplier: revenue by supplier over one quarter, keep
    // the max-revenue supplier(s) — the max pinned to the same 2dp-
    // rounded value both sides of the equality (the q22 broadcast-
    // aggregate pattern, no driver round-trip).
    "q15_top_supplier" -> ((s, dir) => {
      // max + equality over the exact integer revenue, so ties at the
      // top are genuine ties, not rounding accidents
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-07-01") &&
          col("l_shipdate") < lit("1997-10-01"))
        .groupBy(col("l_suppkey"))
        .agg(sumExact(c4(col("l_extendedprice"), col("l_discount"))).as("rev_c4"))
      val mx = rev.agg(max(col("rev_c4")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_c4") === col("mx"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_suppkey").as("suppkey"), col("s_name").as("name"),
          money(col("rev_c4"), 10000L).as("total_revenue"))
    }),

    // Q16-style parts/supplier relationship census: distinct suppliers
    // per (brand, type, size) from the lineitem-evidenced part↔supplier
    // pairs, excluding one brand and negative-balance ("complaint")
    // suppliers. All keys and counts integer/string — engine-exact.
    "q16_parts_supplier" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(t(s, dir, "supplier").filter(col("s_acctbal") >= 0),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .join(t(s, dir, "part").filter(col("p_brand") =!= "Brand#1"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"), col("p_type").as("ptype"),
          col("p_size").cast("long").as("psize"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // Q20-style potential promo: suppliers who moved > 500 units of
    // 'small …' parts in 1997 (integral-quantity sums are exact in
    // doubles), named with their nation — the nested-IN chain.
    "q20_potential_promo" -> ((s, dir) => {
      val movers = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01"))
        .join(t(s, dir, "part").filter(col("p_name").startsWith("small")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 500)
      t(s, dir, "supplier")
        .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name").as("name"), col("n_name").as("nation"))
    }),

    // Q21-style suppliers who kept orders waiting (late = shipped > 90
    // days after the order date, the q12 convention): the supplier's
    // line was late on a finished multi-supplier order where NO other
    // supplier was late — one semi-join, one anti-join, both on the
    // order key. Top 20 by blocked-order count.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val lo = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (datediff(col("l_shipdate"), col("o_orderdate")) > 90).as("late"))
      val base = lo.filter(col("late")).select(col("ok"), col("sk")).distinct()
      val others = lo.select(col("ok").as("ok2"), col("sk").as("osk")).distinct()
      val lateOthers = lo.filter(col("late"))
        .select(col("ok").as("ok3"), col("sk").as("lsk")).distinct()
      base
        .join(others, col("ok") === col("ok2") && col("osk") =!= col("sk"),
          "left_semi")
        .join(lateOthers, col("ok") === col("ok3") && col("lsk") =!= col("sk"),
          "left_anti")
        .join(t(s, dir, "supplier"), col("sk") === col("s_suppkey"))
        .groupBy(col("s_name").as("name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("name"))
        .limit(20)
    }),

    // Symmetric int8 embedding quantization (q vector + 6dp scale).
    // The gate projects the int8 vector to a CSV string: the driver's
    // comparator canonicalizes by lexsorting column values, which crashes
    // on array-typed cells, so arrays never cross the gate boundary.
    "e5_quantize_int8" -> ((s, dir) => {
      operators.Similarity.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"),
          concat_ws(",", transform(col("q"), _.cast("string"))).as("q_csv"),
          col("scale"))
    })
  )

  // ---------------------------------------------------------------- oracles

  /** Unrolled peel SQL for the x9_kcore oracle. ANSI SQL cannot loop to a
    * fixpoint (recursive CTEs forbid aggregation in the recursive term),
    * so the peel is UNROLLED: each round keeps edges whose endpoints both
    * hold degree ≥ k. Peeling is idempotent past the fixpoint, so the
    * unroll only needs to be ≥ the true peel depth — measured 5 rounds at
    * every SF (k=3); 10 leaves margin, and the Spark side throws if its
    * own fixpoint loop ever exceeds maxIter rather than under-peel. */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
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
  private def misOracleSql(rounds: Int): String = {
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
  private def bpeRoundsCtes(rounds: Int): String = {
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

  private def bpeLearnOracleSql(rounds: Int): String = {
    val out = (1 to rounds).map { r =>
      s"SELECT $r AS round, split_part(pair, ' ', 1) AS merge_left, " +
        s"split_part(pair, ' ', 2) AS merge_right, cnt FROM b$r"
    }.mkString("\nUNION ALL ")
    s"${bpeRoundsCtes(rounds)}\n$out"
  }

  private def bpeApplyOracleSql(rounds: Int): String = {
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

  /** DuckDB-runnable ANSI SQL over the same parquet tables, same column
    * names/aliases as the Spark results. */
  def oracleSql: Map[String, String] = Map(

    "x9_kcore" -> kcoreOracleSql(k = 3, rounds = 10),

    "x12_mis" -> misOracleSql(rounds = 8),

    // 2 HITS iterations unrolled: each is hub-sum → max-normalize →
    // auth-sum → max-normalize, all integer.
    "x17_hits" -> {
      // One half-step: sum `inCol` of `prev` over edges joined on
      // `joinEnd`, grouped by `groupEnd`, then integer max-normalize
      // into `outCol` of CTE `out`.
      def half(prev: String, inCol: String, joinEnd: String, groupEnd: String,
               out: String, outCol: String) =
        s"""${out}r AS (SELECT v.id, coalesce(s.s, 0) AS raw FROM v LEFT JOIN (
           |  SELECT e.$groupEnd AS id, sum(p.$inCol) AS s
           |  FROM e JOIN $prev p ON p.id = e.$joinEnd GROUP BY e.$groupEnd) s USING (id)),
           |$out AS (SELECT id, CAST(raw * 1000000 // greatest((SELECT max(raw) FROM ${out}r), 1) AS BIGINT) AS $outCol FROM ${out}r)"""
          .stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT 3*72057594037927936 + c_custkey AS src,
         |    2*72057594037927936 + c_nationkey AS dst FROM customer
         |  UNION SELECT 4*72057594037927936 + s_suppkey, 2*72057594037927936 + s_nationkey FROM supplier
         |  UNION SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
         |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT id, 1000000 AS hub FROM v),
         |${half("h0", "hub", "src", "dst", "a1", "auth")},
         |${half("a1", "auth", "dst", "src", "h1", "hub")},
         |${half("h1", "hub", "src", "dst", "a2", "auth")},
         |${half("a2", "auth", "dst", "src", "h2", "hub")}
         |SELECT a2.id, a2.auth AS auth_micro, h2.hub AS hub_micro
         |FROM a2 JOIN h2 USING (id)""".stripMargin
    },

    // Same md5 sample ranks, same cent conversion, same capped sum.
    "x20_neighbor_agg" ->
      s"""WITH e AS (SELECT DISTINCT 2*72057594037927936 + c_nationkey AS src,
         |    3*72057594037927936 + c_custkey AS dst FROM customer),
         |r AS (SELECT src, dst, row_number() OVER (PARTITION BY src
         |    ORDER BY ${md5i("CAST(src AS VARCHAR) || '#agg#' || CAST(dst AS VARCHAR)")}, dst) AS rn
         |  FROM e),
         |f AS (SELECT 3*72057594037927936 + c_custkey AS dst,
         |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS feature FROM customer)
         |SELECT r.src AS id, count(*) AS n_sampled,
         |  CAST(sum(f.feature) AS BIGINT) AS feat_sum
         |FROM r JOIN f USING (dst) WHERE rn <= 8 GROUP BY r.src""".stripMargin,

    // Wedge join + integer RA scoring + adjacency anti-join + per-u
    // top-3 window, replayed exactly.
    "x19_link_predict" ->
      """WITH e0 AS (
        |  SELECT DISTINCT 4*72057594037927936 + s_suppkey AS src,
        |    2*72057594037927936 + s_nationkey AS dst FROM supplier
        |  UNION SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
        |u AS (SELECT src, dst FROM e0 WHERE src <> dst
        |  UNION SELECT dst, src FROM e0 WHERE src <> dst),
        |deg AS (SELECT src AS w, count(*) AS wdeg FROM u GROUP BY src),
        |wedge AS (SELECT a.src AS u, a.dst AS w, b.dst AS v
        |  FROM u a JOIN u b ON a.dst = b.src WHERE a.src <> b.dst),
        |sc AS (SELECT wedge.u, wedge.v, count(*) AS common_neighbors,
        |    CAST(sum(1000000 // deg.wdeg) AS BIGINT) AS ra_micro
        |  FROM wedge JOIN deg ON deg.w = wedge.w
        |  GROUP BY wedge.u, wedge.v),
        |nonadj AS (SELECT sc.* FROM sc
        |  WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.src = sc.u AND u.dst = sc.v))
        |SELECT u, v, common_neighbors, ra_micro,
        |  CAST(row_number() OVER (PARTITION BY u
        |    ORDER BY ra_micro DESC, common_neighbors DESC, v) AS INTEGER) AS rank
        |FROM nonadj QUALIFY rank <= 3""".stripMargin,

    // 4 synchronous LPA rounds unrolled: per round the min-mode
    // neighbor label via a count window, isolated fallback to self.
    "x18_label_prop" -> s"""$labelPropCtes
      |SELECT id, label FROM l4""".stripMargin,

    // Modularity of the same partition: the label-prop chain replayed,
    // then the pure-integer sufficient statistics and one explicit
    // truncate-toward-zero micro division (matching Spark's `div`).
    "x27_modularity" ->
      s"""$labelPropCtes,
         |e2 AS (SELECT u.src, u.dst, ls.label AS sl, ld.label AS dl
         |  FROM u JOIN l4 ls ON ls.id = u.src JOIN l4 ld ON ld.id = u.dst),
         |perc AS (SELECT sl, count(*) AS deg_c,
         |  sum(CASE WHEN sl = dl THEN 1 ELSE 0 END) AS intra_c FROM e2 GROUP BY sl),
         |tot AS (SELECT count(*) AS n_communities, sum(deg_c) AS m2,
         |  sum(intra_c) AS intra_total, sum(deg_c * deg_c) AS deg_sq FROM perc)
         |SELECT CAST(n_communities AS BIGINT) AS n_communities,
         |  CAST(m2 AS BIGINT) AS m2,
         |  CAST(intra_total * m2 - deg_sq AS BIGINT) AS q_num,
         |  CAST(m2 * m2 AS BIGINT) AS q_den,
         |  CAST(CASE WHEN intra_total * m2 - deg_sq >= 0
         |    THEN (intra_total * m2 - deg_sq) * 1000000 // (m2 * m2)
         |    ELSE -((deg_sq - intra_total * m2) * 1000000 // (m2 * m2)) END
         |    AS BIGINT) AS q_micro
         |FROM tot""".stripMargin,

    // The peel unrolled: per round the exact integer stats, the
    // deg·n ≤ m2 peel set, and the surviving edge set. Every round CTE
    // is MATERIALIZED: each e_r is referenced three times by round r+1,
    // and DuckDB's default CTE inlining would expand the chain into
    // 3⁶ re-reads of the parquet view (measured: file-handle exhaustion).
    "x28_densest" -> {
      val rounds = (1 to 6).map { r =>
        s"""s$r AS MATERIALIZED (SELECT count(*) AS m2, count(DISTINCT src) AS n FROM e${r - 1}),
           |p$r AS MATERIALIZED (SELECT src AS v FROM e${r - 1} GROUP BY src
           |  HAVING count(*) * (SELECT n FROM s$r) <= (SELECT m2 FROM s$r)),
           |e$r AS MATERIALIZED (SELECT src, dst FROM e${r - 1}
           |  WHERE src NOT IN (SELECT v FROM p$r)
           |    AND dst NOT IN (SELECT v FROM p$r))""".stripMargin
      }.mkString(",\n")
      val rows = (1 to 6).map { r =>
        s"""SELECT CAST($r AS BIGINT) AS round, CAST(n AS BIGINT) AS n_vertices,
           |  CAST(m2 AS BIGINT) AS m2,
           |  CAST(m2 * 1000000 // (2 * n) AS BIGINT) AS density_micro
           |FROM s$r WHERE n > 0""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e00 AS (
         |  SELECT DISTINCT 3*72057594037927936 + c_custkey AS src,
         |    2*72057594037927936 + c_nationkey AS dst FROM customer
         |  UNION SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
         |e0 AS MATERIALIZED (SELECT src, dst FROM e00 WHERE src <> dst
         |  UNION SELECT dst, src FROM e00 WHERE src <> dst),
         |$rounds
         |$rows""".stripMargin
    },

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

    // Replays every walk step: same dst-ascending edge ranks, same md5
    // draws, same sink termination.
    "x16_random_walks" -> {
      def step(n: Int, prev: String) =
        s"""s$n AS (SELECT p.start, p.walk, i.dst AS cur
           |  FROM $prev p
           |  JOIN deg d ON d.src = p.cur
           |  JOIN idx i ON i.src = p.cur AND i.idx =
           |    ${md5i(s"CAST(p.start AS VARCHAR) || '#walk#' || CAST(p.walk AS VARCHAR) || '#$n'")} % d.deg)"""
          .stripMargin
      s"""WITH e AS (
         |  SELECT DISTINCT 1*72057594037927936 + n_regionkey AS src,
         |    2*72057594037927936 + n_nationkey AS dst FROM nation
         |  UNION
         |  SELECT DISTINCT 2*72057594037927936 + c_nationkey,
         |    3*72057594037927936 + c_custkey FROM customer),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |idx AS (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx FROM e),
         |s0 AS (SELECT s.src AS start, w.walk, s.src AS cur
         |  FROM (SELECT DISTINCT src FROM e) s
         |  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS walk) w),
         |${step(1, "s0")},
         |${step(2, "s1")},
         |${step(3, "s2")}
         |SELECT start, CAST(walk AS INTEGER) AS walk, 0 AS step, start AS vertex FROM s0
         |UNION ALL SELECT start, CAST(walk AS INTEGER), 1, cur FROM s1
         |UNION ALL SELECT start, CAST(walk AS INTEGER), 2, cur FROM s2
         |UNION ALL SELECT start, CAST(walk AS INTEGER), 3, cur FROM s3""".stripMargin
    },

    // Replays negativeSample's deterministic construction exactly: the
    // sharded-prefix-sum canonical edge order, the md5 draw positions,
    // and both rejection rules.
    "x15_negative_sampling" ->
      s"""WITH e AS (SELECT DISTINCT 3*72057594037927936 + c_custkey AS src,
         |    2*72057594037927936 + c_nationkey AS dst FROM customer),
         |h AS (SELECT src, dst,
         |  ${md5i("CAST(src AS VARCHAR) || '|' || CAST(dst AS VARCHAR)")} AS h FROM e),
         |sh AS (SELECT *, h % 32 AS shard FROM h),
         |r AS (SELECT src, dst, shard,
         |  row_number() OVER (PARTITION BY shard ORDER BY h, src, dst) - 1 AS wr FROM sh),
         |off AS (SELECT shard, count(*) AS cnt FROM sh GROUP BY shard),
         |off2 AS (SELECT shard, coalesce(sum(cnt) OVER (ORDER BY shard
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM off),
         |dict AS (SELECT off2.off + r.wr AS pos, r.dst AS neg FROM r JOIN off2 USING (shard)),
         |tot AS (SELECT count(*) AS e_cnt FROM e),
         |draws AS (SELECT s.src, d.draw,
         |  ${md5i("CAST(s.src AS VARCHAR) || '#neg#' || CAST(d.draw AS VARCHAR)")}
         |    % (SELECT e_cnt FROM tot) AS pos
         |  FROM (SELECT DISTINCT src FROM e) s
         |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS draw) d)
         |SELECT dr.src, CAST(dr.draw AS INTEGER) AS draw, dict.neg
         |FROM draws dr JOIN dict USING (pos)
         |WHERE dict.neg <> dr.src
         |  AND NOT EXISTS (SELECT 1 FROM e WHERE e.src = dr.src AND e.dst = dict.neg)""".stripMargin,

    "m8_ahash" -> s"$AHASH_CTES\nSELECT id, ahash, n_px FROM ah",

    "m9_audio_fp" -> s"$AUDIOFP_CTES\nSELECT id, afp FROM afp",

    "m9b_audio_neardup" ->
      s"""$AUDIOFP_CTES
         |SELECT x.id AS id_a, y.id AS id_b,
         |  CAST(bit_count(xor(x.afp, y.afp)) AS BIGINT) AS hamming
         |FROM afp x JOIN afp y ON x.id < y.id
         |WHERE bit_count(xor(x.afp, y.afp)) <= 3""".stripMargin,

    // truss peel, 4 unrolled rounds (idempotent past the fixpoint): per
    // round keep edges with a common neighbor inside the current set.
    "x13_ktruss" -> {
      val rounds = 4
      val per = (1 to rounds).map { r =>
        s"""u${r - 1} AS (SELECT a AS u, b AS v FROM e${r - 1}
           |  UNION ALL SELECT b, a FROM e${r - 1}),
           |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e WHERE EXISTS (
           |  SELECT 1 FROM u${r - 1} x JOIN u${r - 1} y ON y.v = x.v
           |  WHERE x.u = e.a AND y.u = e.b AND x.v <> e.a AND x.v <> e.b))""".stripMargin
      }.mkString(",\n")
      s"""$SHINGLE_CTES,
         |base AS (SELECT doc_id, list_distinct(sh) AS shd,
         |  list_min(list_transform(sh, x -> ${md5i(s"x || '|1'")})) AS h1 FROM s),
         |e0 AS MATERIALIZED (SELECT a, b FROM (
         |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
         |    floor(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
         |      / len(list_distinct(a.shd || b.shd)) * 10000) / 10000 AS j
         |  FROM base a JOIN base b ON a.h1 = b.h1 AND a.doc_id < b.doc_id)
         |  WHERE j >= 0.5),
         |$per,
         |uf AS (SELECT a AS u, b AS v FROM e$rounds UNION ALL SELECT b, a FROM e$rounds)
         |SELECT e.a AS id_a, e.b AS id_b, CAST(count(*) AS BIGINT) AS support
         |FROM e$rounds e JOIN uf x ON x.u = e.a JOIN uf y ON y.u = e.b AND y.v = x.v
         |WHERE x.v <> e.a AND x.v <> e.b GROUP BY e.a, e.b""".stripMargin
    },

    "m8b_image_neardup" ->
      s"""$AHASH_CTES
         |SELECT x.id AS id_a, y.id AS id_b,
         |  CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
         |FROM ah x JOIN ah y ON x.id < y.id
         |WHERE bit_count(xor(x.ahash, y.ahash)) <= 3""".stripMargin,

    "sw8_active_users" ->
      """WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM p GROUP BY day),
        |days AS (SELECT DISTINCT day FROM p),
        |r AS (SELECT d.day, count(DISTINCT p.user_id) AS rolling_active
        |  FROM days d JOIN p ON p.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        |  GROUP BY d.day),
        |fs AS (SELECT min(day) AS day, user_id FROM p GROUP BY user_id),
        |nn AS (SELECT day, count(*) AS n_new FROM fs GROUP BY day)
        |SELECT dau.day, dau.dau, r.rolling_active,
        |  coalesce(nn.n_new, 0) AS n_new,
        |  CAST(sum(coalesce(nn.n_new, 0)) OVER (ORDER BY dau.day) AS BIGINT) AS cum_users
        |FROM dau JOIN r USING (day) LEFT JOIN nn USING (day)""".stripMargin,

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

    "e14_gram" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |q AS (SELECT vec_id,
        |  CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
        |       ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER))
        |  END AS q FROM m),
        |u AS (SELECT vec_id, i - 1 AS i, q[CAST(i AS INTEGER)] AS qi
        |  FROM q, unnest(generate_series(1, len(q))) AS g(i))
        |SELECT CAST(a.i AS INTEGER) AS i, CAST(b.i AS INTEGER) AS j,
        |  CAST(sum(CAST(a.qi AS BIGINT) * b.qi) AS BIGINT) AS dot
        |FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY 1, 2""".stripMargin,

    // Same md5 quarter-sample, same 6dp-rounded fold cosine, same bin
    // arithmetic (cos is DOUBLE, so the literals coerce to IEEE doubles).
    "e19_sim_histogram" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings
         |  WHERE ${md5i("CAST(vec_id AS VARCHAR)")} % 4 = 0),
         |sc AS (SELECT round(${cosSql("a.e", "b.e")}, 6) AS cos
         |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
         |SELECT CAST(least(floor((cos + 1.0) * 10.0), 19) AS BIGINT) AS bin,
         |  count(*) AS n_pairs
         |FROM sc GROUP BY 1""".stripMargin,

    // The e14 Gram rebuilt, expanded to its symmetric form, then the
    // identical 3 max-normalized integer power rounds unrolled.
    "e18_power_iteration" -> {
      def round(n: Int) =
        s"""w$n AS (SELECT f.i AS dim, CAST(sum(f.dot * v${n - 1}.v) AS BIGINT) AS w
           |  FROM f JOIN v${n - 1} ON f.j = v${n - 1}.dim GROUP BY f.i),
           |mx$n AS (SELECT max(abs(w)) AS mx FROM w$n),
           |v$n AS (SELECT dim, CASE WHEN mx > 0
           |  THEN CAST((1000 * w - (((1000 * w) % mx) + mx) % mx) // mx AS BIGINT)
           |  ELSE 0 END AS v
           |  FROM w$n, mx$n)""".stripMargin
      s"""WITH m AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |  FROM embeddings),
         |q AS (SELECT vec_id,
         |  CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
         |       ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER))
         |  END AS q FROM m),
         |u AS (SELECT vec_id, i - 1 AS i, q[CAST(i AS INTEGER)] AS qi
         |  FROM q, unnest(generate_series(1, len(q))) AS g(i)),
         |g AS (SELECT CAST(a.i AS INTEGER) AS i, CAST(b.i AS INTEGER) AS j,
         |  CAST(sum(CAST(a.qi AS BIGINT) * b.qi) AS BIGINT) AS dot
         |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i GROUP BY 1, 2),
         |f AS (SELECT i, j, dot FROM g
         |  UNION ALL SELECT j AS i, i AS j, dot FROM g WHERE i <> j),
         |v0 AS (SELECT DISTINCT i AS dim, CAST(1000 AS BIGINT) AS v FROM f),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT dim, v AS v_milli FROM v3""".stripMargin
    },

    // pixel i of doc = payload bytes 3i..3i+2 (b,g,r), laid out 16-wide
    // top-down; the decoder's bottom-up un-flip restores exactly this
    // order, so tile (x/8, y/8) sums recompute straight from the text.
    "m7_image_tiles" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len,
        |  greatest(1, CAST(ceil(length(text) / 48.0) AS BIGINT)) AS h FROM documents),
        |px AS (SELECT doc_id, text, len, unnest(generate_series(0, 16 * h - 1)) AS i FROM t),
        |c AS (SELECT doc_id, i,
        |  CASE WHEN 3*i + 1 <= len THEN unicode(substr(text, CAST(3*i + 1 AS INTEGER), 1)) ELSE 0 END AS b,
        |  CASE WHEN 3*i + 2 <= len THEN unicode(substr(text, CAST(3*i + 2 AS INTEGER), 1)) ELSE 0 END AS g,
        |  CASE WHEN 3*i + 3 <= len THEN unicode(substr(text, CAST(3*i + 3 AS INTEGER), 1)) ELSE 0 END AS r
        |  FROM px)
        |SELECT doc_id AS id, CAST((i % 16) // 8 AS INTEGER) AS tile_x,
        |  CAST((i // 16) // 8 AS INTEGER) AS tile_y, count(*) AS n_px,
        |  CAST(sum(b) AS BIGINT) AS sum_b, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(r) AS BIGINT) AS sum_r
        |FROM c GROUP BY 1, 2, 3""".stripMargin,

    "d_weighted_sample" -> {
      val tick = md5i("CAST(doc_id AS VARCHAR) || '#t' || CAST(tk AS VARCHAR) || '#d' || CAST(d.draw AS VARCHAR)")
      s"""WITH t AS (SELECT doc_id,
         |  len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
         |  FROM documents),
         |d AS (SELECT unnest(generate_series(1, 8)) AS draw),
         |h AS (SELECT CAST(d.draw AS BIGINT) AS draw, t.doc_id,
         |  min($tick) AS h
         |  FROM t CROSS JOIN d, unnest(generate_series(1, w)) AS g(tk)
         |  WHERE w >= 1 GROUP BY 1, 2)
         |SELECT draw, doc_id FROM (
         |  SELECT draw, doc_id, row_number() OVER (PARTITION BY draw ORDER BY h, doc_id) AS rn
         |  FROM h) WHERE rn = 1""".stripMargin
    },

    "r4_incremental_agg" ->
      """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) * 1000000 // count(*) AS BIGINT) AS avg_qty_micro
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    // DuckDB sum(BIGINT) returns HUGEINT — cast the aggregates back to
    // BIGINT or the driver's value hash diverges (the r4 pattern).
    "p3_pivot" ->
      """SELECT l_returnflag AS returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f
        |FROM lineitem GROUP BY 1""".stripMargin,

    // grouping() bit order matches Spark's grouping_id (leftmost column =
    // most significant bit)
    "r5_rollup" ->
      """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, count(*) AS n,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "r6_cube" ->
      """SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, count(*) AS n,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "p2_unpivot" ->
      """SELECT l_orderkey AS orderkey, CAST(l_linenumber AS BIGINT) AS linenumber,
        |  'quantity' AS measure, l_quantity AS value FROM lineitem
        |UNION ALL SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
        |  'extendedprice', l_extendedprice FROM lineitem
        |UNION ALL SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
        |  'discount', l_discount FROM lineitem
        |UNION ALL SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
        |  'tax', l_tax FROM lineitem""".stripMargin,

    "d_snapshot_diff" -> {
      val fp = md5i("CAST(length(text) AS VARCHAR) || ':' || text")
      s"""WITH s AS (SELECT doc_id, text,
         |  ${md5i("CAST(doc_id AS VARCHAR)")} % 100 AS sl FROM documents),
         |a AS (SELECT doc_id, $fp AS old_fp FROM s WHERE sl < 90),
         |b0 AS (SELECT doc_id,
         |  CASE WHEN sl BETWEEN 40 AND 49 THEN text || ' [rev2]' ELSE text END AS text
         |  FROM s WHERE sl >= 10),
         |b AS (SELECT doc_id, $fp AS new_fp FROM b0)
         |SELECT doc_id,
         |  CASE WHEN old_fp IS NULL THEN 'added'
         |       WHEN new_fp IS NULL THEN 'removed'
         |       WHEN old_fp = new_fp THEN 'same'
         |       ELSE 'changed' END AS status,
         |  old_fp, new_fp
         |FROM a FULL JOIN b USING (doc_id)""".stripMargin
    },

    "x10_scc" ->
      """WITH RECURSIVE o AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |b AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS cnt
        |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(cnt) AS tot FROM b GROUP BY from_type),
        |e AS (SELECT from_type AS src, to_type AS dst FROM b JOIN t USING (from_type)
        |  WHERE cnt * 1000000 // tot >= 200000),
        |verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |reach(a, z) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN e ON r.z = e.src),
        |co AS (SELECT r1.a AS id, r1.z AS m FROM reach r1
        |  JOIN reach r2 ON r1.a = r2.z AND r1.z = r2.a)
        |SELECT id, min(m) AS component FROM (
        |  SELECT id, id AS m FROM verts UNION ALL SELECT id, m FROM co)
        |GROUP BY id""".stripMargin,

    "x11_anf" -> anfSql(extraCols = ""),

    // x11b's oracle: the identical exact curve, plus the constant verdict
    // the self-evaluating HyperBall gate must reproduce (hb_ok flips only
    // if a hop's HLL estimate drifts past 2% of the exact cumulative —
    // the cd7 carry-exact-in-row pattern).
    "x11b_hyperball" -> anfSql(extraCols = ", true AS hb_ok"),

    "x21_harmonic" -> harmonicSql(extraCols = ""),

    "x22_stress" -> stressSql(extraCols = ""),

    // x22b's oracle: the identical exact counts plus the constant
    // verdict the self-evaluating sampled gate must reproduce (sp_ok
    // flips only if the pivot estimate drifts past 50% of exact — the
    // cd7 carry-exact-in-row pattern).
    "x22b_stress_sampled" -> stressSql(extraCols = ", true AS sp_ok"),
    "x21b_harmonic_hyperball" -> harmonicSql(extraCols = ", true AS hb_ok"),

    "d_scd2_history" ->
      s"""$SCD2_CTES
         |SELECT doc_id, fp, valid_from, valid_to, is_current FROM hist""".stripMargin,

    "z4_pit_join" ->
      s"""$SCD2_CTES,
         |pr AS (SELECT doc_id,
         |  ${md5i("CAST(doc_id AS VARCHAR) || '#asof'")} % 3 + 1 AS as_of FROM documents)
         |SELECT pr.doc_id, CAST(pr.as_of AS BIGINT) AS as_of, h.fp AS fp_then
         |FROM pr LEFT JOIN hist h ON h.doc_id = pr.doc_id
         |  AND pr.as_of BETWEEN h.valid_from AND h.valid_to""".stripMargin,

    "dq1_expectations" ->
      """WITH m AS (SELECT count(*) AS n_rows,
        |  sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS null_orderkey,
        |  sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS qty_out_of_range,
        |  sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS bad_returnflag,
        |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dup_pk
        |  FROM lineitem)
        |SELECT 'null_orderkey' AS rule, CAST(null_orderkey AS BIGINT) AS violations,
        |  null_orderkey = 0 AS passes FROM m
        |UNION ALL SELECT 'qty_in_1_50', CAST(qty_out_of_range AS BIGINT), qty_out_of_range = 0 FROM m
        |UNION ALL SELECT 'returnflag_in_set', CAST(bad_returnflag AS BIGINT), bad_returnflag = 0 FROM m
        |UNION ALL SELECT 'pk_unique', CAST(dup_pk AS BIGINT), dup_pk = 0 FROM m""".stripMargin,

    "dq2_ref_integrity" ->
      """SELECT 'orders->customer' AS edge, CAST(count(*) AS BIGINT) AS orphans
        |FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL SELECT 'lineitem->orders', CAST(count(*) AS BIGINT)
        |FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL SELECT 'lineitem->part', CAST(count(*) AS BIGINT)
        |FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        |UNION ALL SELECT 'lineitem->supplier', CAST(count(*) AS BIGINT)
        |FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)""".stripMargin,

    "f6_winsorize" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM lineitem),
        |c AS (SELECT count(*) AS n FROM v),
        |s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |lo AS (SELECT v AS lo FROM s, c WHERE rn = (100 * n + 9999) // 10000),
        |hi AS (SELECT v AS hi FROM s, c WHERE rn = (9900 * n + 9999) // 10000)
        |SELECT n, CAST(sum(greatest(least(v.v, hi), lo)) AS BIGINT) AS sum_winsorized,
        |  CAST(sum(CASE WHEN v.v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(sum(CASE WHEN v.v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
        |FROM v, lo, hi, c GROUP BY n""".stripMargin,

    "e15_pq_distortion" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
         |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
         |g AS (SELECT unnest(generate_series(0, 3)) AS sub),
         |cb AS (SELECT g.sub, CAST(sd.rn - 1 AS INT) AS cid, ${pqSubSql("sd.e", "g.sub")} AS cvec
         |  FROM sd CROSS JOIN g WHERE sd.rn <= 16),
         |sv AS (SELECT v.vec_id, g.sub, ${pqSubSql("v.e", "g.sub")} AS svec FROM v CROSS JOIN g),
         |d AS (SELECT sv.vec_id, sv.sub, min(${l2Sql("sv.svec", "cb.cvec")}) AS dsub
         |  FROM sv JOIN cb USING (sub) GROUP BY 1, 2),
         |p AS (SELECT vec_id,
         |  max(CASE WHEN sub = 0 THEN dsub END) AS d0,
         |  max(CASE WHEN sub = 1 THEN dsub END) AS d1,
         |  max(CASE WHEN sub = 2 THEN dsub END) AS d2,
         |  max(CASE WHEN sub = 3 THEN dsub END) AS d3
         |  FROM d GROUP BY vec_id)
         |SELECT vec_id, CAST(floor((((d0 + d1) + d2) + d3) * 1000000) AS BIGINT) AS err_micro
         |FROM p""".stripMargin,

    "sw9_trending" ->
      """WITH h AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
        |  count(*) AS cnt FROM events GROUP BY 1, 2)
        |SELECT ws, event_type, cnt, rank FROM (
        |  SELECT ws, event_type, cnt,
        |    CAST(row_number() OVER (PARTITION BY ws ORDER BY cnt DESC, event_type) AS BIGINT) AS rank
        |  FROM h) WHERE rank <= 3""".stripMargin,

    // The per-key recursion replayed as a recursive CTE over the hour
    // index: same milli init, same sign-explicit truncating quarter-step.
    "sw17_ewma" ->
      """WITH RECURSIVE h AS (SELECT event_type,
        |  time_bucket(INTERVAL 1 HOUR, ts) AS ws, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |idx AS (SELECT event_type, ws, cnt,
        |  row_number() OVER (PARTITION BY event_type ORDER BY ws) AS i FROM h),
        |ew(event_type, i, ws, cnt, s) AS (
        |  SELECT event_type, i, ws, cnt, cnt * 1000 FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.event_type, idx.i, idx.ws, idx.cnt,
        |    CASE WHEN idx.cnt * 1000 >= ew.s
        |      THEN ew.s + (idx.cnt * 1000 - ew.s) // 4
        |      ELSE ew.s - (ew.s - idx.cnt * 1000) // 4 END
        |  FROM ew JOIN idx ON idx.event_type = ew.event_type AND idx.i = ew.i + 1)
        |SELECT event_type, ws, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(s AS BIGINT) AS ewma_milli FROM ew""".stripMargin,

    "sw10_anomaly" ->
      """WITH h AS (SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
        |  count(*) AS cnt FROM events GROUP BY 1, 2),
        |s AS (SELECT ws, event_type, cnt,
        |  count(*) OVER w AS n, sum(cnt) OVER w AS sx, sum(cnt * cnt) OVER w AS sxx
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY ws
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT ws, event_type, cnt,
        |  CASE WHEN n * sxx - sx * sx > 0
        |       THEN CAST(floor((cnt * n - sx) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         * 1000000) AS BIGINT) END AS z_micro
        |FROM s WHERE n >= 12""".stripMargin,

    "d_minhash_estimate" -> {
      val hs = (1 to 8).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(",\n  ")
      val agree = (1 to 8).map(i =>
        s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""$SHINGLE_CTES,
         |base AS (SELECT doc_id, list_distinct(sh) AS shd,
         |  $hs FROM s)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(($agree) * 1250 AS BIGINT) AS est_bp,
         |  floor(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
         |    / len(list_distinct(a.shd || b.shd)) * 10000) / 10000 AS jaccard
         |FROM base a JOIN base b ON a.h1 = b.h1 AND a.doc_id < b.doc_id""".stripMargin
    },

    "x14_eff_diameter" ->
      """WITH RECURSIVE e AS (
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
        |h AS (SELECT CAST(d AS BIGINT) AS hop, count(*) AS n_pairs FROM md GROUP BY d),
        |c AS (SELECT hop, CAST(sum(n_pairs) OVER (ORDER BY hop) AS BIGINT) AS cum FROM h),
        |t AS (SELECT max(cum) AS total FROM c)
        |SELECT min(hop) AS effective_diameter, CAST(max(total) AS BIGINT) AS total_pairs
        |FROM c, t WHERE cum * 10 >= total * 9""".stripMargin,

    "d_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    // the JSONL round trip is the identity on exact types
    "j1_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    // every edge has weight 1, so sum(weight) = edge count; supplier and
    // nation each contribute one out-edge per row
    // the same census through the GraphML text loop.
    "a23_graphml_roundtrip" ->
      """SELECT 'supplier' AS part, count(*) AS n,
        |  count(DISTINCT s_suppkey) AS n_keys, count(DISTINCT s_name) AS n_names FROM supplier
        |UNION ALL SELECT 'nation', count(*), count(DISTINCT n_nationkey), count(DISTINCT n_name) FROM nation
        |UNION ALL SELECT 'region', count(*), count(DISTINCT r_regionkey), count(DISTINCT r_name) FROM region
        |UNION ALL SELECT 'edges',
        |  (SELECT count(*) FROM supplier) + (SELECT count(*) FROM nation),
        |  (SELECT count(*) FROM supplier) + (SELECT count(*) FROM nation),
        |  (SELECT count(DISTINCT s_suppkey) FROM supplier) + (SELECT count(DISTINCT n_nationkey) FROM nation)""".stripMargin,

    "g6_graphson_roundtrip" ->
      """SELECT 'supplier' AS part, count(*) AS n,
        |  count(DISTINCT s_suppkey) AS n_keys, count(DISTINCT s_name) AS n_names FROM supplier
        |UNION ALL SELECT 'nation', count(*), count(DISTINCT n_nationkey), count(DISTINCT n_name) FROM nation
        |UNION ALL SELECT 'region', count(*), count(DISTINCT r_regionkey), count(DISTINCT r_name) FROM region
        |UNION ALL SELECT 'edges',
        |  (SELECT count(*) FROM supplier) + (SELECT count(*) FROM nation),
        |  (SELECT count(*) FROM supplier) + (SELECT count(*) FROM nation),
        |  (SELECT count(DISTINCT s_suppkey) FROM supplier) + (SELECT count(DISTINCT n_nationkey) FROM nation)""".stripMargin,

    // DuckDB's nfc_normalize uses the same Unicode composition tables as
    // java.text.Normalizer — byte-identical canonical forms
    "t_nfc_normalize" ->
      """WITH r AS (SELECT doc_id,
        |  substr(text, 1, 8) || ' cafe' || chr(769) || ' A' || chr(778)
        |    || 'ngstro' || chr(776) || 'm' AS raw
        |  FROM documents)
        |SELECT doc_id, length(raw) AS raw_len, nfc_normalize(raw) AS nfc,
        |  length(nfc_normalize(raw)) AS nfc_len FROM r""".stripMargin,

    // Identical single-md5 bit-field cells; median-of-3 as sum−max−min.
    "cd10_countsketch" -> {
      def b(i: Int) = s"(h >> ${10 * (i - 1)}) % 1024"
      def sgn(i: Int) = s"(CASE WHEN (h >> ${40 + i}) % 2 = 0 THEN 1 ELSE -1 END)"
      val cellRows = (1 to 3).map(i =>
        s"SELECT $i AS i, ${b(i)} AS b, ${sgn(i)} * exact AS s FROM counted")
        .mkString("\nUNION ALL\n")
      val probeRows = (1 to 3).map(i =>
        s"SELECT k, exact, $i AS i, ${b(i)} AS b, ${sgn(i)} AS s FROM top")
        .mkString("\nUNION ALL\n")
      s"""WITH counted AS (SELECT k, exact, ${md5i("k")} AS h FROM (
         |  SELECT CAST(l_suppkey AS VARCHAR) AS k, count(*) AS exact
         |  FROM lineitem GROUP BY 1)),
         |cells AS (SELECT i, b, sum(s) AS c FROM (
         |$cellRows
         |) GROUP BY i, b),
         |top AS (SELECT k, h, exact FROM counted
         |  ORDER BY exact DESC, k LIMIT 16),
         |probes AS (
         |$probeRows
         |),
         |e AS (SELECT probes.k, probes.exact, probes.s * cells.c AS est_i
         |  FROM probes JOIN cells ON cells.i = probes.i AND cells.b = probes.b)
         |SELECT k, CAST(exact AS BIGINT) AS exact,
         |  CAST(sum(est_i) - max(est_i) - min(est_i) AS BIGINT) AS est,
         |  CAST(sum(est_i) - max(est_i) - min(est_i) - exact AS BIGINT) AS err
         |FROM e GROUP BY k, exact""".stripMargin
    },

    // Fill and exact count are both integers; the one double (ln of an
    // exact rational) lands identically, same discipline as t_bm25's ln.
    "cd9_bloom_cardinality" ->
      """WITH vals AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS v FROM orders),
        |pos AS (SELECT DISTINCT ('0x' || substr(md5(v || '|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 65536 AS pos
        |  FROM vals CROSS JOIN (VALUES (1), (2), (3)) t(i)),
        |st AS (SELECT (SELECT count(*) FROM vals) AS n_exact,
        |  (SELECT count(*) FROM pos) AS bits_set),
        |es AS (SELECT n_exact, bits_set,
        |  CAST(floor(-(65536.0/3.0) * ln(1.0 - CAST(bits_set AS DOUBLE)/65536.0) * 1000) AS BIGINT) AS est_milli
        |  FROM st)
        |SELECT CAST(65536 AS BIGINT) AS m, CAST(3 AS BIGINT) AS k,
        |  CAST(bits_set AS BIGINT) AS bits_set, CAST(n_exact AS BIGINT) AS n_exact,
        |  est_milli,
        |  (abs(est_milli - n_exact * 1000) * 10 <= n_exact * 1000) AS bloom_ok
        |FROM es""".stripMargin,

    "cd8_sample_quantiles" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
        |    ('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS p
        |  FROM lineitem),
        |smp AS (SELECT v FROM v ORDER BY p, v LIMIT 1024),
        |sc AS (SELECT count(*) AS ns FROM smp),
        |c AS (SELECT count(*) AS n FROM v),
        |t AS (SELECT CAST(bp AS BIGINT) AS bp
        |  FROM (VALUES (2500), (5000), (7500), (9000), (9900)) q(bp)),
        |r AS (SELECT bp, CAST((bp * ns + 9999) // 10000 AS BIGINT) AS sample_rank,
        |    CAST((bp * n + 9999) // 10000 AS BIGINT) AS xrank
        |  FROM t CROSS JOIN sc CROSS JOIN c),
        |ss AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM smp),
        |xs AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
        |SELECT bp, sample_rank, ss.v AS est, xs.v AS exact, abs(ss.v - xs.v) AS abs_err
        |FROM r JOIN ss ON ss.rn = r.sample_rank JOIN xs ON xs.rn = r.xrank""".stripMargin,

    "cd7_kmv_setops" -> {
      val estOf = (src: String, out: String) =>
        s"""(SELECT CASE WHEN n < 256 THEN CAST(n AS BIGINT)
           |  ELSE CAST(floor(255.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)) AS BIGINT) END AS $out
           |  FROM (SELECT count(*) AS n, max(h) AS hk FROM $src))""".stripMargin
      s"""WITH keys AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
         |sl AS (SELECT key, ${md5i("CAST(key AS VARCHAR) || '|9'")} % 100 AS sl FROM keys),
         |a AS (SELECT key FROM sl WHERE sl < 60),
         |b AS (SELECT key FROM sl WHERE sl >= 40),
         |ha AS (SELECT DISTINCT ${md5i("CAST(key AS VARCHAR)")} AS h FROM a),
         |hb AS (SELECT DISTINCT ${md5i("CAST(key AS VARCHAR)")} AS h FROM b),
         |sa AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha) WHERE rn <= 256),
         |sb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb) WHERE rn <= 256),
         |su AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM
         |  (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb))) WHERE rn <= 256),
         |ni AS (SELECT count(*) AS n_inter FROM su
         |  WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb))
         |SELECT ea.est_a, eb.est_b, eu.est_union,
         |  CAST(CASE WHEN (SELECT count(*) FROM su) < 256 THEN ni.n_inter
         |       ELSE ni.n_inter * eu.est_union // 256 END AS BIGINT) AS est_inter,
         |  (SELECT count(*) FROM a) AS exact_a,
         |  (SELECT count(*) FROM b) AS exact_b,
         |  (SELECT count(*) FROM (SELECT key FROM a UNION SELECT key FROM b)) AS exact_union,
         |  (SELECT count(*) FROM a WHERE key IN (SELECT key FROM b)) AS exact_inter
         |FROM ${estOf("sa", "est_a")} ea, ${estOf("sb", "est_b")} eb,
         |  ${estOf("su", "est_union")} eu, ni""".stripMargin
    },

    "cd6_quantiles_nosort" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM lineitem),
        |c AS (SELECT count(*) AS n FROM v),
        |r AS (SELECT CAST(bp AS BIGINT) AS bp,
        |  CAST((bp * n + 9999) // 10000 AS BIGINT) AS rank
        |  FROM (VALUES (2500), (5000), (7500), (9000), (9900)) t(bp) CROSS JOIN c),
        |s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
        |SELECT bp, rank, s.v AS value FROM r JOIN s ON s.rn = r.rank""".stripMargin,

    // Sample i (1-based) is (unicode(char_i) - 64) * 256; frame = (i-1)//256;
    // a crossing belongs to the frame of its SECOND sample.
    "m6_audio_features" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |g AS (SELECT doc_id, text, unnest(generate_series(1, len)) AS i FROM t),
        |c AS (SELECT doc_id, i, unicode(substr(text, CAST(i AS INTEGER), 1)) - 64 AS d FROM g),
        |l AS (SELECT doc_id, i, d, lag(d) OVER (PARTITION BY doc_id ORDER BY i) AS pd FROM c),
        |f AS (SELECT doc_id, (i - 1) // 256 AS frame_no, d,
        |  CASE WHEN pd IS NOT NULL AND pd * d < 0 THEN 1 ELSE 0 END AS x FROM l)
        |SELECT doc_id AS id, CAST(frame_no AS BIGINT) AS frame_no,
        |  count(*) AS n_samples,
        |  CAST(sum(CAST(d AS BIGINT) * d * 65536) AS BIGINT) AS energy,
        |  CAST(sum(x) AS BIGINT) AS crossings
        |FROM f GROUP BY doc_id, frame_no""".stripMargin,

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

    "d_sparse_neighbors" ->
      s"""$WORDS_CTE,
         |u AS (SELECT doc_id, unnest(w) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM u GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         |wt AS (SELECT doc_id, term,
         |  CAST(floor(tf * ln((n + 1.0) / (df + 1.0)) * 1000000) AS BIGINT) AS w
         |  FROM tf JOIN dfq USING (term) CROSS JOIN nn),
         |pr AS (SELECT doc_id, term, w FROM (
         |  SELECT doc_id, term, w,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS r FROM wt)
         |  WHERE r <= 5 AND w > 0),
         |nrm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS nn2 FROM pr GROUP BY doc_id),
         |dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(sum(a.w * b.w) AS BIGINT) AS num
         |  FROM pr a JOIN pr b USING (term) WHERE a.doc_id <> b.doc_id GROUP BY 1, 2),
         |sc AS (SELECT doc_a, doc_b,
         |  CAST(floor(CAST(num AS DOUBLE)
         |    / (sqrt(CAST(na.nn2 AS DOUBLE)) * sqrt(CAST(nb.nn2 AS DOUBLE)))
         |    * 1000000) AS BIGINT) AS cos_micro
         |  FROM dots JOIN nrm na ON dots.doc_a = na.doc_id
         |            JOIN nrm nb ON dots.doc_b = nb.doc_id)
         |SELECT doc_a, doc_b, cos_micro,
         |  CAST(row_number() OVER (PARTITION BY doc_a ORDER BY cos_micro DESC, doc_b) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 3""".stripMargin,

    "y1_zorder_cells" ->
      """WITH d AS (SELECT CAST(p_size AS BIGINT) AS a,
        |  CAST(floor(p_retailprice) AS BIGINT) AS b FROM part),
        |cl AS (SELECT a, b, greatest(0, least(a, 65535)) AS a0,
        |  greatest(0, least(b, 65535)) AS b0 FROM d),
        |s1 AS (SELECT a, b, (a0 | (a0 << 8)) & 16711935 AS sa, (b0 | (b0 << 8)) & 16711935 AS sb FROM cl),
        |s2 AS (SELECT a, b, (sa | (sa << 4)) & 252645135 AS sa, (sb | (sb << 4)) & 252645135 AS sb FROM s1),
        |s3 AS (SELECT a, b, (sa | (sa << 2)) & 858993459 AS sa, (sb | (sb << 2)) & 858993459 AS sb FROM s2),
        |s4 AS (SELECT a, b, (sa | (sa << 1)) & 1431655765 AS sa, (sb | (sb << 1)) & 1431655765 AS sb FROM s3),
        |z AS (SELECT a, b, (sa | (sb << 1)) >> 6 AS zcell FROM s4)
        |SELECT zcell, count(*) AS n_rows, min(a) AS min_a, max(a) AS max_a,
        |  min(b) AS min_b, max(b) AS max_b
        |FROM z GROUP BY zcell""".stripMargin,

    "a01_vertex_count_by_label" ->
      """SELECT 'region' AS label, count(*) AS cnt FROM region
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'customer', count(*) FROM customer
        |UNION ALL SELECT 'supplier', count(*) FROM supplier
        |UNION ALL SELECT 'part', count(*) FROM part
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'lineitem', count(DISTINCT l_orderkey*10 + l_linenumber) FROM lineitem""".stripMargin,

    "a02_label_filter" ->
      "SELECT c_custkey AS custkey, c_name AS name FROM customer",

    "a03_property_predicate" ->
      "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'",

    "g1_gremlin_text" ->
      """SELECT 2*72057594037927936 + c_nationkey AS id FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,

    "g3_select_pairs" ->
      """SELECT 3*72057594037927936 + c_custkey AS c_id,
        |  2*72057594037927936 + c_nationkey AS n_id
        |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,

    "g4_path" ->
      """SELECT 3*72057594037927936 + c_custkey AS p0_id,
        |  2*72057594037927936 + c_nationkey AS p1_id,
        |  1*72057594037927936 + n_regionkey AS p2_id
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,

    "g2_subgraph_census" ->
      """WITH e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT 3*72057594037927936 + c_custkey AS src, 2*72057594037927936 + c_nationkey AS dst FROM customer
        |  UNION ALL SELECT 4*72057594037927936 + s_suppkey, 2*72057594037927936 + s_nationkey FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation
        |  UNION ALL SELECT 6*72057594037927936 + o_orderkey, 3*72057594037927936 + o_custkey FROM orders
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 6*72057594037927936 + l_orderkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 5*72057594037927936 + l_partkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 4*72057594037927936 + l_suppkey FROM lineitem))
        |SELECT
        |  CAST((SELECT count(*) FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)) AS BIGINT) AS vertices,
        |  CAST((SELECT count(*) FROM e) AS BIGINT) AS edges""".stripMargin,

    "a20_point_lookup" ->
      """SELECT 3*72057594037927936 + c_custkey AS id, 'customer' AS label,
        |CAST(c_custkey AS VARCHAR) AS key FROM customer WHERE c_custkey = 42""".stripMargin,

    // The until()/emit() walk, recomputed relationally: each label's
    // visited set spelled as the distinct reachable keys (the recursion
    // is finite and label-stratified, so the closure unrolls exactly).
    "g5_repeat_until" ->
      """WITH lo AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        |lp AS (SELECT DISTINCT l_partkey AS k FROM lineitem),
        |ls AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
        |cst AS (SELECT DISTINCT o_custkey AS k FROM orders JOIN lo ON o_orderkey = lo.k),
        |nat AS (SELECT DISTINCT n_nationkey AS k FROM nation
        |  WHERE n_nationkey IN (SELECT c_nationkey FROM customer JOIN cst ON c_custkey = cst.k)
        |     OR n_nationkey IN (SELECT s_nationkey FROM supplier JOIN ls ON s_suppkey = ls.k)),
        |reg AS (SELECT DISTINCT n_regionkey AS k FROM nation JOIN nat ON n_nationkey = nat.k)
        |SELECT 'orders' AS label, CAST(count(*) AS BIGINT) AS count FROM lo
        |UNION ALL SELECT 'part', CAST(count(*) AS BIGINT) FROM lp
        |UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT) FROM ls
        |UNION ALL SELECT 'customer', CAST(count(*) AS BIGINT) FROM cst
        |UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT) FROM nat
        |UNION ALL SELECT 'region', CAST(count(*) AS BIGINT) FROM reg""".stripMargin,

    "a07_out_edges" ->
      """SELECT 2*72057594037927936 + n_nationkey AS src,
        |1*72057594037927936 + n_regionkey AS dst, 'in' AS label, 1 AS weight FROM nation""".stripMargin,

    "a08_edge_semi_join" ->
      """SELECT o_orderkey AS orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin,

    "a04_not_exists_guard" ->
      """SELECT o_orderkey AS orderkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin,

    "a10_adjacency" ->
      """SELECT c_custkey AS custkey, 'nation' AS neighbor_label, n_name AS neighbor_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    "a13_khop2_regions" ->
      """SELECT c_custkey AS custkey, r_name AS region_name, 2 AS hop
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "a13b_khop_salted" ->
      """SELECT c_custkey AS custkey, r_name AS region_name, 2 AS hop
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "a24_khop_salted_hub" ->
      """SELECT DISTINCT 9*72057594037927936 + l_suppkey % 3 AS origin,
        |  8*72057594037927936 + l_orderkey AS node, CAST(1 AS BIGINT) AS hop
        |FROM lineitem""".stripMargin,

    "a14_reach_fixpoint" ->
      """WITH RECURSIVE e AS (
        |  SELECT 3*72057594037927936 + c_custkey AS src, 2*72057594037927936 + c_nationkey AS dst FROM customer
        |  UNION ALL SELECT 4*72057594037927936 + s_suppkey, 2*72057594037927936 + s_nationkey FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation
        |  UNION ALL SELECT 6*72057594037927936 + o_orderkey, 3*72057594037927936 + o_custkey FROM orders
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 6*72057594037927936 + l_orderkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 5*72057594037927936 + l_partkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 4*72057594037927936 + l_suppkey FROM lineitem
        |), reach(origin, node) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.origin, e2.dst FROM reach r JOIN e e2 ON r.node = e2.src
        |)
        |SELECT origin, node FROM reach""".stripMargin,

    // scc by co-reachability (x10's recursion on the strided id graph),
    // condensation edges distinct across components, layer DP on the
    // quotient, member census per (component, layer).
    "x31_condensation_layers" ->
      """WITH RECURSIVE e AS (
        |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 2*72057594037927936 + (n_nationkey + 1) % 25 FROM nation
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
        |verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |reach(a, z) AS (
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN e ON r.z = e.src),
        |co AS (SELECT r1.a AS id, r1.z AS m FROM reach r1
        |  JOIN reach r2 ON r1.a = r2.z AND r1.z = r2.a),
        |comp AS (SELECT id, min(m) AS component FROM (
        |  SELECT id, id AS m FROM verts UNION ALL SELECT id, m FROM co)
        |  GROUP BY id),
        |ce AS (SELECT DISTINCT cs.component AS src, cd.component AS dst
        |  FROM e JOIN comp cs ON cs.id = e.src JOIN comp cd ON cd.id = e.dst
        |  WHERE cs.component <> cd.component),
        |srcs AS (SELECT DISTINCT src AS id FROM ce WHERE src NOT IN (SELECT dst FROM ce)),
        |p(id, layer) AS (
        |  SELECT id, 0 FROM srcs
        |  UNION
        |  SELECT ce.dst, p.layer + 1 FROM p JOIN ce ON ce.src = p.id),
        |lay AS (SELECT id AS component, max(layer) AS layer FROM p GROUP BY id)
        |SELECT c.component, CAST(l.layer AS BIGINT) AS layer,
        |  count(*) AS n_members
        |FROM comp c JOIN lay l ON l.component = c.component
        |GROUP BY 1, 2""".stripMargin,

    // a14's edge CTE, longest-path DP: enumerate (vertex, depth) pairs
    // from the in-degree-0 sources (UNION dedups, the DAG bounds depth),
    // keep the max per vertex, census by label stride.
    "x30_topo_layers" ->
      """WITH RECURSIVE e AS (
        |  SELECT 3*72057594037927936 + c_custkey AS src, 2*72057594037927936 + c_nationkey AS dst FROM customer
        |  UNION ALL SELECT 4*72057594037927936 + s_suppkey, 2*72057594037927936 + s_nationkey FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation
        |  UNION ALL SELECT 6*72057594037927936 + o_orderkey, 3*72057594037927936 + o_custkey FROM orders
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 6*72057594037927936 + l_orderkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 5*72057594037927936 + l_partkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 4*72057594037927936 + l_suppkey FROM lineitem
        |), srcs AS (SELECT DISTINCT src AS id FROM e WHERE src NOT IN (SELECT dst FROM e)),
        |p(id, layer) AS (
        |  SELECT id, 0 FROM srcs
        |  UNION
        |  SELECT e.dst, p.layer + 1 FROM p JOIN e ON e.src = p.id
        |),
        |lay AS (SELECT id, max(layer) AS layer FROM p GROUP BY id)
        |SELECT CASE id // 72057594037927936
        |    WHEN 1 THEN 'region' WHEN 2 THEN 'nation' WHEN 3 THEN 'customer'
        |    WHEN 4 THEN 'supplier' WHEN 5 THEN 'part' WHEN 6 THEN 'orders'
        |    WHEN 7 THEN 'lineitem' END AS label,
        |  CAST(layer AS BIGINT) AS layer, count(*) AS n
        |FROM lay GROUP BY 1, 2""".stripMargin,

    "a06_upsert_vertices" ->
      """SELECT 'region' AS label, count(*) AS cnt FROM region
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'customer', count(*) FROM customer
        |UNION ALL SELECT 'supplier', count(*) FROM supplier
        |UNION ALL SELECT 'part', count(*) FROM part
        |UNION ALL SELECT 'orders', (SELECT count(*) FROM orders) + (SELECT count(*) FROM orders)
        |UNION ALL SELECT 'lineitem', count(DISTINCT l_orderkey*10 + l_linenumber) FROM lineitem""".stripMargin,

    "b09_invert_map" ->
      """SELECT c_mktsegment AS segment,
        |array_to_string(list_sort(list_distinct(list(n_name))), ',') AS nations
        |FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY c_mktsegment""".stripMargin,

    // the fixture's row formula, recomputed without HTTP: 6 pages × 50
    "b01_paged_http_ingest" -> pagedFixtureOracleSql,

    // the streamed ingest must land exactly the batch rows — same formula
    "sw22_stream_paged_ingest" -> pagedFixtureOracleSql,

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

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         |CAST(sum(${centsSql("l_extendedprice")}) AS DOUBLE) / 100 AS sum_base_price,
         |count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

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

    "d_exact_dup_fingerprint" ->
      """SELECT doc_id, md5(text) AS h,
        |count(*) OVER (PARTITION BY md5(text)) AS dup_count FROM documents""".stripMargin,

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

    // The t_readability flesch CTEs feed the rank statistic: per distinct
    // score its count/positive-count, a cumulative strictly-less window,
    // then the doubled-midrank Mann–Whitney numerator — all integer.
    "ev1_roc_auc" ->
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
        |FROM m WHERE len(w) > 0),
        |f AS (SELECT doc_id,
        |  206835000 - CAST(floor(1015000.0 * n_words / n_sents) AS BIGINT)
        |            - CAST(floor(84600000.0 * n_syllables / n_words) AS BIGINT) AS flesch_micro
        |FROM s),
        |lab AS (SELECT f.flesch_micro AS sc,
        |  CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM f JOIN documents d ON f.doc_id = d.doc_id),
        |per AS (SELECT sc, count(*) AS cnt, sum(pos) AS p FROM lab GROUP BY sc),
        |rk AS (SELECT sc, cnt, p, coalesce(sum(cnt) OVER (ORDER BY sc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c_less FROM per),
        |ag AS (SELECT sum(p) AS n_pos, sum(cnt - p) AS n_neg,
        |  sum(p * (2 * c_less + cnt + 1)) AS rank2_sum FROM rk)
        |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  CAST(rank2_sum AS BIGINT) AS rank2_sum,
        |  CAST(CASE WHEN n_pos > 0 AND n_neg > 0
        |    THEN (rank2_sum - n_pos * (n_pos + 1)) * 1000000 // (2 * n_pos * n_neg)
        |    ELSE 0 END AS BIGINT) AS auc_micro
        |FROM ag""".stripMargin,

    // The t_bm25 scoring replayed per single-term query (same corpus
    // stats, same df — the 4-term filter yields each term's own document
    // frequency), per-term rank window, relevance = term among the doc's
    // first 5 words. Queries whose term appears in no document drop on
    // BOTH sides (Spark's ranked-distinct ≡ the dfq membership filter).
    "ev3_mrr" ->
      s"""$WORDS_CTE,
         |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |u AS (SELECT doc_id, unnest(w) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM u
         |  WHERE term IN ('spark', 'join', 'window', 'batch')
         |  GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id, tf.term,
         |  CAST(floor(ln((n - df + 0.5) / (df + 0.5) + 1.0)
         |    * (tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
         |    * 1000000) AS BIGINT) AS score_micro
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
         |top AS (SELECT * FROM (SELECT term, doc_id,
         |    row_number() OVER (PARTITION BY term
         |      ORDER BY score_micro DESC, doc_id) AS rank FROM sc)
         |  WHERE rank <= 20),
         |fr AS (SELECT top.term AS query, min(top.rank) AS first_rank
         |  FROM top JOIN t ON top.doc_id = t.doc_id
         |    AND list_contains(t.w[1:5], top.term)
         |  GROUP BY top.term)
         |SELECT q.term AS query, CAST(coalesce(fr.first_rank, 0) AS BIGINT) AS first_rank,
         |  CAST(CASE WHEN coalesce(fr.first_rank, 0) > 0
         |    THEN 1000000 // fr.first_rank ELSE 0 END AS BIGINT) AS rr_micro
         |FROM dfq q LEFT JOIN fr ON fr.query = q.term""".stripMargin,

    // ev3's ranking replay, reduced to set overlaps: hits = |rel ∩ top20|
    // per term, n_rel from the corpus-side title-match table.
    "ev4_precision_recall" ->
      s"""$WORDS_CTE,
         |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
         |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |u AS (SELECT doc_id, unnest(w) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM u
         |  WHERE term IN ('spark', 'join', 'window', 'batch')
         |  GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT tf.doc_id, tf.term,
         |  CAST(floor(ln((n - df + 0.5) / (df + 0.5) + 1.0)
         |    * (tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
         |    * 1000000) AS BIGINT) AS score_micro
         |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
         |top AS (SELECT * FROM (SELECT term, doc_id,
         |    row_number() OVER (PARTITION BY term
         |      ORDER BY score_micro DESC, doc_id) AS rank FROM sc)
         |  WHERE rank <= 20),
         |rel AS (SELECT q.term, t.doc_id FROM dfq q
         |  JOIN t ON list_contains(t.w[1:5], q.term)),
         |nr AS (SELECT term, count(*) AS n_rel FROM rel GROUP BY term),
         |ht AS (SELECT top.term, count(*) AS hits
         |  FROM top JOIN rel ON top.term = rel.term AND top.doc_id = rel.doc_id
         |  GROUP BY top.term)
         |SELECT q.term AS query,
         |  CAST(coalesce(nr.n_rel, 0) AS BIGINT) AS n_rel,
         |  CAST(coalesce(ht.hits, 0) AS BIGINT) AS hits,
         |  CAST(coalesce(ht.hits, 0) * 1000000 // 20 AS BIGINT) AS p_at_k_micro,
         |  CAST(CASE WHEN coalesce(nr.n_rel, 0) > 0
         |    THEN coalesce(ht.hits, 0) * 1000000 // nr.n_rel
         |    ELSE 0 END AS BIGINT) AS recall_micro
         |FROM dfq q LEFT JOIN nr ON nr.term = q.term
         |LEFT JOIN ht ON ht.term = q.term""".stripMargin,

    // ev1's flesch scoring replayed, then a deterministic ntile(10) over
    // (score DESC, doc_id) — the doc_id tie-break makes both engines
    // assign identical buckets.
    "ev5_lift_deciles" ->
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
        |FROM m WHERE len(w) > 0),
        |f AS (SELECT doc_id,
        |  206835000 - CAST(floor(1015000.0 * n_words / n_sents) AS BIGINT)
        |            - CAST(floor(84600000.0 * n_syllables / n_words) AS BIGINT) AS flesch_micro
        |FROM s),
        |lab AS (SELECT f.doc_id, f.flesch_micro AS sc,
        |  CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
        |  FROM f JOIN documents d ON f.doc_id = d.doc_id),
        |b AS (SELECT pos, ntile(10) OVER (ORDER BY sc DESC, doc_id) AS bucket FROM lab),
        |g AS (SELECT bucket, count(*) AS n, sum(pos) AS n_pos FROM b GROUP BY bucket),
        |tt AS (SELECT sum(n) AS n_total, sum(n_pos) AS p_total FROM g),
        |c AS (SELECT bucket, n, n_pos, sum(n_pos) OVER (ORDER BY bucket
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos FROM g)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n AS BIGINT) AS n,
        |  CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(CASE WHEN p_total > 0
        |    THEN n_pos * n_total * 1000000 // (n * p_total) ELSE 0 END AS BIGINT) AS lift_micro,
        |  CAST(CASE WHEN p_total > 0
        |    THEN cum_pos * 1000000 // p_total ELSE 0 END AS BIGINT) AS cum_gain_micro
        |FROM c CROSS JOIN tt""".stripMargin,

    // t_lang_confusion's cells replayed, reduced to per-true-class
    // tp/fp/fn and the integral F1 = 2tp/(2tp+fp+fn).
    "ev6_f1_per_class" -> {
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
         |FROM sc),
         |cells AS (SELECT d.lang AS truth, pr.pred_lang AS pred, count(*) AS cnt
         |  FROM pr JOIN documents d ON pr.doc_id = d.doc_id
         |  GROUP BY d.lang, pr.pred_lang),
         |tn AS (SELECT truth AS clazz, sum(cnt) AS truth_n FROM cells GROUP BY truth),
         |pn AS (SELECT pred AS clazz, sum(cnt) AS pred_n FROM cells GROUP BY pred),
         |tpx AS (SELECT truth AS clazz, sum(cnt) AS tp FROM cells
         |  WHERE truth = pred GROUP BY truth),
         |j AS (SELECT tn.clazz, coalesce(tpx.tp, 0) AS tp,
         |  coalesce(pn.pred_n, 0) - coalesce(tpx.tp, 0) AS fp,
         |  tn.truth_n - coalesce(tpx.tp, 0) AS fn
         |  FROM tn LEFT JOIN tpx ON tpx.clazz = tn.clazz
         |  LEFT JOIN pn ON pn.clazz = tn.clazz)
         |SELECT clazz, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(fn AS BIGINT) AS fn,
         |  CAST(CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) ELSE 0 END AS BIGINT) AS prec_micro,
         |  CAST(CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) ELSE 0 END AS BIGINT) AS rec_micro,
         |  CAST(CASE WHEN 2 * tp + fp + fn > 0
         |    THEN 2 * tp * 1000000 // (2 * tp + fp + fn) ELSE 0 END AS BIGINT) AS f1_micro
         |FROM j""".stripMargin
    },

    // The fingerprint recomputed straight from the parquet table — the
    // ORC write∘read on the Spark side must be an exact identity.
    "o1_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS char_mass,
        |  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000000000)
        |    AS BIGINT) AS text_hash_sum
        |FROM documents GROUP BY lang""".stripMargin,

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

    // The t_lang_confusion cells reduced to κ's sufficient statistics:
    // marginal row/col masses joined on the class key, one global
    // aggregate, the sign-explicit micro division.
    "ev2_cohens_kappa" -> {
      val scores = operators.TextAnalysis.LangMarkers.map { case (lang, ms) =>
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
         |FROM sc),
         |cells AS (SELECT d.lang AS a, pr.pred_lang AS b, count(*) AS n
         |  FROM pr JOIN documents d ON pr.doc_id = d.doc_id GROUP BY 1, 2),
         |rw AS (SELECT a AS k, sum(n) AS row_n FROM cells GROUP BY a),
         |cl AS (SELECT b AS k, sum(n) AS col_n FROM cells GROUP BY b),
         |ch AS (SELECT coalesce(sum(row_n * col_n), 0) AS chance_num
         |  FROM rw JOIN cl USING (k)),
         |tt AS (SELECT sum(n) AS n_total,
         |  sum(CASE WHEN a = b THEN n ELSE 0 END) AS agree FROM cells)
         |SELECT CAST(n_total AS BIGINT) AS n_total, CAST(agree AS BIGINT) AS agree,
         |  CAST(chance_num AS BIGINT) AS chance_num,
         |  CAST(n_total * agree - chance_num AS BIGINT) AS kappa_num,
         |  CAST(n_total * n_total - chance_num AS BIGINT) AS kappa_den,
         |  CAST(CASE WHEN n_total * n_total - chance_num = 0 THEN 0
         |    WHEN n_total * agree - chance_num >= 0
         |      THEN (n_total * agree - chance_num) * 1000000
         |        // (n_total * n_total - chance_num)
         |    ELSE -((chance_num - n_total * agree) * 1000000
         |        // (n_total * n_total - chance_num)) END AS BIGINT) AS kappa_micro
         |FROM tt CROSS JOIN ch""".stripMargin
    },

    // Identical boundary rule (md5 of the word ≡ 0 mod 8, final word
    // always closes), identical chunk reconstruction, identical md5
    // chunk identity — the corpus-wide counts must agree row for row.
    "d_cdc_chunks" ->
      s"""$WORDS_CTE,
         |nz AS (SELECT doc_id, w FROM t WHERE len(w) > 0),
         |c0 AS (SELECT doc_id, w, list_filter(generate_series(1, len(w)),
         |    i -> ${md5i("w[i]")} % 8 = 0) AS c FROM nz),
         |c1 AS (SELECT doc_id, w,
         |  CASE WHEN len(c) > 0 AND c[-1] = len(w) THEN c
         |       ELSE list_append(c, len(w)) END AS cuts FROM c0),
         |ch AS (SELECT doc_id, md5(array_to_string(list_slice(w,
         |    CAST(CASE WHEN k.k = 1 THEN 1 ELSE cuts[CAST(k.k - 1 AS INTEGER)] + 1 END AS INTEGER),
         |    CAST(cuts[CAST(k.k AS INTEGER)] AS INTEGER)), ' ')) AS h
         |  FROM c1, UNNEST(generate_series(1, len(cuts))) AS k(k)),
         |cc AS (SELECT h, count(*) AS cnt FROM ch GROUP BY h)
         |SELECT ch.doc_id AS id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN cc.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |  CAST(1000000 * sum(CASE WHEN cc.cnt > 1 THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS dup_micro
         |FROM ch JOIN cc ON ch.h = cc.h GROUP BY ch.doc_id""".stripMargin,

    "a05_first_match" ->
      """SELECT 3*72057594037927936 + c_custkey AS id, CAST(c_custkey AS VARCHAR) AS key
        |FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey LIMIT 1""".stripMargin,

    "a09_upsert_edges" ->
      """SELECT CAST(2 AS BIGINT) AS src_label_code, count(*) AS cnt FROM nation
        |UNION ALL SELECT 3, count(*) FROM customer
        |UNION ALL SELECT 4, count(*) FROM supplier
        |UNION ALL SELECT 6, 2*count(*) FROM orders
        |UNION ALL SELECT 7,
        |  (SELECT count(*) FROM (SELECT DISTINCT l_orderkey*10 + l_linenumber, l_orderkey FROM lineitem))
        |+ (SELECT count(*) FROM (SELECT DISTINCT l_orderkey*10 + l_linenumber, l_partkey FROM lineitem))
        |+ (SELECT count(*) FROM (SELECT DISTINCT l_orderkey*10 + l_linenumber, l_suppkey FROM lineitem))
        |FROM (SELECT 1)""".stripMargin,

    "a11_valuemap_explode" ->
      """SELECT 5*72057594037927936 + p_partkey AS id, 'name' AS pkey, p_name AS pval FROM part
        |UNION ALL SELECT 5*72057594037927936 + p_partkey, 'brand', p_brand FROM part
        |UNION ALL SELECT 5*72057594037927936 + p_partkey, 'type', p_type FROM part""".stripMargin,

    "a12_ids" ->
      "SELECT 4*72057594037927936 + s_suppkey AS id FROM supplier",

    "a15_drop_cascade" ->
      """SELECT (SELECT count(*) FROM region) + (SELECT count(*) FROM nation)
        |     + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
        |     + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders) AS n_vertices,
        |       (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
        |     + (SELECT count(*) FROM nation) + (SELECT count(*) FROM orders) AS n_edges""".stripMargin,

    "a16_subgraph" ->
      """SELECT 'customer' AS label, count(*) AS cnt FROM customer
        |UNION ALL SELECT 'supplier', count(*) FROM supplier
        |UNION ALL SELECT 'nation', count(*) FROM
        |  (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)""".stripMargin,

    "a17_export_graphson" ->
      """SELECT printf('{"id":%d,"label":"region","key":"%s","props":{"name":"%s"}}',
        |  1*72057594037927936 + r_regionkey, CAST(r_regionkey AS VARCHAR), r_name) AS json
        |FROM region""".stripMargin,

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

    "q3_top_revenue" ->
      s"""SELECT l_orderkey AS orderkey,
         |CAST(sum(${c4Sql("l_extendedprice", "l_discount")}) AS DOUBLE) / 10000 AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-01'
         |  AND l_shipdate > TIMESTAMP '1997-06-01'
         |GROUP BY l_orderkey ORDER BY revenue DESC, orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name AS nation,
         |CAST(sum(${c4Sql("l_extendedprice", "l_discount")}) AS DOUBLE) / 10000 AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' GROUP BY n_name""".stripMargin,

    "w1_window_top3" ->
      """SELECT c_mktsegment AS segment,
        |CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rank,
        |c_custkey AS custkey, c_acctbal AS acctbal FROM customer
        |QUALIFY rank <= 3""".stripMargin,

    "w2_running_sum" ->
      s"""SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         |CAST(sum(${centsSql("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS running_total
         |FROM orders""".stripMargin,

    "w3_lag_delta" ->
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |round(o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS delta
        |FROM orders""".stripMargin,

    "k1_global_topk" ->
      """SELECT o_orderkey AS orderkey, o_totalprice AS totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,

    "s1_intersect" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,

    "s2_except" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT SELECT o_custkey FROM orders""".stripMargin,

    "r1_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "r2_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "r3_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

    "f1_scalar_string_math" ->
      """SELECT n_nationkey AS nationkey,
        |upper(substr(n_name, 1, 3)) AS prefix,
        |CAST(length(n_name) AS BIGINT) AS name_len,
        |n_name || '-' || CAST(n_regionkey AS VARCHAR) AS tagged,
        |abs(n_nationkey - 12) AS dist12,
        |n_nationkey % 5 AS mod5,
        |round(pow(2.0, n_regionkey), 1) AS pow2r,
        |round(sqrt(n_nationkey), 4) AS sqrtk
        |FROM nation""".stripMargin,

    "f2_scalar_dates" ->
      """SELECT o_orderkey AS orderkey,
        |CAST(year(o_orderdate) AS BIGINT) AS y,
        |CAST(month(o_orderdate) AS BIGINT) AS m,
        |CAST(day(o_orderdate) AS BIGINT) AS d,
        |CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
        |CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month
        |FROM orders""".stripMargin,

    "cd1_count_distinct" ->
      """SELECT c_mktsegment AS segment, count(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    // Self-evaluating HLL gate: the oracle recomputes the exact counts
    // and asserts the in-row error-bound verdict constant-true.
    "cd2_approx_distinct" ->
      """SELECT o_orderpriority AS priority,
        |  count(DISTINCT o_custkey) AS exact_customers, true AS hll_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // Self-evaluating Lloyd-IVF gate: deterministic query/exact-pair
    // counts plus the constant recall verdict (the Spark side flips
    // recall_ok below 40% recall@3 — the cd7 pattern).
    "e4_ivf_ann" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(3 * count(*) AS BIGINT) AS n_exact, true AS recall_ok
        |FROM embeddings WHERE vec_id < 20""".stripMargin,

    "cd3_kmv_distinct" ->
      s"""WITH hashed AS (SELECT DISTINCT o_orderpriority AS grp,
         |  ${md5i("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
         |r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM hashed),
         |a AS (SELECT grp, max(rn) AS n_seen, max(CASE WHEN rn = 64 THEN h END) AS hk
         |      FROM r WHERE rn <= 64 GROUP BY grp)
         |SELECT grp AS priority,
         |  CASE WHEN n_seen < 64 THEN CAST(n_seen AS BIGINT)
         |       ELSE CAST(floor(63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE)) AS BIGINT)
         |  END AS est_distinct
         |FROM a""".stripMargin,

    "cd4_row_checksum" -> {
      // mirrors Sketch.rowChecksum: per-column md5 tokens ("null" for NULL)
      // -> row hash -> (row hash, count) pairs -> XOR of their hashes
      def ck(table: String, cols: Seq[String]) = {
        val tokens = cols.map(c =>
          s"coalesce(CAST(${md5i(s"CAST($c AS VARCHAR)")} AS VARCHAR), 'null')").mkString(", ")
        s"""SELECT '$table' AS tbl,
           |  bit_xor(${md5i("CAST(rh AS VARCHAR) || ':' || CAST(cnt AS VARCHAR)")}) AS checksum
           |FROM (SELECT rh, count(*) AS cnt FROM (
           |  SELECT ${md5i(s"concat_ws('|', $tokens)")} AS rh FROM $table) GROUP BY rh)""".stripMargin
      }
      Seq(
        ck("nation", Seq("n_nationkey", "n_name", "n_regionkey")),
        ck("region", Seq("r_regionkey", "r_name")),
        ck("part", Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size")))
        .mkString("\nUNION ALL ")
    },

    // mirrors Sketch.countMinHeavy: seeded-md5 cells, min-of-depth
    // estimate, exact count only for sketch-flagged candidates.
    "cd5_countmin_heavy" -> {
      // Kirsch–Mitzenmacher cells from ONE md5 per key: (h1 + r·h2) % 16
      // with h1 = h mod 2^30 and h2 = (h >> 30) | 1 — mirrors Sketch.
      val cellOf = s"(hh % 1073741824 + r * ((hh // 1073741824) | 1)) % 16"
      s"""WITH u AS (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS k
         |  FROM documents),
         |hh0 AS (SELECT k, ${md5i("k")} AS hh FROM u),
         |cells AS (SELECT k, r, $cellOf AS b
         |  FROM hh0 CROSS JOIN generate_series(0, 3) g(r)),
         |sk AS (SELECT r, b, count(*) AS c FROM cells GROUP BY r, b),
         |probe AS (SELECT DISTINCT k, r, $cellOf AS b
         |  FROM hh0 CROSS JOIN generate_series(0, 3) g(r)),
         |est AS (SELECT probe.k, min(sk.c) AS est_count FROM probe
         |  JOIN sk ON probe.r = sk.r AND probe.b = sk.b GROUP BY probe.k),
         |cand AS (SELECT k, est_count FROM est WHERE est_count >= 1000),
         |ex AS (SELECT u.k, count(*) AS exact_count FROM u
         |  JOIN cand ON u.k = cand.k GROUP BY u.k)
         |SELECT cand.k AS word, est_count, exact_count
         |FROM cand JOIN ex ON cand.k = ex.k""".stripMargin
    },

    "q4_exists_agg" ->
      """SELECT o_orderpriority AS priority, count(*) AS cnt FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,

    "q17_avg_quantity_outliers" ->
      s"""SELECT CAST(sum(${centsSql("l_extendedprice")}) AS DOUBLE) / 700 AS avg_yearly
         |FROM lineitem JOIN (
         |  SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
         |  FROM lineitem GROUP BY l_partkey) a ON l_partkey = pk
         |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,

    "h1_having" ->
      """SELECT c_mktsegment AS segment, count(*) AS cnt FROM customer
        |GROUP BY c_mktsegment
        |HAVING count(*) > (SELECT count(*) FROM customer) * 0.15""".stripMargin,

    "p1_pivot" ->
      """SELECT c_nationkey AS nationkey,
        |CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
        |CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
        |CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
        |CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
        |CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
        |FROM customer GROUP BY c_nationkey""".stripMargin,

    "f3_fuzzy_levenshtein" ->
      """SELECT a.r_name AS name_a, b.r_name AS name_b,
        |CAST(levenshtein(a.r_name, b.r_name) AS BIGINT) AS dist
        |FROM region a, region b
        |WHERE a.r_name < b.r_name AND levenshtein(a.r_name, b.r_name) <= 6""".stripMargin,

    "f4_null_handling" ->
      """SELECT o_orderkey AS orderkey,
        |coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        |nullif(o_orderstatus, 'O') IS NULL AS was_open,
        |nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS is_f_nullsafe
        |FROM orders""".stripMargin,

    "q22_dormant_accounts" ->
      s"""SELECT c_mktsegment AS segment, count(*) AS cnt,
         |CAST(sum(${centsSql("c_acctbal")}) AS DOUBLE) / 100 AS total_bal
         |FROM customer
         |WHERE ${centsSql("c_acctbal")}
         |    * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
         |  > (SELECT sum(${centsSql("c_acctbal")}) FROM customer WHERE c_acctbal > 0)
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         |GROUP BY c_mktsegment""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT CAST(sum(${centsSql("l_extendedprice")} * ${centsSql("l_discount")})
         |  AS DOUBLE) / 10000 AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(sum(${c4Sql("l_extendedprice", "l_discount")}) AS DOUBLE) / 10000 AS revenue
         |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      s"""WITH s AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
        |      THEN ${c4Sql("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE)
        |      / 10000 AS nation_volume,
        |    CAST(sum(${c4Sql("l_extendedprice", "l_discount")}) AS DOUBLE)
        |      / 10000 AS total_volume
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'AMERICA'
        |  GROUP BY 1)
        |SELECT o_year, nation_volume, total_volume,
        |  CAST(floor(1000000.0 * nation_volume / total_volume) AS BIGINT) AS share_micro
        |FROM s""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
        |  CAST(sum(${c4Sql("l_extendedprice", "l_discount")}) AS DOUBLE) / 10000 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= '1997-01-01' AND o_orderdate < '1997-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, custkey LIMIT 20""".stripMargin,

    "q12_late_shipments" ->
      """SELECT o_orderpriority AS priority,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE)) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
        |  CAST(sum(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE)) <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,

    "q14_promo_effect" ->
      s"""WITH s AS (SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN ${c4Sql("l_extendedprice", "l_discount")} ELSE 0 END) AS DOUBLE)
        |    / 10000 AS promo_revenue,
        |  CAST(sum(${c4Sql("l_extendedprice", "l_discount")}) AS DOUBLE)
        |    / 10000 AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1999-01-01')
        |SELECT promo_revenue, total_revenue,
        |  CAST(floor(1000000.0 * promo_revenue / total_revenue) AS BIGINT) AS promo_micro
        |FROM s""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_custkey AS custkey, c_name AS name, o_orderkey AS orderkey,
        |  o_orderdate AS orderdate, total_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200) b
        |JOIN orders ON b.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q19_branded_revenue" ->
      s"""SELECT CAST(sum(${c4Sql("l_extendedprice", "l_discount")}) AS DOUBLE)
        |  / 10000 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#25' AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "d_minhash_sig" -> {
      val hs = (1 to 4).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(",\n ")
      s"""$SHINGLE_CTES
         |SELECT doc_id,
         | $hs
         |FROM s""".stripMargin
    },

    "d_minhash_lsh" -> {
      val hs = (1 to 8).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(", ")
      val bands = (0 until 4).map { b =>
        val (l, r) = (s"h${2 * b + 1}", s"h${2 * b + 2}")
        s"SELECT doc_id, $b AS band, ${md5i(s"CAST($l AS VARCHAR) || '_' || CAST($r AS VARCHAR)")} AS bucket FROM sig"
      }.mkString("\nUNION ALL ")
      s"""$SHINGLE_CTES,
         |sig AS (SELECT doc_id, $hs FROM s),
         |b AS ($bands)
         |SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id""".stripMargin
    },

    "d_dup_clusters" -> {
      val hs = (1 to 8).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(", ")
      val bands = (0 until 4).map { b =>
        val (l, r) = (s"h${2 * b + 1}", s"h${2 * b + 2}")
        s"SELECT doc_id, $b AS band, ${md5i(s"CAST($l AS VARCHAR) || '_' || CAST($r AS VARCHAR)")} AS bucket FROM sig"
      }.mkString("\nUNION ALL ")
      s"""WITH RECURSIVE ${SHINGLE_CTES.stripPrefix("WITH ")},
         |sig AS (SELECT doc_id, $hs FROM s),
         |b AS ($bands),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION ALL SELECT id_b, id_a FROM p),
         |reach(origin, node) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.origin, e2.dst FROM reach r JOIN e e2 ON r.node = e2.src
         |)
         |SELECT origin AS doc_id, least(min(node), origin) AS canonical
         |FROM reach GROUP BY origin""".stripMargin
    },

    // d_dup_clusters' recursive-closure clustering + t_quality_score's
    // floor4 quality, argmax per cluster (max quality, tie min doc_id),
    // singletons self-canonical via LEFT JOIN.
    "d_keep_best" -> {
      val hs = (1 to 8).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(", ")
      val bands = (0 until 4).map { b =>
        val (l, r) = (s"h${2 * b + 1}", s"h${2 * b + 2}")
        s"SELECT doc_id, $b AS band, ${md5i(s"CAST($l AS VARCHAR) || '_' || CAST($r AS VARCHAR)")} AS bucket FROM sig"
      }.mkString("\nUNION ALL ")
      s"""WITH RECURSIVE ${SHINGLE_CTES.stripPrefix("WITH ")},
         |sig AS (SELECT doc_id, $hs FROM s),
         |b AS ($bands),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION ALL SELECT id_b, id_a FROM p),
         |reach(origin, node) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.origin, e2.dst FROM reach r JOIN e e2 ON r.node = e2.src
         |),
         |cl AS (SELECT origin AS doc_id, least(min(node), origin) AS canonical
         |  FROM reach GROUP BY origin),
         |q0 AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |q AS (SELECT doc_id,
         |  floor(least(greatest(0.4 * least(CAST(len(w) AS BIGINT) / 100.0, 1.0)
         |    + 0.3 * (1.0 - (CAST(length(text) AS DOUBLE)
         |        - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE))
         |    + 0.3 * least((CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
         |        (a,b) -> a + b) AS DOUBLE) / greatest(len(w), 1)) / 8.0, 1.0), 0.0), 1.0)
         |    * 10000) / 10000 AS quality
         |  FROM q0),
         |m AS (SELECT d.doc_id, coalesce(cl.canonical, d.doc_id) AS canonical, q.quality
         |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
         |  JOIN q ON d.doc_id = q.doc_id),
         |best AS (SELECT canonical, max(quality) AS bq FROM m GROUP BY 1),
         |w2 AS (SELECT m.canonical, min(m.doc_id) AS keep_id
         |  FROM m JOIN best ON m.canonical = best.canonical AND m.quality = best.bq
         |  GROUP BY 1)
         |SELECT m.doc_id, m.canonical, m.quality, m.doc_id = w2.keep_id AS keep
         |FROM m JOIN w2 ON m.canonical = w2.canonical""".stripMargin
    },

    // d_keep_best's WITH RECURSIVE closure + argmax, then the canonical
    // corpus: winners only, cluster sizes, whitespace token counts.
    "d_pipeline_dedup" -> {
      val hs = (1 to 8).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(", ")
      val bands = (0 until 4).map { b =>
        val (l, r) = (s"h${2 * b + 1}", s"h${2 * b + 2}")
        s"SELECT doc_id, $b AS band, ${md5i(s"CAST($l AS VARCHAR) || '_' || CAST($r AS VARCHAR)")} AS bucket FROM sig"
      }.mkString("\nUNION ALL ")
      s"""WITH RECURSIVE ${SHINGLE_CTES.stripPrefix("WITH ")},
         |sig AS (SELECT doc_id, $hs FROM s),
         |b AS ($bands),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p UNION ALL SELECT id_b, id_a FROM p),
         |reach(origin, node) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.origin, e2.dst FROM reach r JOIN e e2 ON r.node = e2.src
         |),
         |cl AS (SELECT origin AS doc_id, least(min(node), origin) AS canonical
         |  FROM reach GROUP BY origin),
         |q0 AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |q AS (SELECT doc_id,
         |  floor(least(greatest(0.4 * least(CAST(len(w) AS BIGINT) / 100.0, 1.0)
         |    + 0.3 * (1.0 - (CAST(length(text) AS DOUBLE)
         |        - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE))
         |    + 0.3 * least((CAST(list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
         |        (a,b) -> a + b) AS DOUBLE) / greatest(len(w), 1)) / 8.0, 1.0), 0.0), 1.0)
         |    * 10000) / 10000 AS quality
         |  FROM q0),
         |m AS (SELECT d.doc_id, coalesce(cl.canonical, d.doc_id) AS canonical, q.quality
         |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
         |  JOIN q ON d.doc_id = q.doc_id),
         |best AS (SELECT canonical, max(quality) AS bq FROM m GROUP BY 1),
         |w2 AS (SELECT m.canonical, min(m.doc_id) AS keep_id
         |  FROM m JOIN best ON m.canonical = best.canonical AND m.quality = best.bq
         |  GROUP BY 1),
         |sz AS (SELECT canonical, CAST(count(*) AS BIGINT) AS n_members FROM m GROUP BY 1)
         |SELECT m.doc_id, m.canonical, m.quality, sz.n_members,
         |  CAST(len(q0.w) AS BIGINT) AS n_tokens
         |FROM m JOIN w2 ON m.canonical = w2.canonical AND m.doc_id = w2.keep_id
         |JOIN sz ON m.canonical = sz.canonical
         |JOIN q0 ON m.doc_id = q0.doc_id""".stripMargin
    },

    "d_simhash" -> {
      val votes = (0 until 16).map(b =>
        s"sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(",\n ")
      val fp = (0 until 16).map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      s"""$WORDS_CTE,
         |u AS (SELECT doc_id, unnest(w) AS word FROM t),
         |hh AS (SELECT doc_id, ${md5i(s"word")} AS hv FROM u),
         |v AS (SELECT doc_id,
         | $votes
         | FROM hh GROUP BY doc_id)
         |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM v""".stripMargin
    },

    // d_simhash's vote fold at 60 bits, then the pigeonhole band join +
    // exact popcount filter (DuckDB xor/bit_count on the same BIGINT fp).
    "d_simhash_neardup" -> {
      val votes = (0 until 60).map(b =>
        s"sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(",\n ")
      val fp = (0 until 60).map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      val bands = (0 to 3).map(b =>
        s"SELECT doc_id, fp, $b AS band, (fp >> ${b * 15}) & 32767 AS bval FROM f").mkString("\nUNION ALL ")
      s"""$WORDS_CTE,
         |u AS (SELECT doc_id, unnest(w) AS word FROM t),
         |hh AS (SELECT doc_id, ${md5i(s"word")} AS hv FROM u),
         |v AS (SELECT doc_id,
         | $votes
         | FROM hh GROUP BY doc_id),
         |f AS (SELECT doc_id, CAST($fp AS BIGINT) AS fp FROM v),
         |b AS ($bands)
         |SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         |  CAST(bit_count(xor(a.fp, b2.fp)) AS BIGINT) AS hamming
         |FROM b a JOIN b b2 ON a.band = b2.band AND a.bval = b2.bval AND a.doc_id < b2.doc_id
         |WHERE bit_count(xor(a.fp, b2.fp)) <= 3""".stripMargin
    },

    "d_ngram_jaccard" ->
      s"""$SHINGLE_CTES,
         |base AS (SELECT doc_id, list_distinct(sh) AS shd,
         |  list_min(list_transform(sh, x -> ${md5i(s"x || '|1'")})) AS h1 FROM s)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         | floor(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
         |   / len(list_distinct(a.shd || b.shd)) * 10000) / 10000 AS jaccard
         |FROM base a JOIN base b ON a.h1 = b.h1 AND a.doc_id < b.doc_id""".stripMargin,

    // brute-force all-pairs exact Jaccard at θ=0.8 — deliberately NOT a
    // mirror of the prefix-filter plan, so a hash match proves the
    // blocking is lossless (no false negatives), not just self-consistent.
    "d_prefix_join" ->
      s"""$SHINGLE_CTES,
         |base AS (SELECT doc_id, list_distinct(sh) AS shd FROM s WHERE len(sh) > 0),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.shd, b.shd)) AS BIGINT) AS inter,
         |  CAST(len(a.shd) AS BIGINT) + CAST(len(b.shd) AS BIGINT) AS szsum
         |  FROM base a JOIN base b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, inter, szsum - inter AS uni,
         |  inter * 1000000 // (szsum - inter) AS jaccard_micro
         |FROM p WHERE inter * 10 >= (szsum - inter) * 8""".stripMargin,

    // same candidate pairs, asymmetric containment normalizations.
    "d_ngram_containment" ->
      s"""$SHINGLE_CTES,
         |base AS (SELECT doc_id, list_distinct(sh) AS shd,
         |  list_min(list_transform(sh, x -> ${md5i(s"x || '|1'")})) AS h1 FROM s)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         | floor(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
         |   / len(a.shd) * 10000) / 10000 AS cont_ab,
         | floor(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
         |   / len(b.shd) * 10000) / 10000 AS cont_ba
         |FROM base a JOIN base b ON a.h1 = b.h1 AND a.doc_id < b.doc_id""".stripMargin,

    // signature agreement m of 8, inverted to an intersection estimate in
    // exact integer division, normalized by the exact per-doc set sizes.
    "d_containment_est" -> {
      val k = 8
      val hs = (1 to k).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(", ")
      val bands = (0 until 4).map { b =>
        val (l, r) = (s"h${2 * b + 1}", s"h${2 * b + 2}")
        s"SELECT doc_id, $b AS band, ${md5i(s"CAST($l AS VARCHAR) || '_' || CAST($r AS VARCHAR)")} AS bucket FROM sig"
      }.mkString("\nUNION ALL ")
      val m = (1 to k).map(i => s"CASE WHEN a.h$i = b2.h$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""$SHINGLE_CTES,
         |sig AS (SELECT doc_id, $hs, len(list_distinct(sh)) AS sz FROM s),
         |b AS ($bands),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
         |j AS (SELECT p.id_a, p.id_b, CAST($m AS BIGINT) AS matches,
         |  CAST(a.sz AS BIGINT) AS sa, CAST(b2.sz AS BIGINT) AS sb
         |  FROM p JOIN sig a ON p.id_a = a.doc_id JOIN sig b2 ON p.id_b = b2.doc_id)
         |SELECT id_a, id_b, matches,
         |  floor(CAST(matches * (sa + sb) // ($k + matches) AS DOUBLE) / sa * 10000) / 10000 AS cont_ab_est,
         |  floor(CAST(matches * (sa + sb) // ($k + matches) AS DOUBLE) / sb * 10000) / 10000 AS cont_ba_est
         |FROM j""".stripMargin
    },

    // est-vs-exact containment on the pairs both candidate generators
    // surface; errors in exact 1e-4 integer units.
    "d_containment_eval" -> {
      val k = 8
      val hs = (1 to k).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(", ")
      val bands = (0 until 4).map { b =>
        val (l, r) = (s"h${2 * b + 1}", s"h${2 * b + 2}")
        s"SELECT doc_id, $b AS band, ${md5i(s"CAST($l AS VARCHAR) || '_' || CAST($r AS VARCHAR)")} AS bucket FROM sig"
      }.mkString("\nUNION ALL ")
      val m = (1 to k).map(i => s"CASE WHEN a.h$i = b2.h$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""$SHINGLE_CTES,
         |sig AS (SELECT doc_id, $hs, len(list_distinct(sh)) AS sz FROM s),
         |b AS ($bands),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
         |je0 AS (SELECT p.id_a, p.id_b, CAST($m AS BIGINT) AS mm,
         |  CAST(a.sz AS BIGINT) AS sa, CAST(b2.sz AS BIGINT) AS sb
         |  FROM p JOIN sig a ON p.id_a = a.doc_id JOIN sig b2 ON p.id_b = b2.doc_id),
         |je AS (SELECT id_a, id_b,
         |  CAST(floor(CAST(mm * (sa + sb) // ($k + mm) AS DOUBLE) / sa * 10000) AS BIGINT) AS eu
         |  FROM je0),
         |base AS (SELECT doc_id, list_distinct(sh) AS shd,
         |  list_min(list_transform(sh, x -> ${md5i(s"x || '|1'")})) AS h1 FROM s),
         |jx AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(floor(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
         |    / len(a.shd) * 10000) AS BIGINT) AS xu
         |  FROM base a JOIN base b ON a.h1 = b.h1 AND a.doc_id < b.doc_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(abs(eu - xu)) // count(*) AS BIGINT) AS mae_x10000,
         |  CAST(max(abs(eu - xu)) AS BIGINT) AS max_x10000
         |FROM je JOIN jx USING (id_a, id_b)""".stripMargin
    },

    // d_minhash_lsh's candidate pairs + d_ngram_jaccard's exact floored
    // Jaccard, reduced to one audit row at threshold 0.5.
    "d_lsh_precision" -> {
      val hs = (1 to 8).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(", ")
      val bands = (0 until 4).map { b =>
        val (l, r) = (s"h${2 * b + 1}", s"h${2 * b + 2}")
        s"SELECT doc_id, $b AS band, ${md5i(s"CAST($l AS VARCHAR) || '_' || CAST($r AS VARCHAR)")} AS bucket FROM sig"
      }.mkString("\nUNION ALL ")
      s"""$SHINGLE_CTES,
         |sig AS (SELECT doc_id, $hs FROM s),
         |b AS ($bands),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |  FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id),
         |base AS (SELECT doc_id, list_distinct(sh) AS shd FROM s),
         |j AS (SELECT floor(CAST(len(list_intersect(a.shd, b.shd)) AS DOUBLE)
         |    / len(list_distinct(a.shd || b.shd)) * 10000) / 10000 AS jaccard
         |  FROM p JOIN base a ON p.id_a = a.doc_id JOIN base b ON p.id_b = b.doc_id),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates,
         |  CAST(coalesce(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_true FROM j)
         |SELECT n_candidates, n_true,
         |  CASE WHEN n_candidates > 0
         |    THEN floor(CAST(n_true AS DOUBLE) / n_candidates * 10000) / 10000
         |    ELSE 0.0 END AS "precision"
         |FROM agg""".stripMargin
    },

    "e1_cosine_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |q AS (SELECT vec_id, e FROM v WHERE vec_id < 10),
         |sc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         | round(${cosSql("q.e", "v.e")}, 6) AS cos
         | FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cos,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 5""".stripMargin,

    // e23's replay swept over three pool sizes from shared CTEs.
    "e25_candidates_curve" -> {
      def word(lo: Int, hi: Int) =
        s"list_reduce(list_transform(e[$lo:$hi], x -> CASE WHEN x >= 0 " +
          "THEN 1::BIGINT ELSE 0::BIGINT END), (a, b) -> a * 2 + b)"
      def rec(c: Int) =
        s"""SELECT CAST($c AS BIGINT) AS candidates,
           |  CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
           |  CAST(count(ap.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_ppm
           |FROM ex LEFT JOIN (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT sc.query_id, sc.neighbor_id,
           |      row_number() OVER (PARTITION BY sc.query_id ORDER BY sc.cos DESC, sc.neighbor_id) AS rk
           |    FROM (SELECT h.query_id, h.neighbor_id,
           |        round(${cosSql("h.qe", "h.ne")}, 6) AS cos
           |      FROM h WHERE h.hrank <= $c) sc) WHERE rk <= 5
           |) ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id""".stripMargin
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |w AS (SELECT vec_id, e, ${word(1, 32)} AS w0, ${word(33, 64)} AS w1 FROM v),
         |q AS (SELECT * FROM w WHERE vec_id < 10),
         |exsc AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |  round(${cosSql("q.e", "w.e")}, 6) AS cos
         |  FROM q JOIN w ON w.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM exsc) WHERE rk <= 5),
         |h AS (SELECT query_id, neighbor_id, qe, ne,
         |  row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS hrank
         |  FROM (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |    CAST(bit_count(xor(q.w0, w.w0)) + bit_count(xor(q.w1, w.w1)) AS BIGINT) AS hamming,
         |    q.e AS qe, w.e AS ne
         |    FROM q JOIN w ON w.vec_id <> q.vec_id))
         |${rec(10)}
         |UNION ALL
         |${rec(20)}
         |UNION ALL
         |${rec(40)}""".stripMargin
    },

    // e22's candidate/rerank replayed next to the brute-force top-5, the
    // e10 recall-overlap join on top.
    "e23_binary_recall" -> {
      def word(lo: Int, hi: Int) =
        s"list_reduce(list_transform(e[$lo:$hi], x -> CASE WHEN x >= 0 " +
          "THEN 1::BIGINT ELSE 0::BIGINT END), (a, b) -> a * 2 + b)"
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |w AS (SELECT vec_id, e, ${word(1, 32)} AS w0, ${word(33, 64)} AS w1 FROM v),
         |q AS (SELECT * FROM w WHERE vec_id < 10),
         |exsc AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |  round(${cosSql("q.e", "w.e")}, 6) AS cos
         |  FROM q JOIN w ON w.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM exsc) WHERE rk <= 5),
         |h AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |  CAST(bit_count(xor(q.w0, w.w0)) + bit_count(xor(q.w1, w.w1)) AS BIGINT) AS hamming,
         |  q.e AS qe, w.e AS ne
         |  FROM q JOIN w ON w.vec_id <> q.vec_id),
         |cand AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY hamming, neighbor_id) AS hrank FROM h) WHERE hrank <= 20),
         |apsc AS (SELECT query_id, neighbor_id,
         |  round(${cosSql("qe", "ne")}, 6) AS cos FROM cand),
         |ap AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM apsc) WHERE rk <= 5)
         |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  floor(CAST(count(ap.neighbor_id) AS DOUBLE) / count(*) * 10000) / 10000 AS recall
         |FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
         |GROUP BY ex.query_id""".stripMargin
    },

    // Same Horner sign-packing (two 32-bit words), Hamming candidates,
    // cosine rerank. DuckDB's ^ is power, so xor() is spelled out.
    "e22_binary_rerank" -> {
      def word(lo: Int, hi: Int) =
        s"list_reduce(list_transform(e[$lo:$hi], x -> CASE WHEN x >= 0 " +
          "THEN 1::BIGINT ELSE 0::BIGINT END), (a, b) -> a * 2 + b)"
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |w AS (SELECT vec_id, e, ${word(1, 32)} AS w0, ${word(33, 64)} AS w1 FROM v),
         |q AS (SELECT * FROM w WHERE vec_id < 10),
         |h AS (SELECT q.vec_id AS query_id, w.vec_id AS neighbor_id,
         |  CAST(bit_count(xor(q.w0, w.w0)) + bit_count(xor(q.w1, w.w1)) AS BIGINT) AS hamming,
         |  q.e AS qe, w.e AS ne
         |  FROM q JOIN w ON w.vec_id <> q.vec_id),
         |cand AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY hamming, neighbor_id) AS hrank FROM h) WHERE hrank <= 20),
         |sc AS (SELECT query_id, neighbor_id, hamming,
         |  round(${cosSql("qe", "ne")}, 6) AS cos FROM cand)
         |SELECT query_id, neighbor_id, hamming, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 5""".stripMargin
    },

    "e16_hard_negatives" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |q AS (SELECT vec_id, e FROM v WHERE vec_id < 20),
         |sc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         | round(${cosSql("q.e", "v.e")}, 6) AS cos
         | FROM q JOIN v ON v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cos,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc WHERE cos >= 0.15 AND cos < 0.35 QUALIFY rank <= 5""".stripMargin,

    "e13_knn_classify" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e, label FROM embeddings),
         |q AS (SELECT vec_id, e, label FROM v WHERE vec_id % 10 < 2),
         |sc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, v.label AS nlabel,
         | round(${cosSql("q.e", "v.e")}, 6) AS cos
         | FROM q JOIN v ON v.vec_id <> q.vec_id),
         |top AS (SELECT query_id, nlabel FROM (
         |  SELECT query_id, nlabel,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r
         |  FROM sc) WHERE r <= 5),
         |votes AS (SELECT query_id, nlabel, count(*) AS votes FROM top GROUP BY 1, 2),
         |pred AS (SELECT query_id, nlabel AS pred FROM (
         |  SELECT query_id, nlabel,
         |    row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, nlabel) AS r
         |  FROM votes) WHERE r = 1)
         |SELECT q.label AS label, count(*) AS n_eval,
         |  CAST(sum(CASE WHEN q.label = pred.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |FROM q JOIN pred ON q.vec_id = pred.query_id
         |GROUP BY q.label""".stripMargin,

    "e2_lsh_ann" -> {
      val sig = (0 until 4).map { j =>
        val proj = s"list_reduce(list_transform(generate_series(1, len(e)), i -> CAST(e[i] AS DOUBLE) * " +
          s"(CASE WHEN ${md5i(s"'${j}_' || CAST(i AS VARCHAR)")} % 2 = 0 THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b)"
        s"(CASE WHEN $proj > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH v AS (SELECT vec_id, embedding AS e, CAST($sig AS BIGINT) AS sig FROM embeddings),
         |q AS (SELECT vec_id, e, sig FROM v WHERE vec_id < 50),
         |sc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         | round(${cosSql("q.e", "v.e")}, 6) AS cos
         | FROM q JOIN v ON q.sig = v.sig AND v.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cos,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 3""".stripMargin
    },

    // Full NN-descent replay: TWO independent md5 blockings seed the
    // top-5 graph (one blocking alone is block-diagonal — see the
    // operator's scaladoc), undirected 2-hop candidate expansion, exact
    // rescore — same 6dp-rounded sequential-fold cosine and (cos desc,
    // id) ties, so the hash proves the whole descent, not just one
    // round's scores.
    "e20_nn_descent" ->
      s"""WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         |  ${md5i("CAST(vec_id AS VARCHAR) || '|1'")} % 16 AS b1,
         |  ${md5i("CAST(vec_id AS VARCHAR) || '|2'")} % 16 AS b2 FROM embeddings),
         |sp AS (SELECT a.id AS query_id, b.id AS neighbor_id, round(${cosSql("a.e", "b.e")}, 6) AS cos
         |  FROM v a JOIN v b ON (a.b1 = b.b1 OR a.b2 = b.b2) AND a.id <> b.id),
         |seed AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r FROM sp)
         |  WHERE r <= 5),
         |und AS (SELECT query_id AS u, neighbor_id AS w FROM seed
         |  UNION SELECT neighbor_id, query_id FROM seed),
         |two AS (SELECT a.u, b.w FROM und a JOIN und b ON a.w = b.u WHERE a.u <> b.w),
         |cand AS (SELECT u AS query_id, w AS neighbor_id FROM und
         |  UNION SELECT u, w FROM two),
         |sc AS (SELECT c.query_id, c.neighbor_id, round(${cosSql("qa.e", "qb.e")}, 6) AS cos
         |  FROM cand c JOIN v qa ON qa.id = c.query_id JOIN v qb ON qb.id = c.neighbor_id)
         |SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 5""".stripMargin,

    // e20's descent replayed in full, scored against the brute-force
    // top-5 of the md5 quarter-sample of queries, reduced to one
    // integer-micro summary row.
    "e21_nnd_recall" ->
      s"""WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         |  ${md5i("CAST(vec_id AS VARCHAR) || '|1'")} % 16 AS b1,
         |  ${md5i("CAST(vec_id AS VARCHAR) || '|2'")} % 16 AS b2 FROM embeddings),
         |qs AS (SELECT id, e FROM v WHERE ${md5i("CAST(id AS VARCHAR) || '|101'")} % 4 = 0),
         |exsc AS (SELECT a.id AS query_id, b.id AS neighbor_id, round(${cosSql("a.e", "b.e")}, 6) AS cos
         |  FROM qs a JOIN v b ON a.id <> b.id),
         |ex AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM exsc)
         |  WHERE rk <= 5),
         |sp AS (SELECT a.id AS query_id, b.id AS neighbor_id, round(${cosSql("a.e", "b.e")}, 6) AS cos
         |  FROM v a JOIN v b ON (a.b1 = b.b1 OR a.b2 = b.b2) AND a.id <> b.id),
         |seed AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r FROM sp)
         |  WHERE r <= 5),
         |und AS (SELECT query_id AS u, neighbor_id AS w FROM seed
         |  UNION SELECT neighbor_id, query_id FROM seed),
         |two AS (SELECT a.u, b.w FROM und a JOIN und b ON a.w = b.u WHERE a.u <> b.w),
         |cand AS (SELECT u AS query_id, w AS neighbor_id FROM und
         |  UNION SELECT u, w FROM two),
         |sc AS (SELECT c.query_id, c.neighbor_id, round(${cosSql("qa.e", "qb.e")}, 6) AS cos
         |  FROM cand c JOIN v qa ON qa.id = c.query_id JOIN v qb ON qb.id = c.neighbor_id),
         |ap AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk FROM sc)
         |  WHERE rk <= 5)
         |SELECT CAST(count(DISTINCT ex.query_id) AS BIGINT) AS n_queries,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(count(ap.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_micro
         |FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id""".stripMargin,

    // iters=0 IVF: centroids are the 8 corpus vectors with smallest
    // md5(vec_id); assignment/probing argmin over sequential-fold L2 —
    // identical doubles in both engines, ties broken by cid.
    "e4b_ivf_fixed" -> ivfFixedOracleSql,

    // The e4b index replayed at three probe depths; shared CTEs, one
    // summary row per nprobe.
    "e24_nprobe_curve" -> {
      def rec(np: Int) =
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
           |  CAST(count(*) AS BIGINT) AS n_exact,
           |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
           |  CAST(count(ap.neighbor_id) * 1000000 // count(*) AS BIGINT) AS recall_ppm
           |FROM ex LEFT JOIN (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT sc.query_id, sc.neighbor_id,
           |      row_number() OVER (PARTITION BY sc.query_id ORDER BY sc.cos DESC, sc.neighbor_id) AS rk
           |    FROM (SELECT pr.query_id, a.vec_id AS neighbor_id,
           |        round(${cosSql("pr.qv", "a.e")}, 6) AS cos
           |      FROM pra pr JOIN asg a ON a.cid = pr.cid AND a.vec_id <> pr.query_id
           |      WHERE pr.r <= $np) sc) WHERE rk <= 3
           |) ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id""".stripMargin
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
         |cent AS (SELECT CAST(rn - 1 AS INT) AS cid, e AS cvec FROM sd WHERE rn <= 8),
         |asg AS (SELECT vec_id, e, cid FROM (
         |  SELECT v.vec_id, v.e, c.cid,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY ${l2Sql("v.e", "c.cvec")}, c.cid) AS r
         |  FROM v CROSS JOIN cent c) WHERE r = 1),
         |q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 20),
         |exsc AS (SELECT q.query_id, v.vec_id AS neighbor_id,
         |  round(${cosSql("q.qv", "v.e")}, 6) AS cos
         |  FROM q JOIN v ON v.vec_id <> q.query_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM exsc) WHERE rk <= 3),
         |pra AS (SELECT query_id, qv, cid, r FROM (
         |  SELECT q.query_id, q.qv, c.cid,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY ${l2Sql("q.qv", "c.cvec")}, c.cid) AS r
         |  FROM q CROSS JOIN cent c))
         |${rec(1)}
         |UNION ALL
         |${rec(2)}
         |UNION ALL
         |${rec(4)}""".stripMargin
    },

    // The persisted-index gate serves the SAME deterministic IVF from
    // reloaded parquet tables — one oracle proves both paths (and that
    // the round trip changed nothing).
    "e17_ivf_index_persist" -> ivfFixedOracleSql,

    // PQ codes: codebook (sub, cid) = subspace sub of the cid-th
    // md5-seeded vector; integer codes — exact in any engine.
    "e7_pq_codes" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
         |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
         |g AS (SELECT unnest(generate_series(0, 3)) AS sub),
         |cb AS (SELECT g.sub, CAST(sd.rn - 1 AS INT) AS cid, ${pqSubSql("sd.e", "g.sub")} AS cvec
         |  FROM sd CROSS JOIN g WHERE sd.rn <= 16),
         |sv AS (SELECT v.vec_id, g.sub, ${pqSubSql("v.e", "g.sub")} AS svec FROM v CROSS JOIN g),
         |asg AS (SELECT vec_id, sub, cid FROM (
         |  SELECT sv.vec_id, sv.sub, cb.cid,
         |    row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY ${l2Sql("sv.svec", "cb.cvec")}, cb.cid) AS r
         |  FROM sv JOIN cb USING (sub)) WHERE r = 1)
         |SELECT vec_id, CAST(sub AS INTEGER) AS sub, cid AS code FROM asg""".stripMargin,

    // IVF+PQ ADC: coarse cells = e4b's iters=0 quantizer (rn<=8 seeds);
    // candidate distance = sum over subspaces of L2²(query subvector,
    // candidate's codebook centroid), folded in subspace order.
    "e8_ivfpq_ann" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
         |sd AS (SELECT vec_id, e, row_number() OVER (ORDER BY ${md5i("CAST(vec_id AS VARCHAR)")}, vec_id) AS rn FROM v),
         |g AS (SELECT unnest(generate_series(0, 3)) AS sub),
         |cent AS (SELECT CAST(rn - 1 AS INT) AS ccid, e AS ccv FROM sd WHERE rn <= 8),
         |cb AS (SELECT g.sub, CAST(sd.rn - 1 AS INT) AS cid, ${pqSubSql("sd.e", "g.sub")} AS cvec
         |  FROM sd CROSS JOIN g WHERE sd.rn <= 16),
         |asgc AS (SELECT vec_id, ccid FROM (
         |  SELECT v.vec_id, c.ccid,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY ${l2Sql("v.e", "c.ccv")}, c.ccid) AS r
         |  FROM v CROSS JOIN cent c) WHERE r = 1),
         |pqa AS (SELECT vec_id, sub, cid FROM (
         |  SELECT sv.vec_id, sv.sub, cb.cid,
         |    row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY ${l2Sql("sv.svec", "cb.cvec")}, cb.cid) AS r
         |  FROM (SELECT v.vec_id, g.sub, ${pqSubSql("v.e", "g.sub")} AS svec FROM v CROSS JOIN g) sv
         |  JOIN cb USING (sub)) WHERE r = 1),
         |q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 20),
         |pr AS (SELECT query_id, qv, ccid FROM (
         |  SELECT q.query_id, q.qv, c.ccid,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY ${l2Sql("q.qv", "c.ccv")}, c.ccid) AS r
         |  FROM q CROSS JOIN cent c) WHERE r <= 2),
         |cand AS (SELECT pr.query_id, pr.qv, a.vec_id AS neighbor_id
         |  FROM pr JOIN asgc a ON a.ccid = pr.ccid AND a.vec_id <> pr.query_id),
         |terms AS (SELECT c.query_id, c.neighbor_id, p.sub,
         |  ${l2Sql(pqSubSql("c.qv", "p.sub"), "cb.cvec")} AS t
         |  FROM cand c JOIN pqa p ON p.vec_id = c.neighbor_id
         |  JOIN cb ON cb.sub = p.sub AND cb.cid = p.cid),
         |ad AS (SELECT query_id, neighbor_id,
         |  round(list_reduce(list(t ORDER BY sub), (a, b) -> a + b), 6) AS adist
         |  FROM terms GROUP BY 1, 2)
         |SELECT query_id, neighbor_id, adist,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS INTEGER) AS rank
         |FROM ad QUALIFY rank <= 3""".stripMargin,

    // Nearest-class-centroid: micro-unit quantization (floor(x·1e6+0.5)),
    // exact BIGINT sums, ONE floored division per centroid element, exact
    // integer squared-L2 — every intermediate engine-portable.
    "e9_centroid_assign" ->
      """WITH q AS (SELECT vec_id, label,
        |  list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |x AS (SELECT label AS clabel, unnest(qv) AS v, unnest(range(1, len(qv) + 1)) AS dim FROM q),
        |m AS (SELECT clabel, dim, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
        |  FROM x GROUP BY clabel, dim),
        |c AS (SELECT clabel, list(cv ORDER BY dim) AS cvec FROM m GROUP BY clabel),
        |s AS (SELECT vec_id, label, clabel, CAST(sum((a - b) * (a - b)) AS BIGINT) AS dist
        |  FROM (SELECT q.vec_id, q.label, c.clabel, unnest(q.qv) AS a, unnest(c.cvec) AS b
        |        FROM q CROSS JOIN c)
        |  GROUP BY vec_id, label, clabel)
        |SELECT vec_id, label, clabel AS pred_label, dist FROM (
        |  SELECT vec_id, label, clabel, dist,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rk
        |  FROM s) WHERE rk = 1""".stripMargin,

    // e9's assignment chain + one Lloyd update: the predicted clusters'
    // re-computed integer centroids, (clabel, dim, cv) rows.
    "e12_lloyd_step" ->
      """WITH q AS (SELECT vec_id, label,
        |  list_transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |x AS (SELECT label AS clabel, unnest(qv) AS v, unnest(range(1, len(qv) + 1)) AS dim FROM q),
        |m AS (SELECT clabel, dim, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
        |  FROM x GROUP BY clabel, dim),
        |c AS (SELECT clabel, list(cv ORDER BY dim) AS cvec FROM m GROUP BY clabel),
        |s AS (SELECT vec_id, label, clabel, CAST(sum((a - b) * (a - b)) AS BIGINT) AS dist
        |  FROM (SELECT q.vec_id, q.label, c.clabel, unnest(q.qv) AS a, unnest(c.cvec) AS b
        |        FROM q CROSS JOIN c)
        |  GROUP BY vec_id, label, clabel),
        |asg AS (SELECT vec_id, clabel FROM (
        |  SELECT vec_id, clabel, row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rk
        |  FROM s) WHERE rk = 1),
        |u AS (SELECT asg.clabel, unnest(q.qv) AS v, unnest(range(1, len(q.qv) + 1)) AS dim
        |  FROM q JOIN asg ON q.vec_id = asg.vec_id)
        |SELECT clabel, CAST(dim AS BIGINT) AS dim,
        |  CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
        |FROM u GROUP BY clabel, dim""".stripMargin,

    // ANN recall@5: exact side = e1's ranking, approx side = e2's
    // signature-bucket ranking, both at k=5 over vec_id < 10; recall is
    // the per-query intersection share, floor-4dp.
    "e10_ann_recall" -> {
      val sig = (0 until 4).map { j =>
        val proj = s"list_reduce(list_transform(generate_series(1, len(e)), i -> CAST(e[i] AS DOUBLE) * " +
          s"(CASE WHEN ${md5i(s"'${j}_' || CAST(i AS VARCHAR)")} % 2 = 0 THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b)"
        s"(CASE WHEN $proj > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH v AS (SELECT vec_id, embedding AS e, CAST($sig AS BIGINT) AS sig FROM embeddings),
         |q AS (SELECT vec_id, e, sig FROM v WHERE vec_id < 10),
         |exsc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |  round(${cosSql("q.e", "v.e")}, 6) AS cos
         |  FROM q JOIN v ON v.vec_id <> q.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM exsc) WHERE rk <= 5),
         |apsc AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         |  round(${cosSql("q.e", "v.e")}, 6) AS cos
         |  FROM q JOIN v ON q.sig = v.sig AND v.vec_id <> q.vec_id),
         |ap AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM apsc) WHERE rk <= 5)
         |SELECT ex.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit,
         |  floor(CAST(count(ap.neighbor_id) AS DOUBLE) / count(*) * 10000) / 10000 AS recall
         |FROM ex LEFT JOIN ap ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id
         |GROUP BY ex.query_id""".stripMargin
    },

    // Embedding-space dedup clustering: e3's pair join + WITH RECURSIVE
    // closure, canonical = min id over the component (≡ minLabel).
    "d_semantic_dup" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, label, embedding AS e FROM embeddings),
         |sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | round(${cosSql("a.e", "b.e")}, 6) AS cos
         | FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id),
         |p AS (SELECT id_a, id_b FROM sc WHERE cos >= 0.3),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p UNION ALL SELECT id_b, id_a FROM p),
         |reach(origin, node) AS (
         |  SELECT src, dst FROM eg
         |  UNION
         |  SELECT r.origin, e2.dst FROM reach r JOIN eg e2 ON r.node = e2.src
         |)
         |SELECT origin AS vec_id, least(min(node), origin) AS canonical
         |FROM reach GROUP BY origin""".stripMargin,

    "e3_cosine_neardup" ->
      s"""WITH v AS (SELECT vec_id, label, embedding AS e FROM embeddings),
         |sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | round(${cosSql("a.e", "b.e")}, 6) AS cos
         | FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM sc WHERE cos >= 0.3""".stripMargin,

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

    // Composed quality pipeline: the t_lm_coverage CTEs (coverage per
    // doc), quantile_cont p20 threshold, and the d_substring_spans CTEs
    // (dup-doc set) stitched exactly as the Spark chain composes them.
    "d_pipeline_quality" ->
      s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
         |  FROM documents),
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
         |cov AS (SELECT d.doc_id,
         |  CASE WHEN coalesce(a.n_grams, 0) > 0
         |    THEN floor(CAST(a.n_known AS DOUBLE) / a.n_grams * 10000) / 10000
         |    ELSE 0.0 END AS coverage
         |  FROM documents d LEFT JOIN a USING (doc_id)),
         |th AS (SELECT quantile_cont(coverage, 0.2) AS threshold FROM cov),
         |w8 AS (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i, w FROM t),
         |g8 AS (SELECT doc_id,
         |  ${md5i("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]")} AS span_hash
         |  FROM w8),
         |f8 AS (SELECT span_hash FROM g8 GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2),
         |dup AS (SELECT DISTINCT g8.doc_id FROM g8 JOIN f8 ON g8.span_hash = f8.span_hash)
         |SELECT cov.doc_id, cov.coverage, cov.coverage >= th.threshold AS kept,
         |  dup.doc_id IS NOT NULL AS dup_doc,
         |  (cov.coverage >= th.threshold AND dup.doc_id IS NULL) AS final_keep
         |FROM cov CROSS JOIN th LEFT JOIN dup ON dup.doc_id = cov.doc_id""".stripMargin,

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

    "m1_media_meta" ->
      """SELECT doc_id AS id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |sha256(text) AS sha256 FROM documents""".stripMargin,

    "m2_frame_sample" ->
      """SELECT doc_id AS id, CAST(u.i AS BIGINT) AS frame_no,
        |CAST(ascii(substr(text, CAST(u.i * 64 + 1 AS INTEGER), 1)) AS BIGINT) AS frame_code
        |FROM documents, UNNEST(generate_series(0, (length(text) - 1) // 64)) AS u(i)""".stripMargin,

    // every encodeMp4 field is a pure function of the utf-8 byte length,
    // so the box walk's output is recomputable without parsing anything
    "m12_mp4_boxwalk" ->
      """SELECT doc_id AS id, 'isom' AS brand, CAST(1000 AS BIGINT) AS timescale,
        |  CAST(len AS BIGINT) AS duration,
        |  CAST(16 * (1 + len % 30) AS BIGINT) AS width,
        |  CAST(16 * (1 + (len // 7) % 30) AS BIGINT) AS height,
        |  CAST(len AS BIGINT) AS n_mdat
        |FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents)""".stripMargin,

    "m3_byte_histogram" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
        |c AS (SELECT doc_id, list_transform(generate_series(1, CAST(length(hx) // 2 AS INTEGER)),
        |  i -> ('0x' || substr(hx, CAST((i - 1) * 2 + 1 AS INTEGER), 2))::BIGINT) AS codes FROM h)
        |SELECT doc_id AS id,
        | CAST(len(list_filter(codes, c -> c >= 0 AND c < 64)) AS BIGINT) AS h0,
        | CAST(len(list_filter(codes, c -> c >= 64 AND c < 128)) AS BIGINT) AS h1,
        | CAST(len(list_filter(codes, c -> c >= 128 AND c < 192)) AS BIGINT) AS h2,
        | CAST(len(list_filter(codes, c -> c >= 192 AND c < 256)) AS BIGINT) AS h3
        |FROM c""".stripMargin,

    // the round-trip invariant straight from the text: byte p of the
    // payload lands in BMP channel p%3 (0=B,1=G,2=R); height =
    // ceil(len/48) with stride 48 (width 16), n_px counts padding.
    "m4_bmp_roundtrip" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |g AS (SELECT doc_id, text, len, unnest(generate_series(1, greatest(len, 1))) AS i FROM t),
        |c AS (SELECT doc_id, i - 1 AS p,
        |  CASE WHEN i <= len THEN unicode(substr(text, CAST(i AS INTEGER), 1)) ELSE 0 END AS code
        |  FROM g),
        |sums AS (SELECT doc_id,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 0 THEN code END), 0) AS BIGINT) AS sum_b,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 1 THEN code END), 0) AS BIGINT) AS sum_g,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 2 THEN code END), 0) AS BIGINT) AS sum_r
        |  FROM c GROUP BY doc_id),
        |dims AS (SELECT doc_id, greatest(1, CAST(ceil(len / 48.0) AS BIGINT)) AS h FROM t)
        |SELECT d.doc_id AS id, 16 AS width, CAST(d.h AS INTEGER) AS height,
        |  16 * d.h AS n_px, s.sum_b, s.sum_g, s.sum_r
        |FROM dims d JOIN sums s ON d.doc_id = s.doc_id""".stripMargin,

    // Nearest-neighbor ×½ of the 16-wide raster: out pixel (x, y) is in
    // pixel (2x, 2y), i.e. payload byte (2y)·48 + (2x)·3 + channel —
    // recomputed straight from the text.
    "m11_png_resize" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len,
        |  greatest(1, CAST(ceil(length(text) / 48.0) AS BIGINT)) AS h FROM documents),
        |d AS (SELECT doc_id, text, len, CAST(ceil(h / 2.0) AS BIGINT) AS oh FROM t),
        |px AS (SELECT doc_id, text, len, oh,
        |  unnest(generate_series(0, oh * 8 - 1)) AS q FROM d),
        |ch AS (SELECT doc_id, oh, text, len,
        |  (2 * (q // 8)) * 48 + (2 * (q % 8)) * 3 + cc.c AS p, cc.c
        |  FROM px CROSS JOIN (SELECT unnest([0, 1, 2]) AS c) cc),
        |v AS (SELECT doc_id, oh, c,
        |  CASE WHEN p < len THEN unicode(substr(text, CAST(p + 1 AS INTEGER), 1)) ELSE 0 END AS code
        |  FROM ch)
        |SELECT doc_id AS id, 8 AS width, CAST(oh AS INTEGER) AS height,
        |  8 * oh AS n_px,
        |  CAST(coalesce(sum(CASE WHEN c = 0 THEN code END), 0) AS BIGINT) AS sum_b,
        |  CAST(coalesce(sum(CASE WHEN c = 1 THEN code END), 0) AS BIGINT) AS sum_g,
        |  CAST(coalesce(sum(CASE WHEN c = 2 THEN code END), 0) AS BIGINT) AS sum_r
        |FROM v GROUP BY doc_id, oh""".stripMargin,

    // The PNG round trip decodes to the SAME raster as the BMP twin
    // (lossless compression, identical 16-wide BGR layout), so its
    // oracle is m4's verbatim: channel sums recomputed from the text.
    "m10_png_roundtrip" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |g AS (SELECT doc_id, text, len, unnest(generate_series(1, greatest(len, 1))) AS i FROM t),
        |c AS (SELECT doc_id, i - 1 AS p,
        |  CASE WHEN i <= len THEN unicode(substr(text, CAST(i AS INTEGER), 1)) ELSE 0 END AS code
        |  FROM g),
        |sums AS (SELECT doc_id,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 0 THEN code END), 0) AS BIGINT) AS sum_b,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 1 THEN code END), 0) AS BIGINT) AS sum_g,
        |  CAST(coalesce(sum(CASE WHEN p % 3 = 2 THEN code END), 0) AS BIGINT) AS sum_r
        |  FROM c GROUP BY doc_id),
        |dims AS (SELECT doc_id, greatest(1, CAST(ceil(len / 48.0) AS BIGINT)) AS h FROM t)
        |SELECT d.doc_id AS id, 16 AS width, CAST(d.h AS INTEGER) AS height,
        |  16 * d.h AS n_px, s.sum_b, s.sum_g, s.sum_r
        |FROM dims d JOIN sums s ON d.doc_id = s.doc_id""".stripMargin,

    // PCM16 energy: sample = (code-64)*256, so sum_sq = 65536 * Σ(code-64)².
    "m5_wav_roundtrip" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |g AS (SELECT doc_id, text, unnest(generate_series(1, len)) AS i FROM t),
        |c AS (SELECT doc_id, unicode(substr(text, CAST(i AS INTEGER), 1)) - 64 AS d FROM g)
        |SELECT t.doc_id AS id, 16000 AS sample_rate, 1 AS n_channels,
        |  CAST(t.len AS BIGINT) AS n_samples,
        |  CAST(coalesce(sum(CAST(c.d AS BIGINT) * c.d * 65536), 0) AS BIGINT) AS sum_sq
        |FROM t LEFT JOIN c ON t.doc_id = c.doc_id
        |GROUP BY t.doc_id, t.len""".stripMargin,

    "x1_connected_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
        |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |verts AS (SELECT DISTINCT src AS v FROM und),
        |reach(v, u) AS (
        |  SELECT v, v FROM verts
        |  UNION
        |  SELECT r.v, und.dst FROM reach r JOIN und ON r.u = und.src)
        |SELECT v AS id, min(u) AS component FROM reach GROUP BY v""".stripMargin,

    "a18_bulk_load_merge" ->
      """SELECT 'region' AS label, count(*) AS cnt FROM region
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'zone', count(*) FROM region""".stripMargin,

    "a18b_groovy_load" ->
      """SELECT 'region' AS label, count(*) AS cnt FROM region
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'edge:in', count(*) FROM nation""".stripMargin,

    "a19_bucketed_layout" ->
      """SELECT CAST(c_nationkey AS VARCHAR) AS nation_key,
        |count(*) AS n_customers FROM customer GROUP BY 1""".stripMargin,

    "sw7_abtest" -> {
      val p = "(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))"
      s"""WITH f AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events
         |  WHERE event_type IN ('view', 'purchase')),
         |e1 AS (SELECT user_id, min(us) AS t1 FROM f WHERE event_type = 'view' GROUP BY user_id),
         |pu AS (SELECT f.user_id,
         |  max(CASE WHEN event_type = 'purchase' AND us > t1 AND us <= t1 + 3600000000
         |      THEN 1 ELSE 0 END) AS conv
         |  FROM f JOIN e1 USING (user_id) GROUP BY f.user_id),
         |ar AS (SELECT ${md5i("CAST(user_id AS VARCHAR)")} % 2 AS arm, conv FROM pu),
         |ag AS (SELECT arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS k FROM ar GROUP BY arm),
         |a AS (SELECT n AS n_a, k AS conv_a FROM ag WHERE arm = 0),
         |b AS (SELECT n AS n_b, k AS conv_b FROM ag WHERE arm = 1)
         |SELECT n_a, conv_a, n_b, conv_b,
         |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
         |    CAST(floor((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         |      / sqrt($p * (1.0 - $p) * (1.0 / n_a + 1.0 / n_b)) * 1000000) AS BIGINT)
         |  ELSE NULL END AS z_micro
         |FROM a, b""".stripMargin
    },

    "sw6_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |b AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS cnt
        |  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(cnt) AS tot FROM b GROUP BY from_type)
        |SELECT from_type, to_type, cnt, CAST(cnt * 1000000 // tot AS BIGINT) AS p_micro
        |FROM b JOIN t USING (from_type)""".stripMargin,

    "sw5_retention" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id)
        |SELECT cohort, CAST(date_diff('day', cohort, day) AS INTEGER) AS offset,
        |  count(*) AS n_users
        |FROM d JOIN c USING (user_id) GROUP BY 1, 2""".stripMargin,

    "sw4_funnel" ->
      """WITH f AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |           WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM f WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT f.user_id, min(us) AS t2 FROM f JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 AND us <= t1 + 3600000000 GROUP BY f.user_id),
        |s3 AS (SELECT f.user_id, min(us) AS t3 FROM f JOIN s2 USING (user_id) JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 AND us <= t1 + 3600000000 GROUP BY f.user_id),
        |d AS (SELECT s1.user_id,
        |        CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS depth
        |      FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
        |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_users FROM d GROUP BY depth""".stripMargin,

    // the deduped stream must be exactly the batch table: replayed rows
    // were exact copies, so dedup-by-event_id restores the original set
    "sw11_stream_dedup" ->
      "SELECT event_id, user_id, event_type, ts, value FROM events",

    // the inner stream-stream interval join emits exactly the batch join
    "sw12_stream_attribution" ->
      """SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts, p.value
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""".stripMargin,

    // the left_outer form: every click emits; the sentinel batches on the
    // Spark side force full outer-row eviction, so plain LEFT JOIN is the
    // exact equivalent.
    "sw18_stream_left_attribution" ->
      """WITH c AS (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS purchase_ts, value FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_ts, p.purchase_ts, p.value
        |FROM c LEFT JOIN p ON p.user_id = c.user_id
        |  AND p.purchase_ts >= c.click_ts
        |  AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE""".stripMargin,

    // CMS linearity: the two-micro-batch sketch equals the batch sketch
    // (Kirsch–Mitzenmacher cells, mirrors the cd5 oracle's cell formula)
    "sw14_stream_countmin" ->
      s"""WITH hh0 AS (SELECT event_type AS k, ${md5i("event_type")} AS hh FROM events),
         |cells AS (SELECT k, r,
         |    (hh % 1073741824 + r * ((hh // 1073741824) | 1)) % 16 AS b
         |  FROM hh0 CROSS JOIN generate_series(0, 3) g(r)),
         |sk AS (SELECT r, b, count(*) AS c FROM cells GROUP BY r, b),
         |probe AS (SELECT DISTINCT k, r, b FROM cells),
         |est AS (SELECT k, min(c) AS est_count FROM probe JOIN sk USING (r, b) GROUP BY k),
         |ex AS (SELECT event_type AS k, count(*) AS exact_count FROM events GROUP BY 1)
         |SELECT k AS event_type, est_count, exact_count FROM est JOIN ex USING (k)""".stripMargin,

    // idempotent replay: the merged graph census equals batch DISTINCT
    "sw13_stream_graph_merge" ->
      """SELECT 'user' AS part, count(DISTINCT user_id) AS n FROM events
        |UNION ALL SELECT 'eventType', count(DISTINCT event_type) FROM events
        |UNION ALL SELECT 'in_edges', count(*) FROM
        |  (SELECT DISTINCT user_id, event_type FROM events)""".stripMargin,

    "sw1_tumbling_window" ->
      s"""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type,
        |count(*) AS cnt, CAST(sum(${centsSql("value")}) AS DOUBLE) / 100 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // CUSUM fold replayed recursively; the reference mean is the same
    // exact integer division on both engines.
    "sw21_cusum" ->
      """WITH RECURSIVE h AS (SELECT event_type,
        |  time_bucket(INTERVAL 1 HOUR, ts) AS ws, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, sum(cnt) * 1000 // count(*) AS ref FROM h GROUP BY 1),
        |idx AS (SELECT h.event_type, ws, cnt, ref,
        |  row_number() OVER (PARTITION BY h.event_type ORDER BY ws) AS i
        |  FROM h JOIN b ON b.event_type = h.event_type),
        |cu(event_type, i, ws, cnt, ref, s) AS (
        |  SELECT event_type, i, ws, cnt, ref,
        |    greatest(0, cnt * 1000 - ref - ref // 4) FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.event_type, idx.i, idx.ws, idx.cnt, idx.ref,
        |    greatest(0, cu.s + idx.cnt * 1000 - idx.ref - idx.ref // 4)
        |  FROM cu JOIN idx ON idx.event_type = cu.event_type AND idx.i = cu.i + 1)
        |SELECT event_type, ws, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(s AS BIGINT) AS cusum_milli, (s > 5 * ref) AS alarm FROM cu""".stripMargin,

    // The two-state fold replayed as a recursive CTE: (l, b) carried
    // per (event_type, i); sign-split // matches Spark's div exactly.
    "sw20_holt_linear" -> {
      def sdiv(x: String, d: Int) =
        s"(CASE WHEN ($x) >= 0 THEN ($x) // $d ELSE -((-($x)) // $d) END)"
      val resid = "idx.cnt * 1000 - hw.l - hw.b"
      s"""WITH RECURSIVE h AS (SELECT event_type,
         |  time_bucket(INTERVAL 1 HOUR, ts) AS ws, count(*) AS cnt
         |  FROM events GROUP BY 1, 2),
         |idx AS (SELECT event_type, ws, cnt,
         |  row_number() OVER (PARTITION BY event_type ORDER BY ws) AS i FROM h),
         |hw(event_type, i, ws, cnt, l, b) AS (
         |  SELECT event_type, i, ws, cnt, cnt * 1000, CAST(0 AS BIGINT) FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT idx.event_type, idx.i, idx.ws, idx.cnt,
         |    hw.l + hw.b + ${sdiv(resid, 4)},
         |    hw.b + ${sdiv(sdiv(resid, 4), 8)}
         |  FROM hw JOIN idx ON idx.event_type = hw.event_type AND idx.i = hw.i + 1)
         |SELECT event_type, ws, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(l AS BIGINT) AS level_milli, CAST(b AS BIGINT) AS trend_milli,
         |  CAST(l + b AS BIGINT) AS forecast_milli FROM hw""".stripMargin
    },

    "sw19_seasonal_profile" ->
      """WITH hourly AS (SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS ws,
        |  count(*) AS cnt FROM events GROUP BY 1, 2),
        |h AS (SELECT event_type, ws, cnt,
        |  CAST(extract(hour FROM ws) AS BIGINT) AS hod FROM hourly),
        |b AS (SELECT event_type, hod, sum(cnt) AS slot_total,
        |  count(*) AS slot_n FROM h GROUP BY 1, 2)
        |SELECT h.event_type, h.ws, h.hod, CAST(h.cnt AS BIGINT) AS cnt,
        |  CAST(h.cnt * b.slot_n * 1000000 // b.slot_total AS BIGINT) AS ratio_micro
        |FROM h JOIN b ON h.event_type = b.event_type AND h.hod = b.hod
        |WHERE h.cnt * b.slot_n * 1000000 // b.slot_total >= 2000000""".stripMargin,

    "sw2_sliding_window" ->
      """SELECT ws, event_type, count(*) AS cnt FROM (
        |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, event_type FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR, event_type FROM events)
        |GROUP BY ws, event_type""".stripMargin,

    "sw16_stream_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment AS segment
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id""".stripMargin,

    // The batch gaps-and-islands twin over ms-truncated timestamps —
    // the sentinel batches guarantee the stream emitted EVERY session.
    "sw15_stream_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, date_trunc('milliseconds', ts) AS ts FROM events),
        |o AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "sw3_session_window" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM o)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "z1_asof_join" ->
      """SELECT l.user_id AS user_id, l.event_id AS event_id, l.ts AS click_ts,
        |  r.ts AS purchase_ts, r.value AS purchase_value
        |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN
        |  (SELECT user_id, ts, max(value) AS value FROM events
        |   WHERE event_type = 'purchase' GROUP BY user_id, ts) r
        |  ON l.user_id = r.user_id AND r.ts <= l.ts""".stripMargin,

    "z3_interval_overlap" ->
      """WITH a AS (SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |  epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day2,
        |  epoch_us(min(ts)) AS s2, epoch_us(max(ts)) AS e2 FROM events GROUP BY 1, 2)
        |SELECT a.user_id, a.day, b.event_type,
        |  least(a.e, b.e2) - greatest(a.s, b.s2) AS overlap_micros
        |FROM a JOIN b ON a.s <= b.e2 AND b.s2 <= a.e""".stripMargin,

    "z2_range_join" ->
      s"""WITH b(band_id, lo, hi) AS (VALUES
        |  (0, 0.0, 100.0), (1, 100.0, 200.0), (2, 200.0, 300.0),
        |  (3, 300.0, 400.0), (4, 400.0, 1e9))
        |SELECT CAST(band_id AS BIGINT) AS band_id, count(*) AS cnt,
        |  CAST(sum(${centsSql("value")}) AS DOUBLE) / 100 AS sum_value
        |FROM events JOIN b ON value >= lo AND value < hi
        |GROUP BY band_id""".stripMargin,

    "f5_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |round(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |round(quantile_cont(l_quantity, 0.99), 4) AS p99,
        |count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "x3_triangle_count" ->
      """WITH raw AS (
        |  SELECT 3*72057594037927936 + c_custkey AS src, 2*72057594037927936 + c_nationkey AS dst FROM customer
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation
        |  UNION ALL SELECT 3*72057594037927936 + c_custkey, 1*72057594037927936 + n_regionkey
        |    FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw WHERE src <> dst),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
        |SELECT v AS id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |GROUP BY v""".stripMargin,

    // The harmonic oracle's min-hop walk read at max(d) per origin.
    "x25_eccentricity" ->
      """WITH RECURSIVE e AS (
        |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
        |und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |verts AS (SELECT DISTINCT src AS v FROM und),
        |walk(v, u, hop) AS (
        |  SELECT v, v, 0 FROM verts
        |  UNION
        |  SELECT w.v, und.dst, w.hop + 1 FROM walk w JOIN und ON w.u = und.src
        |  WHERE w.hop < 5),
        |md AS (SELECT v, u, min(hop) AS d FROM walk GROUP BY v, u)
        |SELECT verts.v AS id,
        |  CAST(coalesce(max(CASE WHEN md.d > 0 THEN md.d END), 0) AS BIGINT) AS ecc
        |FROM verts LEFT JOIN md ON md.v = verts.v GROUP BY verts.v""".stripMargin,

    // Newman's r over the symmetrized supplier–nation–region graph: the
    // same exact-integer sufficient statistics, one IEEE divide at the end.
    "x23_assortativity" ->
      """WITH raw AS (
        |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
        |u AS (SELECT DISTINCT src, dst FROM (
        |  SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw) WHERE src <> dst),
        |deg AS (SELECT src AS v, count(*) AS deg FROM u GROUP BY src),
        |p AS (SELECT dx.deg AS dx, dy.deg AS dy
        |  FROM u JOIN deg dx ON u.src = dx.v JOIN deg dy ON u.dst = dy.v),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS m_edges, CAST(sum(dx) AS BIGINT) AS sum_x,
        |  CAST(sum(dx * dy) AS BIGINT) AS sum_xy, CAST(sum(dx * dx) AS BIGINT) AS sum_xx FROM p)
        |SELECT m_edges, sum_x, sum_xy, sum_xx,
        |  CASE WHEN CAST(m_edges AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x > 0
        |    THEN CAST(floor(1000000.0
        |      * (CAST(m_edges AS DOUBLE) * sum_xy - CAST(sum_x AS DOUBLE) * sum_x)
        |      / (CAST(m_edges AS DOUBLE) * sum_xx - CAST(sum_x AS DOUBLE) * sum_x)) AS BIGINT)
        |  END AS r_micro
        |FROM s""".stripMargin,

    // Per-vertex triangle credit over the x3 graph joined with degrees;
    // 2e6·T/(d·(d−1)) in integer floor units, deg ≥ 2 only.
    "x24_clustering_coeff" ->
      """WITH raw AS (
        |  SELECT 3*72057594037927936 + c_custkey AS src, 2*72057594037927936 + c_nationkey AS dst FROM customer
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation
        |  UNION ALL SELECT 3*72057594037927936 + c_custkey, 1*72057594037927936 + n_regionkey
        |    FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM raw WHERE src <> dst),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |tv AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        |  GROUP BY v),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        |  SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v)
        |SELECT deg.v AS id, deg.deg, coalesce(tv.n_tri, 0) AS n_tri,
        |  CAST(2000000 * coalesce(tv.n_tri, 0) // (deg.deg * (deg.deg - 1)) AS BIGINT) AS lcc_micro
        |FROM deg LEFT JOIN tv ON deg.v = tv.v
        |WHERE deg.deg >= 2""".stripMargin,

    "x4_pagerank_fixed" -> pagerankFixedSql(extraCols = ""),

    // x2's oracle: the identical integer recurrence, plus the constant
    // verdict the self-evaluating gate must reproduce (the Spark side
    // flips graphx_ok only if GraphX's float ranks drift off the
    // normalized fixpoint — the cd7 carry-exact-in-row pattern).
    "x2_pagerank" -> pagerankFixedSql(extraCols = ", true AS graphx_ok"),

    // R^8 as three set-compose squarings — the same exponentiation the
    // Spark side runs, spelled in SQL.
    "a21_hop_power" ->
      """WITH e0 AS (
        |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation),
        |u AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |r2 AS (SELECT DISTINCT a.src, b.dst FROM u a JOIN u b ON a.dst = b.src),
        |r4 AS (SELECT DISTINCT a.src, b.dst FROM r2 a JOIN r2 b ON a.dst = b.src),
        |r8 AS (SELECT DISTINCT a.src, b.dst FROM r4 a JOIN r4 b ON a.dst = b.src)
        |SELECT src, dst FROM r8""".stripMargin,

    // Bellman-Ford unrolled: the graph is 2 levels deep, so two relax
    // rounds reach the fixpoint; a third would be identity.
    "x8_weighted_sssp" ->
      """WITH e AS (
        |  SELECT 1*72057594037927936 + n_regionkey AS src,
        |         2*72057594037927936 + n_nationkey AS dst,
        |         CAST(n_nationkey % 3 + 1 AS BIGINT) AS w FROM nation
        |  UNION ALL
        |  SELECT 2*72057594037927936 + s_nationkey,
        |         4*72057594037927936 + s_suppkey,
        |         CAST(s_suppkey % 5 + 1 AS BIGINT) FROM supplier),
        |d0 AS (SELECT 1*72057594037927936 + r_regionkey AS id, CAST(0 AS BIGINT) AS dist FROM region),
        |r1 AS (SELECT e.dst AS id, min(d0.dist + e.w) AS d FROM e JOIN d0 ON e.src = d0.id GROUP BY e.dst),
        |d1 AS (SELECT coalesce(d0.id, r1.id) AS id,
        |  least(coalesce(d0.dist, 9223372036854775807), coalesce(r1.d, 9223372036854775807)) AS dist
        |  FROM d0 FULL OUTER JOIN r1 ON d0.id = r1.id),
        |r2 AS (SELECT e.dst AS id, min(d1.dist + e.w) AS d FROM e JOIN d1 ON e.src = d1.id GROUP BY e.dst),
        |d2 AS (SELECT coalesce(d1.id, r2.id) AS id,
        |  least(coalesce(d1.dist, 9223372036854775807), coalesce(r2.d, 9223372036854775807)) AS dist
        |  FROM d1 FULL OUTER JOIN r2 ON d1.id = r2.id)
        |SELECT id, dist FROM d2""".stripMargin,

    // sequential Prim under the same (w, u, v) total order — a DIFFERENT
    // algorithm landing on the same unique forest, so the hash match
    // proves MST-ness, not replay-consistency. Single-row recursion
    // carrying the visited list; the graph is connected by construction
    // (nation ring bridges all regions, suppliers hang off nations).
    "x29_boruvka_mst" -> {
      val B = "72057594037927936"
      s"""WITH RECURSIVE e0 AS (
         |  SELECT 2*$B + n_nationkey AS a, 1*$B + n_regionkey AS b FROM nation
         |  UNION ALL SELECT 2*$B + n_nationkey, 2*$B + ((n_nationkey + 1) % 25) FROM nation
         |  UNION ALL SELECT 4*$B + s_suppkey, 2*$B + s_nationkey FROM supplier
         |  UNION ALL SELECT 4*$B + s_suppkey,
         |    4*$B + ((s_suppkey + 1) % (SELECT count(*) FROM supplier)) FROM supplier),
         |e2 AS (SELECT u, v, ${md5i("CAST(u AS VARCHAR) || '_' || CAST(v AS VARCHAR)")} % 1000000 AS w
         |  FROM (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM e0 WHERE a <> b)),
         |und AS (SELECT u AS fa, v AS fb, u, v, w FROM e2
         |  UNION ALL SELECT v, u, u, v, w FROM e2),
         |st AS (
         |  SELECT [(SELECT min(u) FROM e2)] AS vis,
         |    CAST([] AS BIGINT[]) AS us, CAST([] AS BIGINT[]) AS vs, CAST([] AS BIGINT[]) AS ws
         |  UNION ALL
         |  SELECT list_append(vis, pb), list_append(us, pu), list_append(vs, pv), list_append(ws, pw)
         |  FROM (
         |    SELECT st.vis AS vis, st.us AS us, st.vs AS vs, st.ws AS ws,
         |      und.fb AS pb, und.u AS pu, und.v AS pv, und.w AS pw,
         |      row_number() OVER (ORDER BY und.w, und.u, und.v) AS rn
         |    FROM st JOIN und ON list_contains(st.vis, und.fa)
         |      AND NOT list_contains(st.vis, und.fb)
         |  ) WHERE rn = 1),
         |fin AS (SELECT us, vs, ws FROM st ORDER BY len(vis) DESC LIMIT 1)
         |SELECT CAST(unnest(us) AS BIGINT) AS u, CAST(unnest(vs) AS BIGINT) AS v,
         |  CAST(unnest(ws) AS BIGINT) AS w FROM fin""".stripMargin
    },

    "x7_ppr_regions" -> {
      // x4's unrolled integer recurrence, reset mass pinned to the seeds.
      val iters = (1 to 3).map { i =>
        s"""p$i AS (
           |  SELECT v.id, v.is_seed * 150000 + (17 * coalesce(c.m, 0)) // 20 AS rank_micro
           |  FROM v LEFT JOIN (
           |    SELECT e.dst AS id, sum(p${i - 1}.rank_micro // d.outdeg) AS m
           |    FROM e JOIN p${i - 1} ON e.src = p${i - 1}.id JOIN d ON d.src = e.src
           |    GROUP BY e.dst) c ON v.id = c.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT DISTINCT src, dst FROM (
         |  SELECT 4*72057594037927936 + s_suppkey AS src, 2*72057594037927936 + s_nationkey AS dst FROM supplier
         |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation)),
         |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |sd AS (SELECT 1*72057594037927936 + r_regionkey AS id FROM region),
         |v AS (SELECT id, CAST(CASE WHEN id IN (SELECT id FROM sd) THEN 1 ELSE 0 END AS BIGINT) AS is_seed
         |  FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)),
         |p0 AS (SELECT id, is_seed * 1000000 AS rank_micro FROM v),
         |$iters
         |SELECT id, CAST(rank_micro AS BIGINT) AS rank_micro FROM p3""".stripMargin
    },

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

    "d_hash_sample" ->
      s"""SELECT doc_id, bucket FROM (
         |  SELECT doc_id, ${md5i("CAST(doc_id AS VARCHAR)")} % 100 AS bucket FROM documents)
         |WHERE bucket < 10""".stripMargin,

    // distinct shingles per doc, min-doc_id owner per shingle hash, the
    // owner==self count — all exact integers.
    "d_novelty" ->
      s"""$SHINGLE_CTES,
         |u AS (SELECT DISTINCT doc_id, ${md5i("g")} AS g
         |  FROM (SELECT doc_id, unnest(sh) AS g FROM s)),
         |own AS (SELECT g, min(doc_id) AS owner FROM u GROUP BY g)
         |SELECT u.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN own.owner = u.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN own.owner = u.doc_id THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS novelty_ppm
         |FROM u JOIN own ON own.g = u.g GROUP BY u.doc_id""".stripMargin,

    // mirrors Dedup.incrementalDedup over the 20/80 hash slice: delta
    // band-buckets probe base band-buckets, collisions verified by exact
    // floored n-gram Jaccard, verdict per delta doc.
    "d_incremental_dedup" -> {
      val hs = (1 to 8).map(i =>
        s"list_min(list_transform(sh, x -> ${md5i(s"x || '|$i'")})) AS h$i").mkString(", ")
      val bands = (0 until 4).map { b =>
        val (l, r) = (s"h${2 * b + 1}", s"h${2 * b + 2}")
        s"SELECT doc_id, slice, $b AS band, ${md5i(s"CAST($l AS VARCHAR) || '_' || CAST($r AS VARCHAR)")} AS bucket FROM sig"
      }.mkString("\nUNION ALL ")
      s"""$SHINGLE_CTES,
         |sp AS (SELECT doc_id, sh, ${md5i("CAST(doc_id AS VARCHAR)")} % 100 AS slice FROM s),
         |sig AS (SELECT doc_id, slice, list_distinct(sh) AS shd, $hs FROM sp),
         |b AS ($bands),
         |cand AS (SELECT DISTINCT d.doc_id AS delta_id, e.doc_id AS base_id
         |  FROM b d JOIN b e ON d.band = e.band AND d.bucket = e.bucket
         |  WHERE d.slice < 20 AND e.slice >= 20),
         |ver AS (SELECT delta_id, base_id,
         |    floor(CAST(len(list_intersect(sd.shd, sb.shd)) AS DOUBLE)
         |      / len(list_distinct(sd.shd || sb.shd)) * 10000) / 10000 AS j
         |  FROM cand
         |  JOIN sig sd ON sd.doc_id = cand.delta_id
         |  JOIN sig sb ON sb.doc_id = cand.base_id),
         |dup AS (SELECT delta_id, min(base_id) AS dup_of, max(j) AS max_jaccard
         |  FROM ver WHERE j >= 0.5 GROUP BY delta_id)
         |SELECT d.doc_id AS doc_id, dup.dup_of, dup.max_jaccard,
         |  dup.dup_of IS NULL AS keep
         |FROM (SELECT doc_id FROM sp WHERE slice < 20) d
         |LEFT JOIN dup ON d.doc_id = dup.delta_id""".stripMargin
    },

    "d_train_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, ${md5i("CAST(doc_id AS VARCHAR)")} % 100 AS b FROM documents)""".stripMargin,

    "x5_degree_histogram" ->
      """WITH verts AS (
        |  SELECT 1*72057594037927936 + r_regionkey AS id FROM region
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey FROM nation
        |  UNION ALL SELECT 3*72057594037927936 + c_custkey FROM customer
        |  UNION ALL SELECT 4*72057594037927936 + s_suppkey FROM supplier
        |  UNION ALL SELECT 5*72057594037927936 + p_partkey FROM part
        |  UNION ALL SELECT 6*72057594037927936 + o_orderkey FROM orders
        |  UNION ALL SELECT DISTINCT 7*72057594037927936 + l_orderkey*10 + l_linenumber FROM lineitem),
        |e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT 3*72057594037927936 + c_custkey AS src, 2*72057594037927936 + c_nationkey AS dst FROM customer
        |  UNION ALL SELECT 4*72057594037927936 + s_suppkey, 2*72057594037927936 + s_nationkey FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation
        |  UNION ALL SELECT 6*72057594037927936 + o_orderkey, 3*72057594037927936 + o_custkey FROM orders
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 6*72057594037927936 + l_orderkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 5*72057594037927936 + l_partkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 4*72057594037927936 + l_suppkey FROM lineitem)),
        |d AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)
        |SELECT coalesce(d.outdeg, 0) AS outdeg, count(*) AS n_vertices
        |FROM verts v LEFT JOIN d ON v.id = d.src GROUP BY 1""".stripMargin,

    "e6_matryoshka" ->
      """WITH m AS (SELECT vec_id,
        |  list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS p FROM embeddings),
        |n AS (SELECT vec_id, p,
        |  sqrt(list_reduce(list_transform(p, x -> x * x), (a, b) -> a + b)) AS nrm FROM m)
        |SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
        |  CASE WHEN nrm = 0 THEN 0.0 ELSE floor(p[i] / nrm * 1000000) / 1000000 END AS val
        |FROM n, generate_series(1, 16) AS g(i)""".stripMargin,

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

    // End-to-end pipeline composition: Gopher quality gate → exact-dup
    // canonicalization (min id per md5(text)) → 90/5/5 split → per-split
    // doc and token totals. Every stage is an already-oracled operator;
    // this gate verifies they COMPOSE (the switch-over story: a user
    // chains these, not one at a time).
    "d_pipeline_e2e" ->
      s"""$GOPHER_CTES,
         |pass AS (SELECT doc_id FROM m WHERE $GOPHER_PASS),
         |kept AS (SELECT d.doc_id, d.text FROM documents d JOIN pass USING (doc_id)),
         |canon AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
         |dd AS (SELECT kept.doc_id, kept.text FROM kept JOIN canon USING (doc_id)),
         |sp AS (SELECT doc_id, text,
         |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id, text, ${md5i("CAST(doc_id AS VARCHAR)")} % 100 AS b FROM dd))
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens
         |FROM sp GROUP BY split""".stripMargin,

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

    // Overflow audit: same md5 shard assignment, undersized on purpose.
    "d_shard_overflow" ->
      s"""WITH h AS (SELECT ${md5i("CAST(doc_id AS VARCHAR)")} % 2 AS shard FROM documents)
         |SELECT shard, CAST(count(*) AS BIGINT) AS sz FROM h
         |GROUP BY 1 HAVING count(*) > 200""".stripMargin,

    // Deterministic shuffle-shard: md5 total order within md5-assigned
    // shards; h is non-negative (60-bit) so % == pmod.
    "d_shuffle_shard" ->
      s"""WITH h AS (SELECT doc_id, ${md5i("CAST(doc_id AS VARCHAR)")} AS h FROM documents)
         |SELECT doc_id, h % 8 AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS BIGINT) - 1 AS pos
         |FROM h""".stripMargin,

    // Auto-sized twin: the shard count is greatest(minShards,
    // ceil(n/maxShardRows)) computed with the SAME integer arithmetic as
    // Spark's (n + maxShardRows - 1) / maxShardRows — no IEEE ceil.
    "d_shuffle_shard_auto" ->
      s"""WITH n AS (SELECT greatest(2, (count(*) + 39) // 40) AS k FROM documents),
         |h AS (SELECT doc_id, ${md5i("CAST(doc_id AS VARCHAR)")} AS h FROM documents)
         |SELECT doc_id, h % k AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % k ORDER BY h, doc_id) AS BIGINT) - 1 AS pos
         |FROM h, n""".stripMargin,

    // Mixture epochs: rate quantized to basis points as floor(x + 0.5) —
    // bare floor of the IEEE product puts 0.3 at 2999 bp in Spark vs
    // 3000 in DuckDB's decimal literals, and round() tie modes differ
    // across engines; floor(x+0.5) is identical IEEE arithmetic in both.
    // The CAST AS DOUBLE forces DuckDB off its DECIMAL literal onto the
    // same IEEE product Spark computes.
    "d_mixture" ->
      s"""WITH d AS (SELECT doc_id, source,
         |  CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25 ELSE 1.0 END AS rate
         |  FROM documents),
         |f AS (SELECT doc_id, source,
         |  CAST(CAST(floor(CAST(rate AS DOUBLE) * 10000 + 0.5) AS BIGINT) // 10000 AS INT) AS efull,
         |  CAST(floor(CAST(rate AS DOUBLE) * 10000 + 0.5) AS BIGINT) % 10000 AS fbp FROM d),
         |fe AS (SELECT doc_id, source, CAST(unnest(generate_series(0, efull - 1)) AS INT) AS epoch
         |  FROM f WHERE efull >= 1),
         |ex AS (SELECT doc_id, source, efull AS epoch FROM f
         |  WHERE ${md5i("CAST(doc_id AS VARCHAR) || '#' || CAST(efull AS VARCHAR)")} % 10000 < fbp)
         |SELECT doc_id, source, epoch FROM fe
         |UNION ALL SELECT doc_id, source, epoch FROM ex""".stripMargin,

    "d_stratified_head" ->
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY ${md5i("CAST(doc_id AS VARCHAR)")}, doc_id) AS r
         |  FROM documents) WHERE r <= 5""".stripMargin,

    // Temperature weights: micro-unit-quantized sqrt BEFORE the integer
    // normalization sum (order-independent), then one IEEE division —
    // sqrt is correctly rounded per IEEE 754 in both engines (pow isn't,
    // which is why τ is pinned to 1/2).
    "d_temperature_mix" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
        |q AS (SELECT source, n_docs,
        |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS qu FROM c),
        |t AS (SELECT CAST(sum(qu) AS DOUBLE) AS tot FROM q)
        |SELECT source, n_docs,
        |  floor(CAST(qu AS DOUBLE) / tot * 1000000) / 1000000 AS weight
        |FROM q CROSS JOIN t""".stripMargin,

    // Bloom probe: identical md5-seeded bit positions on both engines;
    // bloom_hit = all 3 positions set, exact_hit = the equi-join truth.
    "d_bloom_decontaminate" ->
      s"""WITH bench AS (SELECT DISTINCT text FROM documents WHERE doc_id % 25 = 0),
         |seeds AS (SELECT unnest(generate_series(0, 2)) AS i),
         |bits AS (SELECT DISTINCT ${md5i("text || '|' || CAST(i AS VARCHAR)")} % 1024 AS bit
         |  FROM bench CROSS JOIN seeds),
         |p AS (SELECT doc_id, text,
         |  ${md5i("text || '|0'")} % 1024 AS p0,
         |  ${md5i("text || '|1'")} % 1024 AS p1,
         |  ${md5i("text || '|2'")} % 1024 AS p2 FROM documents)
         |SELECT doc_id,
         |  (p0 IN (SELECT bit FROM bits) AND p1 IN (SELECT bit FROM bits)
         |    AND p2 IN (SELECT bit FROM bits)) AS bloom_hit,
         |  (text IN (SELECT text FROM bench)) AS exact_hit
         |FROM p""".stripMargin,

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

    // MRL funnel: coarse rank on the 8-dim prefix slice (rounded 6dp,
    // ties by neighbor_id), full-dim rescore of the top-20 survivors.
    "e11_mrl_funnel" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
         |q AS (SELECT vec_id, e FROM v WHERE vec_id < 10),
         |co AS (SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id, q.e AS qe, v.e AS ne,
         | round(${cosSql("q.e[1:8]", "v.e[1:8]")}, 6) AS ccos
         | FROM q JOIN v ON v.vec_id <> q.vec_id),
         |sv AS (SELECT query_id, neighbor_id, qe, ne FROM (
         |  SELECT query_id, neighbor_id, qe, ne,
         |    row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, neighbor_id) AS cr
         |  FROM co) WHERE cr <= 20),
         |sc AS (SELECT query_id, neighbor_id, round(${cosSql("qe", "ne")}, 6) AS cos FROM sv)
         |SELECT query_id, neighbor_id, cos,
         | CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |FROM sc QUALIFY rank <= 5""".stripMargin,

    "d_contamination" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |sh AS (SELECT doc_id, list_distinct(list_transform(
         |  list_transform(generate_series(1, greatest(len(w) - 2, 0)), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
         |  x -> ${md5i("x")})) AS hs FROM w),
         |e AS (SELECT doc_id, unnest(hs) AS h FROM sh),
         |hot AS (SELECT h FROM e GROUP BY h HAVING count(*) > 8192),
         |e2 AS (SELECT e.doc_id, e.h FROM e ANTI JOIN hot ON e.h = hot.h),
         |b AS (SELECT doc_id, h FROM e2 WHERE ${md5i("CAST(doc_id AS VARCHAR)")} % 100 < 10),
         |tr AS (SELECT doc_id, h FROM e2 WHERE ${md5i("CAST(doc_id AS VARCHAR)")} % 100 >= 10)
         |SELECT tr.doc_id AS train_id, b.doc_id AS bench_id, count(*) AS n_shared
         |FROM tr JOIN b ON tr.h = b.h
         |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

    // Substring-duplication spans: 8-token windows, 1-based starts, md5
    // span hashes; df = distinct docs per hash, flagged at df >= 2.
    "d_substring_spans" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |s AS (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i, w FROM w),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
         |  ${md5i("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]")} AS span_hash
         |  FROM s),
         |f AS (SELECT span_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM g GROUP BY span_hash)
         |SELECT g.doc_id, g.start, g.span_hash, f.df
         |FROM g JOIN f ON g.span_hash = f.span_hash WHERE f.df >= 2""".stripMargin,

    // Same window CTEs; probe-side distinct-doc counts from the held-out
    // split, train-side windows joined against them.
    "d_cross_spans" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |s AS (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i, w FROM w),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
         |  ${md5i("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]")} AS span_hash
         |  FROM s),
         |p AS (SELECT span_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_probe_docs
         |  FROM g WHERE doc_id % 10 = 0 GROUP BY span_hash)
         |SELECT g.doc_id, g.start, g.span_hash, p.n_probe_docs
         |FROM g JOIN p ON g.span_hash = p.span_hash
         |WHERE g.doc_id % 10 <> 0""".stripMargin,

    // Interval union of the flagged spans: same window CTEs, then
    // gaps-and-islands (break where the start gap exceeds k=8).
    "d_span_intervals" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |s AS (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i, w FROM w),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
         |  ${md5i("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]")} AS span_hash
         |  FROM s),
         |f AS (SELECT span_hash FROM g GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2),
         |fl AS (SELECT g.doc_id, g.start FROM g JOIN f ON g.span_hash = f.span_hash),
         |br AS (SELECT doc_id, start,
         |  CASE WHEN lag(start) OVER (PARTITION BY doc_id ORDER BY start) IS NULL
         |    OR start - lag(start) OVER (PARTITION BY doc_id ORDER BY start) > 8
         |    THEN 1 ELSE 0 END AS brk FROM fl),
         |isl AS (SELECT doc_id, start,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY start) AS island FROM br)
         |SELECT doc_id, CAST(min(start) AS BIGINT) AS span_start,
         |  CAST(max(start) + 7 AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_windows
         |FROM isl GROUP BY doc_id, island""".stripMargin,

    // The d_cross_spans probe join, then the island/cut/rebuild CTEs of
    // d_apply_cuts over the train split only — the chain stitched exactly
    // as the Spark composition runs it.
    "d_decontaminate" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |s AS (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i, w FROM w),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
         |  ${md5i("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]")} AS span_hash
         |  FROM s),
         |p AS (SELECT DISTINCT span_hash FROM g WHERE doc_id % 10 = 0),
         |fl AS (SELECT g.doc_id, g.start FROM g JOIN p ON g.span_hash = p.span_hash
         |  WHERE g.doc_id % 10 <> 0),
         |br AS (SELECT doc_id, start,
         |  CASE WHEN lag(start) OVER (PARTITION BY doc_id ORDER BY start) IS NULL
         |    OR start - lag(start) OVER (PARTITION BY doc_id ORDER BY start) > 8
         |    THEN 1 ELSE 0 END AS brk FROM fl),
         |isl AS (SELECT doc_id, start,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY start) AS island FROM br),
         |iv AS (SELECT doc_id, min(start) AS s, max(start) + 7 AS e
         |  FROM isl GROUP BY doc_id, island),
         |cuts AS (SELECT doc_id,
         |  flatten(list(generate_series(s, e))) AS cut FROM iv GROUP BY doc_id)
         |SELECT w.doc_id,
         |  coalesce(array_to_string(list_filter(w.w,
         |    (x, i) -> NOT list_contains(coalesce(cuts.cut, []), i)), ' '), '') AS clean_text,
         |  CAST(len(w.w) - len(list_filter(w.w,
         |    (x, i) -> NOT list_contains(coalesce(cuts.cut, []), i))) AS BIGINT) AS n_removed
         |FROM w LEFT JOIN cuts ON w.doc_id = cuts.doc_id
         |WHERE w.doc_id % 10 <> 0""".stripMargin,

    // d_span_intervals' island CTEs, then per-doc cut positions flattened
    // and the token list filtered by 1-based index (DuckDB index lambda),
    // re-joined with single spaces exactly as the Spark side does.
    "d_apply_cuts" ->
      s"""WITH w AS (SELECT doc_id,
         |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
         |s AS (SELECT doc_id, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS i, w FROM w),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS start,
         |  ${md5i("w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]")} AS span_hash
         |  FROM s),
         |f AS (SELECT span_hash FROM g GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2),
         |fl AS (SELECT g.doc_id, g.start FROM g JOIN f ON g.span_hash = f.span_hash),
         |br AS (SELECT doc_id, start,
         |  CASE WHEN lag(start) OVER (PARTITION BY doc_id ORDER BY start) IS NULL
         |    OR start - lag(start) OVER (PARTITION BY doc_id ORDER BY start) > 8
         |    THEN 1 ELSE 0 END AS brk FROM fl),
         |isl AS (SELECT doc_id, start,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY start) AS island FROM br),
         |iv AS (SELECT doc_id, min(start) AS s, max(start) + 7 AS e
         |  FROM isl GROUP BY doc_id, island),
         |cuts AS (SELECT doc_id,
         |  flatten(list(generate_series(s, e))) AS cut FROM iv GROUP BY doc_id)
         |SELECT w.doc_id,
         |  coalesce(array_to_string(list_filter(w.w,
         |    (x, i) -> NOT list_contains(coalesce(cuts.cut, []), i)), ' '), '') AS clean_text,
         |  CAST(len(w.w) - len(list_filter(w.w,
         |    (x, i) -> NOT list_contains(coalesce(cuts.cut, []), i))) AS BIGINT) AS n_removed
         |FROM w LEFT JOIN cuts ON w.doc_id = cuts.doc_id""".stripMargin,

    "x6_bfs_depth" ->
      """WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM (
        |  SELECT 3*72057594037927936 + c_custkey AS src, 2*72057594037927936 + c_nationkey AS dst FROM customer
        |  UNION ALL SELECT 4*72057594037927936 + s_suppkey, 2*72057594037927936 + s_nationkey FROM supplier
        |  UNION ALL SELECT 2*72057594037927936 + n_nationkey, 1*72057594037927936 + n_regionkey FROM nation
        |  UNION ALL SELECT 6*72057594037927936 + o_orderkey, 3*72057594037927936 + o_custkey FROM orders
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 6*72057594037927936 + l_orderkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 5*72057594037927936 + l_partkey FROM lineitem
        |  UNION ALL SELECT 7*72057594037927936 + l_orderkey*10 + l_linenumber, 4*72057594037927936 + l_suppkey FROM lineitem)),
        |reach(id, depth) AS (
        |  SELECT DISTINCT 7*72057594037927936 + l_orderkey*10 + l_linenumber, CAST(0 AS BIGINT) FROM lineitem
        |  UNION
        |  SELECT e.dst, r.depth + 1 FROM reach r JOIN e ON e.src = r.id WHERE r.depth < 64
        |)
        |SELECT id, min(depth) AS depth FROM reach GROUP BY id""".stripMargin,

    "x26_closeness" ->
      """WITH RECURSIVE e AS (
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
        |agg AS (SELECT v, count(*) AS reach, sum(d) AS dist_sum FROM md WHERE d > 0 GROUP BY v),
        |n1 AS (SELECT count(*) - 1 AS nm1 FROM verts)
        |SELECT verts.v AS id,
        |  CAST(coalesce(agg.reach, 0) AS BIGINT) AS reach,
        |  CAST(coalesce(agg.dist_sum, 0) AS BIGINT) AS dist_sum,
        |  CAST(CASE WHEN coalesce(agg.dist_sum, 0) > 0 AND n1.nm1 > 0
        |    THEN agg.reach * agg.reach * 1000000 // (agg.dist_sum * n1.nm1)
        |    ELSE 0 END AS BIGINT) AS closeness_micro
        |FROM verts LEFT JOIN agg ON agg.v = verts.v CROSS JOIN n1""".stripMargin,

    "dq3_profile" -> {
      def prof(c: String) =
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT CAST(floor($c * 100 + 0.5) AS BIGINT)) AS BIGINT) AS n_distinct,
           |  CAST(min(CAST(floor($c * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
           |  CAST(max(CAST(floor($c * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents,
           |  CAST(sum(CAST(floor($c * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(prof).mkString("\nUNION ALL\n")
    },

    "dq5_correlation" ->
      """WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y FROM lineitem),
        |a AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |  sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM b)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
        |  CAST(n * syy - sy * sy AS BIGINT) AS vary_num,
        |  CAST(CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN 0
        |    ELSE floor(1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           * CAST(n * syy - sy * sy AS DOUBLE)))
        |    END AS BIGINT) AS corr_micro
        |FROM a""".stripMargin,

    "dq7_psi" ->
      """WITH b AS (SELECT year(CAST(l_shipdate AS DATE)) AS yr,
        |  least(9, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 1000000) AS bucket
        |  FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) IN (1996, 1997)),
        |a AS (SELECT bucket, sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS p,
        |  sum(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS q FROM b GROUP BY bucket),
        |tt AS (SELECT sum(p) AS np, sum(q) AS nq FROM a)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(p AS BIGINT) AS p,
        |  CAST(q AS BIGINT) AS q,
        |  CAST(floor(1000000.0
        |    * (CAST(p AS DOUBLE) / np - CAST(q AS DOUBLE) / nq)
        |    * ln(CAST(p * nq AS DOUBLE) / CAST(q * np AS DOUBLE))) AS BIGINT)
        |    AS psi_term_micro
        |FROM a CROSS JOIN tt WHERE p > 0 AND q > 0""".stripMargin,

    "k2_frequent_pairs" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pr AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS support
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT part_a, part_b, CAST(support AS BIGINT) AS support
        |FROM pr ORDER BY support DESC, part_a, part_b LIMIT 20""".stripMargin,

    // k2's pairs expanded to directed rules with exact integer-micro
    // confidence and lift; (conf desc, ante, cons) is a total order so
    // the LIMIT is deterministic.
    "k3_assoc_rules" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |nb AS (SELECT count(DISTINCT ok) AS n FROM op),
        |item AS (SELECT pk, count(*) AS sup FROM op GROUP BY 1),
        |pr AS (SELECT a.pk AS p1, b.pk AS p2, count(*) AS sup_ab
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |rules AS (SELECT p1 AS ante, p2 AS cons, sup_ab FROM pr
        |  UNION ALL SELECT p2, p1, sup_ab FROM pr)
        |SELECT r.ante, r.cons, CAST(r.sup_ab AS BIGINT) AS sup_ab,
        |  CAST(ia.sup AS BIGINT) AS sup_a, CAST(ic.sup AS BIGINT) AS sup_c,
        |  CAST(r.sup_ab * 1000000 // ia.sup AS BIGINT) AS conf_micro,
        |  CAST(r.sup_ab * nb.n * 1000000 // (ia.sup * ic.sup) AS BIGINT) AS lift_micro
        |FROM rules r JOIN item ia ON ia.pk = r.ante JOIN item ic ON ic.pk = r.cons
        |CROSS JOIN nb
        |ORDER BY conf_micro DESC, ante, cons LIMIT 40""".stripMargin,

    "dq8_fd_check" -> {
      def fd(tbl: String, a: String, b: String) =
        s"""SELECT '$a->$b' AS fd, CAST(count(*) AS BIGINT) AS n_lhs,
           |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_lhs,
           |  CAST(max(nb) AS BIGINT) AS max_rhs_distinct
           |FROM (SELECT $a, count(DISTINCT $b) AS nb FROM $tbl GROUP BY $a)""".stripMargin
      Seq(fd("lineitem", "l_orderkey", "l_linestatus"),
        fd("lineitem", "l_orderkey", "l_returnflag"),
        fd("lineitem", "l_partkey", "l_suppkey"),
        fd("orders", "o_custkey", "o_orderpriority")).mkString("\nUNION ALL\n")
    },

    "dq12_k_anonymity" ->
      """SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
        |  count(*) AS n, (count(*) < 5) AS at_risk
        |FROM customer GROUP BY 1, 2""".stripMargin,

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

    "dq11_join_size" ->
      """WITH lc AS (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1),
        |oc AS (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1),
        |p AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS predicted
        |  FROM lc JOIN oc ON lc.k = oc.k),
        |a AS (SELECT count(*) AS actual FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey)
        |SELECT predicted, CAST(actual AS BIGINT) AS actual,
        |  (predicted = actual) AS stat_exact FROM p CROSS JOIN a""".stripMargin,

    "w4_percent_rank" ->
      """SELECT c_custkey AS custkey, c_nationkey AS nationkey,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(CASE WHEN cnt > 1
        |    THEN (rank() OVER w - 1) * 1000000 // (cnt - 1) ELSE 0 END AS BIGINT) AS pr_micro,
        |  CAST(count(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000 // cnt
        |    AS BIGINT) AS cume_ppm
        |FROM (SELECT *, count(*) OVER (PARTITION BY c_nationkey) AS cnt FROM customer)
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)""".stripMargin,

    "d_stratified_split" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |  ${md5i("CAST(doc_id AS VARCHAR)")} AS hh FROM documents),
         |r AS (SELECT doc_id, lang,
         |  row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn,
         |  count(*) OVER (PARTITION BY lang) AS n FROM h)
         |SELECT doc_id, lang,
         |  CASE WHEN rn * 10000 <= n * 8000 THEN 'train'
         |       WHEN rn * 10000 <= n * 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM r""".stripMargin,

    // Surprise floors per value BEFORE the weighted sum — integer from
    // there on, so the profile is engine-exact.
    "dq10_entropy" -> {
      // sum(BIGINT) → HUGEINT in DuckDB: cast n and the floored quotient
      // back to BIGINT to match Spark's LongType hash.
      def ent(tbl: String, c: String) =
        s"""SELECT '$c' AS "column", CAST(n AS BIGINT) AS n, n_distinct,
           |  CAST(mass // n AS BIGINT) AS entropy_micro FROM (
           |  SELECT sum(cnt) AS n, CAST(count(*) AS BIGINT) AS n_distinct,
           |    sum(cnt * CAST(floor(ln(CAST((SELECT count(*) FROM $tbl) AS DOUBLE) / cnt)
           |      * 1000000) AS BIGINT)) AS mass
           |  FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS cnt FROM $tbl GROUP BY 1))""".stripMargin
      Seq(("lineitem", "l_linestatus"), ("lineitem", "l_returnflag"),
        ("orders", "o_orderstatus"), ("orders", "o_orderpriority"))
        .map { case (t, c) => ent(t, c) }.mkString("\nUNION ALL\n")
    },

    // Both medians via the cd6 rank convention (rank = ⌈bp·n/10⁴⌉, the
    // rank-th smallest), then the exact-rational 44478/10000 cut.
    "dq9_mad_outliers" ->
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM lineitem),
        |c AS (SELECT count(*) AS n FROM v),
        |medr AS (SELECT CAST((5000 * n + 9999) // 10000 AS BIGINT) AS rank FROM c),
        |s AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
        |med AS (SELECT s.v AS med FROM medr JOIN s ON s.rn = medr.rank),
        |ad AS (SELECT abs(v.v - med.med) AS ad, med.med FROM v CROSS JOIN med),
        |s2 AS (SELECT ad, row_number() OVER (ORDER BY ad) AS rn FROM ad),
        |mad AS (SELECT s2.ad AS mad FROM medr JOIN s2 ON s2.rn = medr.rank)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(ad.med) AS BIGINT) AS median,
        |  CAST(min(mad.mad) AS BIGINT) AS mad,
        |  CAST(sum(CASE WHEN ad.ad * 10000 > 44478 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(sum(CASE WHEN ad.ad * 10000 > 44478 * mad.mad THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS outlier_ppm
        |FROM ad CROSS JOIN mad""".stripMargin,

    "d_source_overlap" ->
      s"""$SHINGLE_CTES,
         |ss AS (SELECT DISTINCT d.source, unnest(s.sh) AS g
         |  FROM s JOIN documents d ON s.doc_id = d.doc_id),
         |sz AS (SELECT source, count(*) AS sz FROM ss GROUP BY source),
         |iv AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter
         |  FROM ss a JOIN ss b ON a.g = b.g AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, CAST(inter AS BIGINT) AS inter,
         |  CAST(za.sz AS BIGINT) AS sz_a, CAST(zb.sz AS BIGINT) AS sz_b,
         |  CAST(inter * 1000000 // (za.sz + zb.sz - inter) AS BIGINT) AS jaccard_micro
         |FROM iv JOIN sz za ON za.source = iv.source_a
         |JOIN sz zb ON zb.source = iv.source_b""".stripMargin,

    "dq6_benford" ->
      """WITH d AS (SELECT substr(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS digit FROM lineitem),
        |o AS (SELECT digit, count(*) AS observed FROM d GROUP BY digit),
        |tt AS (SELECT sum(observed) AS n FROM o)
        |SELECT digit, CAST(observed AS BIGINT) AS observed,
        |  CAST(observed * 1000000 // n AS BIGINT) AS obs_micro,
        |  CAST(floor(1000000.0 * ln(1.0 + 1.0 / CAST(digit AS DOUBLE))
        |    / ln(10.0)) AS BIGINT) AS benford_micro
        |FROM o CROSS JOIN tt""".stripMargin,

    "q2_min_price_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, s_name, l_extendedprice
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |minp AS (SELECT l_partkey, min(l_extendedprice) AS min_price
        |  FROM offers GROUP BY 1)
        |SELECT DISTINCT o.l_partkey AS partkey, p_name AS part_name,
        |  o.s_name AS supplier_name, m.min_price
        |FROM offers o
        |JOIN minp m ON o.l_partkey = m.l_partkey AND o.l_extendedprice = m.min_price
        |JOIN part ON o.l_partkey = p_partkey
        |WHERE p_size < 10""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(${c4Sql("l_extendedprice", "l_discount")}
         |    - 50 * ${centsSql("p_retailprice")} * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         |    / 10000 AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%widget%'
         |GROUP BY 1, 2""".stripMargin,

    "q11_important_stock" ->
      s"""WITH nl AS (
         |  SELECT l_partkey, l_extendedprice
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_1'),
         |pp AS (SELECT l_partkey AS partkey, sum(${centsSql("l_extendedprice")}) AS pv_c
         |  FROM nl GROUP BY 1),
         |thr AS (SELECT sum(${centsSql("l_extendedprice")}) AS tot_c FROM nl)
         |SELECT partkey, CAST(pv_c AS DOUBLE) / 100 AS part_value
         |FROM pp, thr WHERE pv_c * 1000 > tot_c""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, sum(${c4Sql("l_extendedprice", "l_discount")}) AS rev_c4
         |  FROM lineitem
         |  WHERE l_shipdate >= '1997-07-01' AND l_shipdate < '1997-10-01'
         |  GROUP BY 1)
         |SELECT l_suppkey AS suppkey, s_name AS name,
         |  CAST(rev_c4 AS DOUBLE) / 10000 AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev_c4 = (SELECT max(rev_c4) FROM rev)""".stripMargin,

    "q16_parts_supplier" ->
      """SELECT p_brand AS brand, p_type AS ptype, CAST(p_size AS BIGINT) AS psize,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q20_potential_promo" ->
      """SELECT s_name AS name, n_name AS nation
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
        |  GROUP BY l_suppkey HAVING sum(l_quantity) > 500)""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH lo AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90 AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |base AS (SELECT DISTINCT ok, sk FROM lo WHERE late)
        |SELECT s_name AS name, CAST(count(*) AS BIGINT) AS numwait
        |FROM base b JOIN supplier ON b.sk = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lo o WHERE o.ok = b.ok AND o.sk <> b.sk)
        |  AND NOT EXISTS (SELECT 1 FROM lo o WHERE o.ok = b.ok AND o.sk <> b.sk AND o.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, name LIMIT 20""".stripMargin,

    "e5_quantize_int8" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(
        |    CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER))
        |    END, ',') AS q_csv,
        |  CASE WHEN mx = 0 THEN 0.0 ELSE floor(mx / 127.0 * 1000000) / 1000000 END AS scale
        |FROM m""".stripMargin
  )

  // --------------------------------------------- oracle SQL shared fragments

  /** DuckDB replica of [[graft.functions.Hashing.md5Long]]. */
  /** The exact DuckDB replay of the iters=0 IVF (nlist=8, nprobe=2, k=3,
    * queries vec_id < 20): md5-seeded centroids, nearest-cell assignment,
    * 2-cell probe, exact-cosine rescore. Shared by e4b (in-memory) and
    * e17 (served from persisted parquet tables) — one oracle, two paths. */
  private def ivfFixedOracleSql: String =
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

  private def md5i(arg: String): String =
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
  private def stressSql(extraCols: String): String =
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

  private def anfSql(extraCols: String): String =
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
  private def labelPropCtes: String = {
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

  private def harmonicSql(extraCols: String): String =
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
  private def pagerankFixedSql(extraCols: String): String = {
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
  private val SCD2_CTES = {
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
  private val AUDIOFP_CTES =
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
  private val AHASH_CTES =
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

  private val WORDS_CTE =
    """WITH t AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w FROM documents)""".stripMargin

  /** DuckDB replica of [[graft.operators.TextAnalysis.gopherQuality]]'s
    * per-doc measures (CTE `m`) — shared by the t_gopher_quality oracle
    * and the d_pipeline_e2e composition. */
  private val GOPHER_CTES =
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
  private val GOPHER_PASS =
    """n_words >= 50 AND n_words <= 100000 AND
      |   mean_len >= 3.0 AND mean_len <= 10.0 AND
      |   sym_ratio < 0.1 AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3 AND
      |   alpha_frac >= 0.8""".stripMargin

  private val SHINGLE_CTES =
    s"""$WORDS_CTE,
       |s AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(w) - 2, 0)),
       |  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh FROM t)""".stripMargin

  /** DuckDB replica of [[graft.operators.Similarity]]'s PQ subvector
    * slice: subspace `sub` of 4 contiguous equal slices (1-based
    * inclusive list slicing). */
  private def pqSubSql(arr: String, sub: String): String =
    s"$arr[(($sub)*(len($arr)//4)+1):((($sub)+1)*(len($arr)//4))]"

  /** DuckDB replica of [[graft.operators.Clustering]]'s sequential-fold
    * squared-L2 — same left-to-right double accumulation as Spark's
    * `aggregate(zip_with(...))`, so distances are bit-identical. */
  private def l2Sql(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
       | i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))),
       | (x,y) -> x + y)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x + y)
       | / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x + y))
       |   * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x + y)))""".stripMargin
}
