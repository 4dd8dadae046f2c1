package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraphBuilder.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001: which customers reach which
    * region in ≤2 hops — the README.md:20-33 indirect-access chain
    * transposed onto the testdata. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    khop2Regions(spark, "/root/testdata/sf0.001")

  private def khop2Regions(s: SparkSession, dir: String): DataFrame = {
    val g = GraphStore.get(s, dir)
    val reached = g.reach(g.hasLabel("customer"), 2, dedupStart = false)
    val regions = g.hasLabel("region")
      .select(col("id").as("rid"), col("props").getItem("name").as("region_name"))
    reached.join(regions, reached("node") === regions("rid"))
      .select((col("origin") - lit(3L * B)).as("custkey"), col("region_name"), col("hop"))
  }

  // ------------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1 — vertex scan: census of the whole vertex set by label.
    "a01_vertex_count_by_label" -> ((s, dir) => {
      GraphBuilder.vertices(s, dir).groupBy("label").agg(count(lit(1)).as("cnt"))
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

    // A14 — cycle-safe transitive closure over the full graph.
    "a14_reach_fixpoint" -> ((s, dir) => {
      val g = GraphStore.get(s, dir)
      g.reachFix(g.V, dedupStart = false)
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

    // B11 — active filter: lifecycle filter analogue (main.go:722).
    "b11_filter_active" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // M5 — TPC-H Q1-style aggregation.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          count(lit(1)).as("count_order"))
    }),

    // M6 — text analysis: token count per document.
    "t_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        size(filter(split(col("text"), "\\s+"), x => x =!= lit(""))).cast("long").as("n_tokens"))
    }),

    // M6 — document fingerprint (md5) + exact-dup group size.
    "d_exact_dup_fingerprint" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), md5(col("text")).as("h"))
      val groups = d.groupBy(col("h")).agg(count(lit(1)).as("dup_count"))
      d.join(groups, "h").select(col("doc_id"), col("h"), col("dup_count"))
    })
  )

  // ---------------------------------------------------------------- oracles

  /** DuckDB-runnable ANSI SQL over the same parquet tables, same column
    * names/aliases as the Spark results. */
  def oracleSql: Map[String, String] = Map(

    "a01_vertex_count_by_label" ->
      """SELECT 'region' AS label, count(*) AS cnt FROM region
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'customer', count(*) FROM customer
        |UNION ALL SELECT 'supplier', count(*) FROM supplier
        |UNION ALL SELECT 'part', count(*) FROM part
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem""".stripMargin,

    "a02_label_filter" ->
      "SELECT c_custkey AS custkey, c_name AS name FROM customer",

    "a03_property_predicate" ->
      "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'",

    "a20_point_lookup" ->
      """SELECT 3*72057594037927936 + c_custkey AS id, 'customer' AS label,
        |CAST(c_custkey AS VARCHAR) AS key FROM customer WHERE c_custkey = 42""".stripMargin,

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

    "a06_upsert_vertices" ->
      """SELECT 'region' AS label, count(*) AS cnt FROM region
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'customer', count(*) FROM customer
        |UNION ALL SELECT 'supplier', count(*) FROM supplier
        |UNION ALL SELECT 'part', count(*) FROM part
        |UNION ALL SELECT 'orders', (SELECT count(*) FROM orders) + (SELECT count(*) FROM orders)
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem""".stripMargin,

    "b09_invert_map" ->
      """SELECT c_mktsegment AS segment,
        |array_to_string(list_sort(list_distinct(list(n_name))), ',') AS nations
        |FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY c_mktsegment""".stripMargin,

    "b11_filter_active" ->
      """SELECT o_orderpriority AS priority, count(*) AS cnt FROM orders
        |WHERE o_orderstatus = 'O' GROUP BY o_orderpriority""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price, count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "t_token_count" ->
      """SELECT doc_id, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
        |FROM documents""".stripMargin,

    "d_exact_dup_fingerprint" ->
      """SELECT doc_id, md5(text) AS h,
        |count(*) OVER (PARTITION BY md5(text)) AS dup_count FROM documents""".stripMargin
  )
}
