package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds the [[PropertyGraph]] from the driver's TPC-H-shaped testdata by
  * modeling its FK structure as the reference's containment graph — the same
  * "x —in→ y" shape as user —in→ group —in→ role —in→ project
  * (reference README.md:20-33):
  *
  *   customer —in→ nation —in→ region
  *   supplier —in→ nation
  *   orders   —in→ customer
  *   lineitem —in→ orders | part | supplier
  *
  * Vertex ids are deterministic: `labelCode * 2^56 + businessKey`, so the
  * same row always maps to the same id on any executor with no id service —
  * and so a SQL oracle can recompute them. The label code lives in the top
  * byte of the 64-bit id, leaving 2^56 ≈ 7.2e16 of key space per label —
  * ample at 100 TB scale (TPC-H sf100k has ~6e14 lineitems). Lineitem's
  * composite key packs as `l_orderkey * 10 + l_linenumber` (linenumber ≤ 7).
  */
object GraphBuilder {

  /** Id-space stride per label: 2^56 (label code in the top byte). */
  val B: Long = 1L << 56

  val LabelCodes: Map[String, Long] = Map(
    "region" -> 1L, "nation" -> 2L, "customer" -> 3L, "supplier" -> 4L,
    "part" -> 5L, "orders" -> 6L, "lineitem" -> 7L)

  /** Deterministic vertex id from (label, numeric key). */
  def vid(label: String, key: Column): Column =
    lit(LabelCodes(label) * B) + key.cast("long")

  /** Parquet SCHEMA memo for the sf-dir tables (optimization round 16,
    * guide §6's listing/metadata-cache principle): a bare
    * `spark.read.parquet` runs footer schema inference on the DRIVER on
    * every call — measured ~60-75 ms each, and the ~330 gate bodies call
    * [[table]] 1-4 times per execution, twice per bench pass. Caching the
    * STRUCTTYPE (never the DataFrame — a shared plan instance would give
    * every caller the same attribute ids and trip AMBIGUOUS_SELF_JOIN on
    * gates that join a table to itself) removes the inference while each
    * call still builds a fresh plan that re-reads the files; results are
    * untouched. The sf tables are immutable test inputs; anything written
    * at runtime (temp stores, compaction dirs) goes through bare
    * `read.parquet`, not this helper. */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(path, {
      // events.parquet guard (r16 VERDICT residual #4): its inferred
      // schema DEPENDS on a session conf on Spark ≤ 4.0 (TIMESTAMP(NANOS)
      // reads as LongType only under legacy.parquet.nanosAsLong — 4.1+
      // reads NTZ natively and ignores the conf), and this memo would
      // otherwise freeze whichever schema the FIRST caller inferred.
      // GateSupport.events sets the conf before every read; assert that
      // ordering here so a future conf-less first touch fails loudly
      // instead of poisoning the cache for the JVM lifetime.
      require(name != "events" ||
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
        "events.parquet schema inference requires the nanosAsLong conf " +
          "set first — read it via GateSupport.events, never directly")
      spark.read.parquet(path).schema
    })
    spark.read.schema(schema).parquet(path)
  }

  /** Packed composite key for lineitem rows. */
  def lineitemKey(orderkey: Column, linenumber: Column): Column =
    orderkey.cast("long") * 10 + linenumber.cast("long")

  private def vtx(label: String, key: Column, props: (String, Column)*): Column = {
    val m = map(props.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }: _*)
    struct(
      vid(label, key).as("id"), lit(label).as("label"),
      key.cast("long").cast("string").as("key"), m.as("props"))
  }

  /** All vertices from an sf directory. */
  def vertices(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = table(spark, dir, n)
    val r = t("region").select(vtx("region", col("r_regionkey"),
      "name" -> col("r_name")).as("v"))
    val n = t("nation").select(vtx("nation", col("n_nationkey"),
      "name" -> col("n_name")).as("v"))
    val c = t("customer").select(vtx("customer", col("c_custkey"),
      "name" -> col("c_name"), "mktsegment" -> col("c_mktsegment")).as("v"))
    val s = t("supplier").select(vtx("supplier", col("s_suppkey"),
      "name" -> col("s_name")).as("v"))
    val p = t("part").select(vtx("part", col("p_partkey"),
      "name" -> col("p_name"), "brand" -> col("p_brand"), "type" -> col("p_type")).as("v"))
    val o = t("orders").select(vtx("orders", col("o_orderkey"),
      "orderstatus" -> col("o_orderstatus"), "orderpriority" -> col("o_orderpriority")).as("v"))
    // The synthetic lineitem table contains duplicate (orderkey, linenumber)
    // pairs; the store keeps upsert semantics (same business key = same
    // vertex — the reference's guarded-upsert model), collapsing
    // deterministically to the lexicographically-least property row.
    val l = t("lineitem")
      .groupBy(lineitemKey(col("l_orderkey"), col("l_linenumber")).as("__k"))
      .agg(min(struct(col("l_returnflag"), col("l_linestatus"))).as("__p"))
      .select(vtx("lineitem", col("__k"),
        "returnflag" -> col("__p.l_returnflag"),
        "linestatus" -> col("__p.l_linestatus")).as("v"))
    Seq(r, n, c, s, p, o, l).reduce(_ unionByName _).select(col("v.*"))
  }

  private def edge(src: Column, dst: Column): Column =
    struct(src.as("src"), dst.as("dst"), lit("in").as("label"), lit(1).as("weight"))

  /** All containment edges from an sf directory (label `in`, weight 1 —
    * mirroring main.go:321 `property('weight', 1)`). */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = table(spark, dir, n)
    val cn = t("customer").select(edge(
      vid("customer", col("c_custkey")), vid("nation", col("c_nationkey"))).as("e"))
    val sn = t("supplier").select(edge(
      vid("supplier", col("s_suppkey")), vid("nation", col("s_nationkey"))).as("e"))
    val nr = t("nation").select(edge(
      vid("nation", col("n_nationkey")), vid("region", col("n_regionkey"))).as("e"))
    val oc = t("orders").select(edge(
      vid("orders", col("o_orderkey")), vid("customer", col("o_custkey"))).as("e"))
    // distinct: duplicate (orderkey, linenumber) source rows must not
    // produce duplicate edges (upsert set semantics, main.go:319-322).
    val li = t("lineitem")
    val lk = lineitemKey(col("l_orderkey"), col("l_linenumber"))
    val lo = li.select(edge(vid("lineitem", lk), vid("orders", col("l_orderkey"))).as("e")).distinct()
    val lp = li.select(edge(vid("lineitem", lk), vid("part", col("l_partkey"))).as("e")).distinct()
    val ls = li.select(edge(vid("lineitem", lk), vid("supplier", col("l_suppkey"))).as("e")).distinct()
    Seq(cn, sn, nr, oc, lo, lp, ls).reduce(_ unionByName _).select(col("e.*"))
  }

  /** Full graph for an sf directory. */
  def build(spark: SparkSession, dir: String): PropertyGraph =
    PropertyGraph(vertices(spark, dir), edges(spark, dir))
}
