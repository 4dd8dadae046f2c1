package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphBuilder, GraphStore, PropertyGraph}

/** Relational/analytic SQL-surface gates (TPC-H-style joins/aggs, top-k, pivot/rollup, set ops, scalar functions, window functions).
  *
  * Split from the former single-object SparkEntry (round 14) — a pure
  * refactor: every entry body is byte-identical, gate names and oracle
  * SQL unchanged; [[SparkEntry]] composes the family maps back together.
  */
private[graft] object GatesSql extends GateFamily {
  import GateSupport._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Rollup over (returnflag, linestatus). NOT redundant with r5 (the
    // r15 verdict's dedup question, answered here): r1 exercises the
    // DOUBLE-typed sum + count path with no grouping_id — the plain
    // rollup shape most BI tools emit — while r5 pins the exact-integer
    // + grouping_id form; the two hit different aggregate typings in
    // both Spark and the DuckDB oracle (double vs HUGEINT-cast).
    "r1_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
    }),

    // Cube over (orderstatus, orderpriority). Kept alongside r6 (r15
    // verdict dedup question): different table (orders vs lineitem),
    // count-only aggregate, and no grouping_id — the NULL-group
    // disambiguation burden falls on the hash compare instead, which is
    // exactly the subtle case a cube implementation can get wrong.
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

    // Pivot: customer counts, nation rows x fixed segment columns. Kept
    // alongside p3 (r15 verdict dedup question): p1 is the count-pivot +
    // na.fill(0) missing-cell shape on a dimension table, p3 the
    // sum-pivot with renamed pinned columns on the fact table — the two
    // NULL-handling disciplines a pivot user actually chooses between.
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

    // Z-order layout audit over part(p_size, floor(p_retailprice)):
    // Morton-code cells (low 6 bits dropped ≈ one file each under a
    // zval-sorted write) with per-cell min/max of BOTH dimensions — the
    // parquet-footer stats that make either predicate column prunable.
    "y1_zorder_cells" -> ((s, dir) => {
      operators.Layout.zOrderCells(t(s, dir, "part"),
        col("p_size"), floor(col("p_retailprice")).cast("long"), cellBits = 6)
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
  )

  val oracleSql: Map[String, String] = Map(

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

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         |CAST(sum(${centsSql("l_extendedprice")}) AS DOUBLE) / 100 AS sum_base_price,
         |count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

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

    "f5_percentiles" ->
      """SELECT l_returnflag,
        |round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |round(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |round(quantile_cont(l_quantity, 0.99), 4) AS p99,
        |count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

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
  )
}
