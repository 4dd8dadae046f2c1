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
  /** Flagship query on /root/testdata/sf0.001: which customers reach which
    * region in ≤2 hops — the README.md:20-33 indirect-access chain
    * transposed onto the testdata. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GateSupport.khop2Regions(spark, "/root/testdata/sf0.001")


  private val families = Seq(
    GatesGraph, GatesEtl, GatesSql, GatesDedup, GatesAnn, GatesText, GatesStream, GatesGraphMetrics, GatesMultimodal, GatesQuality)

  /** Duplicate gate names across family objects would silently shadow
    * each other in a ++ chain — fail construction instead. */
  private def merged[A](pick: GateFamily => Map[String, A], what: String): Map[String, A] = {
    val all = families.flatMap(pick(_).toSeq)
    val m = all.toMap
    require(all.size == m.size,
      s"duplicate $what names across gate families: " +
        all.groupBy(_._1).collect { case (k, v) if v.size > 1 => k }.mkString(", "))
    m
  }


  val queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(_.queries, "query")

  /** DuckDB-runnable ANSI SQL over the same parquet tables, same column
    * names/aliases as the Spark results. */
  val oracleSql: Map[String, String] = merged(_.oracleSql, "oracle")

  /** Forwarder kept for specs pinned to this name. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame =
    GateSupport.events(s, dir)
}
