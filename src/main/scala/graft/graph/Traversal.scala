package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed traversal engine — the Spark-native replacement for the
  * reference's two traversal mechanisms:
  *   - repeated Gremlin `.out()` hops (README.md:20-33, 344), and
  *   - the Go-side recursive nested-group expansion `getGroupMembers`
  *     (main.go:328-356), which recurses with NO visited-set and loops
  *     forever on membership cycles (main.go:347).
  *
  * Both lower to iterated joins on the edges DataFrame. The fixpoint keeps a
  * `seen` set and anti-joins every new frontier against it, which makes it
  * cycle-safe — the property the reference lacks.
  *
  * Scale notes (100 TB):
  *   - each hop is one shuffle join frontier⋈edges; pre-partitioning `edges`
  *     by `src` (storage bucketing) keeps the big side stationary and only
  *     the frontier moves;
  *   - lineage grows per iteration, so we `localCheckpoint` the accumulators
  *     every [[checkpointEvery]] rounds — without this, 30+ iterations build
  *     a plan Catalyst re-optimizes from scratch each round (exponential
  *     analysis cost) and task-retry re-executes the whole chain;
  *   - frontiers are persisted (MEMORY_AND_DISK) because each one is read
  *     twice: once to build the next frontier, once for the emptiness check.
  */
object Traversal {

  private val checkpointEvery = 4

  /** Bounded k-hop: vertices reachable from `start` in exactly 1..k hops.
    * `start` needs an `id` column; `edges` needs `src`/`dst`.
    * Returns (origin, node, hop) — `node` reachable from `origin` in `hop`
    * hops (first hop at which it was discovered; shortest-path semantics). */
  def khop(edges: DataFrame, start: DataFrame, k: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var frontier = start.select(col("id").as("origin"), col("id").as("node")).distinct()
    var seen = frontier
    var out: Option[DataFrame] = None
    var hop = 1
    var done = false
    while (hop <= k && !done) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("origin"), col("dst").as("node"))
        .distinct()
        .join(seen, Seq("origin", "node"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (next.isEmpty) { done = true }
      else {
        val stamped = next.withColumn("hop", lit(hop))
        out = Some(out.map(_.unionByName(stamped)).getOrElse(stamped))
        seen = seen.unionByName(next)
        frontier = next
        if (hop % checkpointEvery == 0) {
          seen = seen.localCheckpoint()
          out = out.map(_.localCheckpoint())
        }
        hop += 1
      }
    }
    out.getOrElse(
      start.sparkSession.emptyDataFrame
        .select(lit(0L).as("origin"), lit(0L).as("node"), lit(0).as("hop")).limit(0))
  }

  /** Cycle-safe transitive closure: all (origin, node) pairs with a directed
    * path of length ≥ 1 from origin to node. Equivalent to DuckDB/ANSI
    * `WITH RECURSIVE ... UNION` (set semantics ⇒ termination on cycles). */
  def reachFix(edges: DataFrame, start: DataFrame, maxIter: Int = 64): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = start.select(col("id").as("origin"), col("id").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seen tracks (origin, node) already visited INCLUDING the trivial
    // 0-hop pairs, so cycles back to the origin terminate; result excludes
    // the 0-hop pairs to match path-length ≥ 1 semantics.
    var seen = frontier
    var result: Option[DataFrame] = None
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("origin"), col("dst").as("node"))
        .distinct()
        .join(seen, Seq("origin", "node"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (next.isEmpty) { done = true }
      else {
        result = Some(result.map(_.unionByName(next)).getOrElse(next))
        seen = seen.unionByName(next)
        frontier.unpersist(false)
        frontier = next
        iter += 1
        if (iter % checkpointEvery == 0) {
          seen = seen.localCheckpoint()
          result = result.map(_.localCheckpoint())
        }
      }
    }
    result.getOrElse(
      start.sparkSession.emptyDataFrame
        .select(lit(0L).as("origin"), lit(0L).as("node")).limit(0))
  }
}
