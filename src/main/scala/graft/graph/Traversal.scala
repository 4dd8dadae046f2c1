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
  * `seen` set of emitted (origin, node) pairs and anti-joins every new
  * frontier against it, which makes it cycle-safe — the property the
  * reference lacks. `seen` is NOT pre-seeded with the trivial 0-hop
  * (origin, origin) pairs: a pair (a, a) rediscovered at hop ≥ 1 means a
  * directed cycle through `a` and is a legitimate member of the closure
  * (ANSI `WITH RECURSIVE ... UNION` emits it), so it flows into the result
  * like any other pair. Termination is unaffected — the pair space is
  * finite and each pair is emitted at most once.
  *
  * Scale notes (100 TB):
  *   - each hop is one join frontier⋈edges; the edge set is repartitioned by
  *     `src` once and persisted, so the (big, stationary) edge side is never
  *     reshuffled — only the frontier moves each hop;
  *   - the anti-join runs BEFORE the frontier dedup so the following
  *     `distinct` reuses the anti-join's (origin, node) exchange — one
  *     shuffle of the stepped pairs per hop, not two;
  *   - each frontier is persisted (the accumulated result is exactly the
  *     disjoint union of the frontiers, so total cached volume = closure
  *     size, nothing duplicated); every [[checkpointEvery]] rounds the
  *     accumulators are `localCheckpoint`ed (cutting lineage that would
  *     otherwise re-analyze a growing union plan every round) and the
  *     superseded frontier blocks are released;
  *   - before returning, the result is checkpointed and ALL loop-scoped
  *     blocks (edge cache, remaining frontiers) are unpersisted, so repeated
  *     traversals do not accumulate executor storage.
  */
object Traversal {

  private val checkpointEvery = 4

  /** Bounded k-hop: vertices reachable from `start` in 1..k hops.
    * `start` needs an `id` column; `edges` needs `src`/`dst`.
    * Returns (origin, node, hop) — `hop` is the first hop at which `node`
    * was discovered from `origin` (shortest-path semantics). A row
    * (a, a, h) means a directed cycle of length h through `a`. */
  def khop(edges: DataFrame, start: DataFrame, k: Int): DataFrame =
    bfs(edges, start, k, warnOnTruncate = false)

  /** Cycle-safe transitive closure: all (origin, node) pairs with a directed
    * path of length ≥ 1 from origin to node — equivalent to DuckDB/ANSI
    * `WITH RECURSIVE ... UNION` (set semantics ⇒ termination on cycles).
    * Throws if `maxIter` is hit before convergence: a silently truncated
    * closure is a wrong answer, not a partial one. */
  def reachFix(edges: DataFrame, start: DataFrame, maxIter: Int = 64): DataFrame =
    bfs(edges, start, maxIter, warnOnTruncate = true).drop("hop")

  private def bfs(edges: DataFrame, start: DataFrame, maxHops: Int,
                  warnOnTruncate: Boolean): DataFrame = {
    val spark = start.sparkSession
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = start.select(col("id").as("origin"), col("id").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val zeroHop = frontier
    // Frontiers whose blocks are still held; unpersisted once a checkpoint
    // has made them redundant.
    var live = List.empty[DataFrame]
    var result: Option[DataFrame] = None // (origin, node, hop), hop ≥ 1
    var hop = 1
    var done = false
    while (hop <= maxHops && !done) {
      val stepped = frontier.join(e, frontier("node") === e("src"))
        .select(col("origin"), col("dst").as("node"))
      // Anti-join against emitted pairs FIRST, then dedup: distinct reuses
      // the anti-join's hash exchange on (origin, node).
      val next = result.fold(stepped)(r =>
          stepped.join(r.select(col("origin"), col("node")), Seq("origin", "node"), "left_anti"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (next.isEmpty) {
        next.unpersist(false)
        done = true
      } else {
        val stamped = next.withColumn("hop", lit(hop))
        result = Some(result.map(_.unionByName(stamped)).getOrElse(stamped))
        if (hop > 1) live = frontier :: live // hop-1 frontier now superseded
        frontier = next
        if (hop % checkpointEvery == 0) {
          // Eager checkpoint materializes `result` into its own blocks, so
          // every frontier folded into it so far can be released.
          result = result.map(_.localCheckpoint())
          live.foreach(_.unpersist(false))
          live = Nil
        }
        hop += 1
      }
    }
    if (!done && warnOnTruncate)
      throw new IllegalStateException(
        s"reachFix did not converge within $maxHops iterations — " +
          "the transitive closure would be silently truncated; raise maxIter")
    // Detach the result from all loop-scoped storage before returning.
    val out = result
      .map(_.localCheckpoint())
      .getOrElse(spark.emptyDataFrame
        .select(lit(0L).as("origin"), lit(0L).as("node"), lit(0).as("hop")).limit(0))
    e.unpersist(false)
    zeroHop.unpersist(false)
    live.foreach(_.unpersist(false))
    frontier.unpersist(false)
    out
  }
}
