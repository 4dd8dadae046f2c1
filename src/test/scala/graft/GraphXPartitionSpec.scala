package graft

import org.apache.spark.graphx.PartitionStrategy
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{GraphXBridge, PropertyGraph}

/** Pins [[GraphXBridge.toGraphX]]'s partition strategy. SURVEY §8.4 claims
  * EdgePartition2D (grid partitioning, ≤ 2·√p replication per vertex — the
  * standard answer to an allUsers-style hot vertex); this spec asserts the
  * actual partition of every edge matches `EdgePartition2D.getPartition`,
  * so a silent strategy change fails here instead of surfacing as 100×-scale
  * skew. Also pins the small-graph skip path (numParts < 17 ⇒ no extra
  * shuffle) that the gate-scale latency budget depends on.
  */
class GraphXPartitionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Star graph: hub 0 with 200 spokes, plus a chain — the hot-vertex shape.
  private def starGraph: PropertyGraph = {
    val vs = (0L to 200L).map(i => (i, "user", i.toString, Map.empty[String, String]))
      .toDF("id", "label", "key", "props")
    val es = ((1L to 200L).map(i => (0L, i)) ++ (1L to 50L).map(i => (i, i + 1)))
      .map { case (s, d) => (s, d, "in", 1) }.toDF("src", "dst", "label", "weight")
    PropertyGraph(vs, es)
  }

  test("toGraphX places every edge where EdgePartition2D says (default path)") {
    val g = GraphXBridge.toGraphX(starGraph) // numParts = 0 → grid partitioning
    val p = g.edges.partitions.length
    val placed = g.edges
      .mapPartitionsWithIndex((i, it) => it.map(e => (i, e.srcId, e.dstId)))
      .collect()
    assert(placed.nonEmpty)
    placed.foreach { case (actual, src, dst) =>
      assert(actual == PartitionStrategy.EdgePartition2D.getPartition(src, dst, p),
        s"edge ($src,$dst) in partition $actual, EdgePartition2D says " +
          s"${PartitionStrategy.EdgePartition2D.getPartition(src, dst, p)} of $p")
    }
  }

  test("hot-vertex replication stays within the 2·√p grid bound") {
    val g = GraphXBridge.toGraphX(starGraph)
    val p = g.edges.partitions.length
    val hubParts = g.edges
      .mapPartitionsWithIndex((i, it) =>
        it.filter(e => e.srcId == 0L || e.dstId == 0L).map(_ => i))
      .collect().toSet
    val bound = 2 * math.ceil(math.sqrt(p)).toInt
    assert(hubParts.size <= bound,
      s"hub vertex replicated to ${hubParts.size} of $p partitions (> 2·√p = $bound)")
  }

  test("declared-tiny graphs (numParts < 17) skip the partitionBy shuffle") {
    val g = GraphXBridge.toGraphX(starGraph, numParts = 4)
    assert(g.edges.partitions.length == 4)
    // Coalesced layout, NOT grid layout: at least one edge must sit outside
    // its EdgePartition2D slot, or the skip path silently regressed into an
    // extra full shuffle per tiny-graph job.
    val misplaced = g.edges
      .mapPartitionsWithIndex((i, it) => it.map(e =>
        i != PartitionStrategy.EdgePartition2D.getPartition(e.srcId, e.dstId, 4)))
      .collect()
    assert(misplaced.contains(true))
  }
}
