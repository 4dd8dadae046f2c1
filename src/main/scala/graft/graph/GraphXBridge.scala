package graft.graph

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX bridge for whole-graph analytics (BASELINE.json's designated
  * path for graph-analytic queries the DataFrame API expresses poorly).
  *
  * DataFrame joins win for the reference's traversal/upsert surface;
  * GraphX (Pregel) wins for vertex-program algorithms — connected
  * components, PageRank — where per-vertex state and message passing beat
  * repeated join+distinct rounds.
  *
  * Scale: edges are partitioned with `EdgePartition2D` (grid partitioning
  * bounds each vertex's replication to 2*sqrt(numParts) partitions —
  * the standard GraphX answer to power-law degree skew).
  */
object GraphXBridge {

  /** Lower a [[PropertyGraph]] to a GraphX graph (vertex attr = label).
    * `numParts` sizes the edge partitioning: Pregel runs a join round per
    * superstep, so a small graph on many partitions is pure task-launch
    * overhead — size to data, not to cluster default. */
  def toGraphX(g: PropertyGraph, numParts: Int = 0): Graph[String, Int] = {
    val vs = g.vertices.select(col("id"), col("label")).rdd
      .map(r => (r.getLong(0): VertexId, r.getString(1)))
    val es = g.edges.select(col("src"), col("dst"), col("weight")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getInt(2)))
    val graph = if (numParts > 0)
      Graph(vs.coalesce(numParts), es.coalesce(numParts))
    else Graph(vs, es)
    graph.partitionBy(PartitionStrategy.EdgePartition2D)
  }

  /** Connected components (undirected reachability; component id = min
    * vertex id, GraphX convention). Returns (id, component). */
  def connectedComponents(spark: SparkSession, g: PropertyGraph,
                          numParts: Int = 0): DataFrame = {
    import spark.implicits._
    toGraphX(g, numParts).connectedComponents().vertices
      .map { case (vid, cc) => (vid, cc) }
      .toDF("id", "component")
  }

  /** Static PageRank (fixed iteration count), rank rounded to 6dp.
    * Returns (id, rank). */
  def pageRank(spark: SparkSession, g: PropertyGraph, iters: Int = 5,
               numParts: Int = 0): DataFrame = {
    import spark.implicits._
    toGraphX(g, numParts).staticPageRank(iters).vertices
      .map { case (vid, r) => (vid, math.rint(r * 1e6) / 1e6) }
      .toDF("id", "rank")
  }
}
