package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A17 — graph serialization (reference: `sg.io(IoCore.graphml())
  * .writeGraph("/tmp/mygraph.xml")` README.md:386; GraphSON README.md:484-489).
  *
  * Two paths, chosen by scale:
  *   - [[graphsonVertices]]/[[graphsonEdges]]: one JSON document per row,
  *     produced by codegen'd `to_json` — fully distributed, writes with
  *     `df.write.text`, works at any size. Unlike GraphML, JSON has no
  *     trouble with multi-valued properties (the reference documents that
  *     GraphML cannot encode them, README.md:474-482).
  *   - [[graphml]]: a single GraphML XML document assembled on the driver —
  *     only for small (sub)graphs, mirroring the reference's console export
  *     which materializes the whole subgraph in server heap anyway
  *     (README.md:372-386). Guarded by `maxRows`.
  */
object GraphExport {

  /** One GraphSON-flavored JSON line per vertex (stable field order). */
  def graphsonVertices(g: PropertyGraph): DataFrame =
    g.vertices.select(to_json(struct(
      col("id"), col("label"), col("key"), col("props"))).as("json"))

  /** One GraphSON-flavored JSON line per edge. */
  def graphsonEdges(g: PropertyGraph): DataFrame =
    g.edges.select(to_json(struct(
      col("src"), col("dst"), col("label"), col("weight"))).as("json"))

  /** Distributed export: JSON-lines directories for vertices and edges. */
  def writeGraphson(g: PropertyGraph, dir: String): Unit = {
    graphsonVertices(g).write.mode("overwrite").text(s"$dir/vertices")
    graphsonEdges(g).write.mode("overwrite").text(s"$dir/edges")
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  /** GraphML document for a SMALL graph (throws above `maxRows` — use
    * [[writeGraphson]] for anything big; collecting a 100 TB graph to the
    * driver is exactly the reference's server-heap failure mode). */
  def graphml(g: PropertyGraph, maxRows: Long = 100000): String = {
    val nV = g.vertices.count()
    val nE = g.edges.count()
    require(nV + nE <= maxRows,
      s"graph too large for driver-side GraphML ($nV vertices + $nE edges > $maxRows); use writeGraphson")
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8"?>""" += '\n'
    sb ++= """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""" += '\n'
    sb ++= """  <key id="label" for="node" attr.name="label" attr.type="string"/>""" += '\n'
    sb ++= """  <key id="key" for="node" attr.name="key" attr.type="string"/>""" += '\n'
    sb ++= """  <key id="prop" for="node" attr.name="prop" attr.type="string"/>""" += '\n'
    sb ++= """  <key id="weight" for="edge" attr.name="weight" attr.type="int"/>""" += '\n'
    sb ++= """  <graph id="G" edgedefault="directed">""" += '\n'
    g.vertices.select("id", "label", "key", "props").orderBy("id").collect().foreach { r =>
      sb ++= s"""    <node id="${r.getLong(0)}">"""
      sb ++= s"""<data key="label">${esc(r.getString(1))}</data>"""
      sb ++= s"""<data key="key">${esc(r.getString(2))}</data>"""
      val props = r.getMap[String, String](3)
      props.toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb ++= s"""<data key="prop">${esc(k)}=${esc(String.valueOf(v))}</data>"""
      }
      sb ++= "</node>\n"
    }
    g.edges.select("src", "dst", "label", "weight").orderBy("src", "dst").collect().foreach { r =>
      sb ++= s"""    <edge source="${r.getLong(0)}" target="${r.getLong(1)}">"""
      sb ++= s"""<data key="weight">${r.getInt(3)}</data></edge>\n"""
    }
    sb ++= "  </graph>\n</graphml>\n"
    sb.result()
  }

  /** Write the driver-side GraphML document to a local path. */
  def writeGraphML(g: PropertyGraph, path: String, maxRows: Long = 100000): Unit = {
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), graphml(g, maxRows))
    ()
  }
}
