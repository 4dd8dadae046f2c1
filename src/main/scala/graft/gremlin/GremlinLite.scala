package graft.gremlin

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Text-level compatibility with the reference's console workflow: run the
  * read-only Gremlin traversals its README actually types
  * (`g.V().count()`, `g.E().count()`,
  * `g.V().hasLabel('user').has('email','user1@…').out().valueMap()` —
  * README.md:331-349) verbatim against a [[PropertyGraph]].
  *
  * This is a small traversal-step interpreter, not a Gremlin engine: each
  * step lowers to the corresponding PropertyGraph DataFrame call, so the
  * produced plan is identical to the fluent API's (Catalyst sees filters
  * and joins, never the query string). Traverser semantics follow Gremlin:
  * `out()` multiplies per path (no implicit dedup) — use `dedup()`.
  *
  * Supported steps: `V([id])`, `E()`, `hasLabel(l)`, `has(k,v)`,
  * `out([l])`, `in([l])`, `outE([l])`, `inE([l])`, `outV()`, `inV()`,
  * `valueMap()`, `values(k)`, `id()`, `count()`, `dedup()`, `limit(n)`,
  * `repeat(out([l])|in([l])).times(n)` — the canonical spelling of
  * the reference's k-hop walk (README.md:20-33 repeated `.out()`) — and
  * `subgraph('sg')...cap('sg')[.next()]`, so the reference's Cytoscape
  * export session (`sg = g.V().outE().subgraph('sg').cap('sg').next()`,
  * README.md:369-380) runs verbatim: a leading `name =` assignment is
  * skipped, `cap` yields the console's census (one row of
  * vertex/edge counts), and [[subgraphOf]] returns the captured
  * [[PropertyGraph]] for [[graft.graph.GraphExport]].
  * A label-less hop traverses ALL edge labels, as Gremlin does.
  * Mutation steps are deliberately split from [[run]] (read-only): typed
  * mutation scripts — the reference's guarded addV/addE console statements
  * plus `...drop()` — go through [[mutate]], which lowers them to the
  * set-semantics upsert/drop API (SURVEY.md §2.A6/A9/A15) via
  * [[graft.sources.GroovyLoader]] rather than replaying per statement.
  */
object GremlinLite {

  /** Apply a typed mutation script — the reference's console statement
    * shapes (`g.addV('l').property(...)`, lookup-bind + `addE`,
    * main.go:205-211/310-322, README.md:331-340) plus
    * `g.V().hasLabel('l')[.has(k,v)].drop()` — to `g`.
    *
    * addV/addE runs accumulate and flush through the set-semantics
    * upserts (guarded-`if` wrappers become no-ops — the upsert IS the
    * guard, set-at-a-time); a drop() flushes pending upserts first so
    * statement order is preserved. Returns the mutated graph; `g` itself
    * is immutable. */
  def mutate(g: PropertyGraph, script: String,
             keyProps: Map[String, String] =
               graft.sources.GroovyLoader.ReferenceKeyProps): PropertyGraph = {
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val Drop =
      """g\.V\(\)\.hasLabel\('([^']+)'\)(?:\.has\(\s*'([^']+)'\s*,\s*'([^']*)'\s*\))?\.drop\(\)""".r
    var cur = g
    val buf = new StringBuilder
    def flush(): Unit = if (buf.nonEmpty) {
      val (pv, pe) = graft.sources.GroovyLoader.parsedBatches(
        Seq(buf.toString).toDS(), keyProps)
      cur = cur.upsertVertices(graft.sources.GroovyLoader.vertexBatch(pv))
      // Resolve addE endpoints by LOOKUP against the (just-upserted)
      // graph — Gremlin's `u1 = g.V()...next()` semantics — so mutate
      // works on graphs whose ids don't follow the loader's scheme. The
      // bound property may be the promoted key (stored in `key`, not in
      // `props`) — consult the per-label registry for that.
      val kp = typedLit(keyProps)
      // localCheckpoint freezes the per-statement ids so the validation
      // aggregates and the upsert all see the same numbering.
      val e = pe.toDF().withColumn("__stmt", monotonically_increasing_id())
        .localCheckpoint()
      def vside(s: String) = cur.vertices.select(
        col("id").as(s"__${s}id"), col("label").as(s"__${s}l"),
        col("key").as(s"__${s}k"), col("props").as(s"__${s}p"))
      def cond(s: String, labelC: String, propC: String, keyC: String) =
        col(s"__${s}l") === col(labelC) &&
          when(col(propC) === coalesce(kp(col(labelC)), lit("key")) ||
            col(propC) === "key",
            col(s"__${s}k") === col(keyC))
            .otherwise(element_at(col(s"__${s}p"), col(propC)) === col(keyC))
      val parsedCount = e.count()
      val full = e
        .join(vside("s"), cond("s", "srcLabel", "srcProp", "srcKey"))
        .join(vside("d"), cond("d", "dstLabel", "dstProp", "dstKey"))
        .select(col("__stmt"), col("__sid").as("src"), col("__did").as("dst"),
          col("label"), col("weight"))
      if (parsedCount > 0) {
        // Per-STATEMENT validation: every addE must resolve to exactly one
        // (src, dst) pair — an unmatched bind (Gremlin .next() on an empty
        // traversal throws) must not cancel out against an ambiguous bind
        // that matched several vertices.
        val perStmt = full.groupBy(col("__stmt")).agg(count(lit(1)).as("__c"))
        val resolvedStmts = perStmt.count()
        val ambiguous = perStmt.filter(col("__c") > 1).count()
        require(resolvedStmts == parsedCount && ambiguous == 0,
          s"addE endpoint lookup failed: $parsedCount statement(s) parsed, " +
            s"$resolvedStmts resolved, $ambiguous ambiguous (a bind must match " +
            s"exactly one vertex; Gremlin .next() on an empty traversal throws — so do we)")
        cur = cur.upsertEdges(full.drop("__stmt"))
      }
      buf.setLength(0)
    }
    script.linesIterator.foreach { line =>
      Drop.findFirstMatchIn(line) match {
        case Some(m) =>
          flush()
          // The bound property may be the label's promoted key, which
          // lives in the `key` column, not the props map — same registry
          // rule as addE endpoint resolution above.
          val pred =
            if (m.group(2) == null) col("label") === m.group(1)
            else {
              val isKey = m.group(2) == "key" ||
                keyProps.get(m.group(1)).contains(m.group(2))
              col("label") === m.group(1) &&
                (if (isKey) col("key") else cur.propCol(m.group(2))) === lit(m.group(3))
            }
          cur = cur.dropVertices(pred)
        case None => buf.append(line).append('\n')
      }
    }
    flush()
    cur
  }

  /** Parse `query` and evaluate it against `g`. Throws
    * IllegalArgumentException on syntax errors or unsupported steps. */
  def run(g: PropertyGraph, query: String): DataFrame = eval(g, query)._1

  /** The side-effect graph a `subgraph(name)` step captured while
    * evaluating `query` — the `sg.io(...).writeGraph(...)` half of the
    * reference's export session, minus the file format (pair with
    * [[graft.graph.GraphExport]]). */
  def subgraphOf(g: PropertyGraph, query: String, name: String = "sg"): PropertyGraph = {
    val captured = eval(g, query)._2
    captured.getOrElse(name, throw new IllegalArgumentException(
      s"no subgraph('$name') step in: $query (captured: ${captured.keys.mkString(",")})"))
  }

  private def eval(g: PropertyGraph, query: String): (DataFrame, Map[String, PropertyGraph]) = {
    val steps = parse(query)
    require(steps.nonEmpty, s"empty traversal: $query")

    val (source, sourceArgs) = steps.head
    var onEdges = false
    var cur: DataFrame = source match {
      case "V" if sourceArgs.isEmpty => g.V
      case "V" => g.V.filter(col("id").isin(sourceArgs.map(_.toLong): _*))
      case "E" => onEdges = true; g.E
      case other => throw new IllegalArgumentException(
        s"traversal must start with V() or E(), got $other()")
    }

    // One promoted-property rule and one vertex-schema projection, shared
    // with the fluent API — the text surface cannot drift from it.
    // A label-less hop traverses ALL edge labels (Gremlin semantics).
    def edgeLabel(args: Seq[String]): Option[String] = args.headOption
    def hop(body: String, args: Seq[String])(d: DataFrame): DataFrame =
      g.valueMap(if (body == "out") g.out(d, edgeLabel(args)) else g.in(d, edgeLabel(args)))
    var captured = Map.empty[String, PropertyGraph]
    def toVertices(joinOn: String): DataFrame = {
      val v = g.vertices.as("v")
      cur.join(v, col(joinOn) === col("v.id"))
        .select(col("v.id").as("id"), col("v.label").as("label"),
          col("v.key").as("key"), col("v.props").as("props"))
    }

    val rest = steps.tail.iterator.buffered
    while (rest.hasNext) {
      val (step, args) = rest.next()
      // Loud arity checks: Gremlin's 3-arg has(label,key,value) or a
      // multi-label hasLabel would otherwise silently match nothing.
      def arity(n: Int, m: Int = -1): Unit = {
        val hi = if (m < 0) n else m
        require(args.length >= n && args.length <= hi,
          s"$step() takes ${if (hi == n) s"$n" else s"$n..$hi"} argument(s), " +
            s"got ${args.length} in: $query")
      }
      (step, onEdges) match {
        case ("repeat", _) =>
          arity(1)
          // repeat(out('l')).times(n): args hold the raw body text.
          val (body, bodyArgs) = parse("g" + "." + args.mkString(",")) match {
            case Seq(one) => one
            case other => throw new IllegalArgumentException(
              s"repeat() supports a single out()/in() body, got: ${other.map(_._1)}")
          }
          require(body == "out" || body == "in",
            s"repeat() supports out()/in() bodies, got $body()")
          val (times, timesArgs) = if (rest.hasNext) rest.next() else ("", Nil)
          require(times == "times" && timesArgs.length == 1,
            s"repeat(...) must be followed by .times(n)")
          cur = (1 to timesArgs.head.toInt).foldLeft(cur)((d, _) => hop(body, bodyArgs)(d))
        case ("hasLabel", _) => arity(1); cur = cur.filter(col("label") === args.head)
        case ("has", false) => arity(2); cur = cur.filter(g.propCol(args(0)) === lit(args(1)))
        case ("has", true) => arity(2); cur = cur.filter(col(args(0)) === lit(args(1)))
        case ("out", false) => arity(0, 1); cur = hop("out", args)(cur)
        case ("in", false) => arity(0, 1); cur = hop("in", args)(cur)
        case ("outE", false) => arity(0, 1); cur = g.outE(cur, edgeLabel(args)); onEdges = true
        case ("inE", false) => arity(0, 1); cur = g.inE(cur, edgeLabel(args)); onEdges = true
        case ("inV", true) => arity(0); cur = toVertices("dst"); onEdges = false
        case ("outV", true) => arity(0); cur = toVertices("src"); onEdges = false
        case ("valueMap", false) => arity(0); cur = g.valueMap(cur)
        case ("values", false) =>
          arity(1); cur = cur.select(g.propCol(args.head).as(args.head))
        case ("id", false) => arity(0); cur = g.ids(cur)
        case ("count", _) => arity(0); cur = cur.agg(count(lit(1)).as("count"))
        case ("dedup", _) =>
          // Gremlin dedups traversers by element identity, and Spark cannot
          // set-op MAP columns anyway — dedup on the identity columns.
          cur =
            if (cur.columns.contains("id")) cur.dropDuplicates("id")
            else if (onEdges) cur.dropDuplicates("src", "dst", "label")
            else cur.distinct()
        case ("limit", _) => arity(1); cur = cur.limit(args.head.toInt)
        case ("subgraph", true) =>
          // Side-effect step: capture the edge-induced subgraph of the
          // current edges; the traversal itself continues on those edges
          // (Gremlin passes traversers through subgraph()).
          arity(1)
          val e = cur
          val touched = e.select(col("src").as("id"))
            .union(e.select(col("dst").as("id"))).distinct()
          captured += args.head ->
            PropertyGraph(g.vertices.join(touched, Seq("id"), "left_semi"), e)
        case ("cap", _) =>
          // cap('sg') emits the side-effect value; the console prints a
          // census (`tinkergraph[vertices:183 edges:290]`, README.md:373)
          // and that census is the DataFrame shape we return.
          arity(1)
          val sg = captured.getOrElse(args.head, throw new IllegalArgumentException(
            s"cap('${args.head}') before subgraph('${args.head}') in: $query"))
          cur = sg.V.agg(count(lit(1)).as("vertices"))
            .crossJoin(sg.E.agg(count(lit(1)).as("edges")))
          onEdges = false
        case ("next", _) => arity(0) // console terminal — a no-op here
        case (other, oe) => throw new IllegalArgumentException(
          s"unsupported step $other() on ${if (oe) "edges" else "vertices"} in: $query")
      }
    }
    (cur, captured)
  }

  /** `g.V().hasLabel('x')...` → [(V, []), (hasLabel, [x]), ...]. Scans with
    * balanced parentheses so nested bodies (`repeat(out('in'))`) arrive as
    * a single raw argument. A leading `name = ` assignment (the console's
    * `sg = g.V()...`) is skipped. */
  private[gremlin] def parse(query: String): Seq[(String, Seq[String])] = {
    val s0 = query.trim
    val s = "^[A-Za-z_][A-Za-z0-9_]*\\s*=\\s*".r.findPrefixOf(s0) match {
      case Some(pfx) => s0.substring(pfx.length)
      case None => s0
    }
    require(s.startsWith("g"), s"traversal must start with 'g': $query")
    var i = 1
    val steps = Seq.newBuilder[(String, Seq[String])]
    while (i < s.length) {
      while (i < s.length && (s(i) == '.' || s(i).isWhitespace)) i += 1
      if (i < s.length) {
        val nameStart = i
        while (i < s.length && s(i).isLetter) i += 1
        val name = s.substring(nameStart, i)
        if (name.isEmpty || i >= s.length || s(i) != '(')
          throw new IllegalArgumentException(s"cannot parse traversal at: '${s.substring(nameStart)}'")
        var depth = 1
        val argStart = i + 1
        i += 1
        while (i < s.length && depth > 0) {
          if (s(i) == '(') depth += 1
          else if (s(i) == ')') depth -= 1
          i += 1
        }
        if (depth != 0)
          throw new IllegalArgumentException(s"unbalanced parentheses in: $query")
        val raw = s.substring(argStart, i - 1).trim
        // A nested step body stays one raw argument; plain args split.
        val args = if (raw.contains("(")) Seq(raw) else parseArgs(raw)
        steps += ((name, args))
      }
    }
    steps.result()
  }

  /** Comma-separated args; quoted values lose their quotes. (The supported
    * subset has no commas inside string literals.) */
  private def parseArgs(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map { a =>
      if ((a.startsWith("'") && a.endsWith("'") && a.length >= 2) ||
        (a.startsWith("\"") && a.endsWith("\"") && a.length >= 2)) a.substring(1, a.length - 1)
      else a
    }.toSeq
}
