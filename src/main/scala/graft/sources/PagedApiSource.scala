package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** B1 — paginated source scan as a proper DataSource V2 connector with a
  * PLUGGABLE transport.
  *
  * The reference walks the Directory API page by page in one goroutine,
  * throttled to 4 req/s with retries (main.go:189-219, 100-102) —
  * pagination there is a *serial* concern. Here the transport is a real
  * HTTP client ([[HttpPageTransport]]: JDK `HttpURLConnection`, no
  * dependencies) behind a [[PageTransport]] trait, and the connector
  * supports both pagination disciplines real APIs come in:
  *
  *   - `mode=indexed` (default): the API addresses pages by number, so
  *     each page is an [[InputPartition]] — a 1000-executor cluster
  *     fetches 1000 pages concurrently and Spark's scheduler handles
  *     retry/locality. This is the 100 TB shape.
  *   - `mode=token`: the API only hands out opaque `nextPageToken`s (the
  *     reference's Directory API shape), which serializes the walk by
  *     construction — ONE partition whose reader chains tokens exactly
  *     like main.go:193-218, with the same per-client rate limit and
  *     retry. No fake parallelism where the protocol forbids it.
  *
  * Rate limiting and retry live in the transport (per-reader minimum
  * request interval + exponential backoff on 429/5xx/IO errors), which is
  * where the reference hooks its limiter (main.go:100-102).
  *
  * Without a `url` option the reader synthesizes deterministic rows —
  * the zero-egress test/bench mode, clearly marked, same schema.
  * PagedApiSourceSpec drives the REAL HTTP path against an in-process
  * `com.sun.net.httpserver` fixture: pagination, retry-on-503, and
  * request spacing are all exercised over genuine sockets.
  *
  * Usage:
  *   spark.read.format("graft.sources.PagedApiSource")
  *     .option("pages", 8).option("pageSize", 250)          // synthetic
  *   spark.read.format("graft.sources.PagedApiSource")
  *     .option("url", "http://host/users").option("pages", 8)
  *     .option("mode", "indexed")                            // live HTTP
  */
class PagedApiSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedApiSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties arrive case-preserved here (unlike inferSchema's map).
    val opts = new CaseInsensitiveStringMap(properties)
    new PagedApiTable(PagedApiOptions(
      pages = opts.getInt("pages", 4),
      pagesExplicit = opts.containsKey("pages"),
      pageSize = opts.getInt("pagesize", 100),
      url = Option(opts.get("url")),
      mode = opts.getOrDefault("mode", "indexed"),
      minIntervalMs = opts.getLong("minintervalms", 250L),
      maxRetries = opts.getInt("maxretries", 3),
      pagesPerTrigger = opts.getInt("pagespertrigger", 1)))
  }
}

object PagedApiSource {
  val schema: StructType = StructType(Seq(
    StructField("email", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("isExternal", BooleanType, nullable = false)))
}

private case class PagedApiOptions(pages: Int, pageSize: Int,
                                   url: Option[String], mode: String,
                                   minIntervalMs: Long, maxRetries: Int,
                                   pagesPerTrigger: Int = 1,
                                   pagesExplicit: Boolean = true) {
  require(mode == "indexed" || mode == "token",
    s"mode must be 'indexed' or 'token', got '$mode'")
  require(pagesPerTrigger >= 1,
    s"pagesPerTrigger must be >= 1, got $pagesPerTrigger")
  // the synthetic (no-url) reader is page-addressed; a token walk over it
  // would silently emit ONE page instead of `pages` — reject the combo
  require(mode == "indexed" || url.isDefined,
    "mode=token needs a url: the zero-egress synthetic reader is " +
      "page-addressed and cannot chain tokens")
  /** Token-walk safety ceiling: the user's explicit `pages` bounds the
    * walk; with no explicit option the walk is unbounded by design (a
    * token API's page count is unknowable up front — only the cycle
    * guard applies), so the indexed-mode DEFAULT of 4 never converts a
    * working long walk into a runtime failure. */
  def tokenWalkCeiling: Int = if (pagesExplicit) pages else Int.MaxValue
}

/** One page of users, as returned by a transport. */
case class PagedUser(email: String, isExternal: Boolean)
case class PageResponse(users: Seq[PagedUser], nextPageToken: Option[String])

/** Transport abstraction — one page fetch by token. Implementations run
  * INSIDE executor tasks (construct them there; they need not be
  * serializable when built per-reader). */
trait PageTransport {
  def fetch(pageToken: String): PageResponse
}

/** Real HTTP transport on the JDK's built-in client: GET
  * `url?pageToken=T&pageSize=N`, expecting the fixture/API JSON shape
  * `{"users":[{"email":"...","isExternal":false},...],"nextPageToken":"T"}`.
  *
  *   - Rate limit: a minimum interval between requests of THIS transport
  *     instance (one instance per partition reader ⇒ per-task limiting —
  *     the cluster-wide rate is interval × parallelism, sized by the
  *     `pages`/`minIntervalMs` options exactly like the reference's
  *     4 req/s client limiter).
  *   - Retry: HTTP 429/5xx and IO errors back off exponentially
  *     (interval, 2×, 4×, ...) up to `maxRetries`, then throw — Spark's
  *     task retry is the outer loop, as the scheduler owns re-execution.
  */
class HttpPageTransport(url: String, pageSize: Int,
                        minIntervalMs: Long = 250L,
                        maxRetries: Int = 3) extends PageTransport {
  private var lastRequestAt = 0L

  private def pace(): Unit = synchronized {
    val wait = lastRequestAt + minIntervalMs - System.currentTimeMillis()
    if (wait > 0) Thread.sleep(wait)
    lastRequestAt = System.currentTimeMillis()
  }

  override def fetch(pageToken: String): PageResponse = {
    var attempt = 0
    while (true) {
      pace()
      try {
        val sep = if (url.contains("?")) "&" else "?"
        val full = s"$url${sep}pageToken=${java.net.URLEncoder.encode(pageToken, "UTF-8")}&pageSize=$pageSize"
        val conn = new java.net.URL(full).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(5000)
        conn.setReadTimeout(10000)
        try {
          val code = conn.getResponseCode
          if (code == 200) {
            val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
            return HttpPageTransport.parse(body)
          }
          // drain the error body so the keep-alive connection can be
          // reused instead of leaking a socket per failed attempt
          Option(conn.getErrorStream).foreach(s => { s.readAllBytes(); s.close() })
          if (code != 429 && code < 500) // 4xx (bar 429) = caller bug, no retry
            throw new IllegalArgumentException(s"GET $full -> HTTP $code")
          throw new HttpPageTransport.Retryable(s"HTTP $code")
        } finally conn.disconnect() // also covers IOException mid-body
      } catch {
        case e @ (_: HttpPageTransport.Retryable | _: java.io.IOException) =>
          attempt += 1
          if (attempt > maxRetries)
            throw new java.io.IOException(
              s"page '$pageToken' failed after $maxRetries retries: ${e.getMessage}", e)
          Thread.sleep(minIntervalMs.max(1L) << (attempt - 1)) // exponential backoff
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object HttpPageTransport {
  private class Retryable(msg: String) extends RuntimeException(msg)

  /** Minimal parser for the response contract above — hand-rolled so the
    * connector stays dependency-free (the classpath ships no JSON library
    * beyond Spark's internals). Each object inside `"users":[...]` is
    * parsed field-by-field (any field order, extra fields tolerated), and
    * an object MISSING email or isExternal throws — a response the parser
    * cannot fully account for must fail loudly, never silently drop rows
    * (ingestion that quietly loses users is worse than one that stops).
    * String escapes inside emails are out of contract. */
  private[graft] def parse(body: String): PageResponse = {
    val arrStart = """"users"\s*:\s*\[""".r.findFirstMatchIn(body).getOrElse(
      throw new java.io.IOException(s"no \"users\" array in response: ${body.take(200)}")).end
    // Find the array's own closing ']': track string state (a ']' or '}'
    // inside an email is in-contract data, not structure) and brace depth.
    var i = arrStart
    var depth = 0
    var inStr = false
    var arrEnd = -1
    while (arrEnd < 0 && i < body.length) {
      body.charAt(i) match {
        case '"' => inStr = !inStr // escaped quotes are out of contract
        case '{' if !inStr => depth += 1
        case '}' if !inStr => depth -= 1
        case ']' if !inStr && depth == 0 => arrEnd = i
        case _ =>
      }
      i += 1
    }
    if (arrEnd < 0) throw new java.io.IOException("unterminated \"users\" array")
    val arr = body.substring(arrStart, arrEnd)
    // Slice the array into objects with the same string-aware scan (a
    // brace inside an email must not split an object).
    val objs = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    var objStart = -1
    var d = 0
    var s = false
    while (j < arr.length) {
      arr.charAt(j) match {
        case '"' => s = !s
        case '{' if !s => if (d == 0) objStart = j; d += 1
        case '}' if !s => d -= 1; if (d == 0) objs += arr.substring(objStart, j + 1)
        case _ =>
      }
      j += 1
    }
    val emailRe = """"email"\s*:\s*"([^"]*)"""".r
    val extRe = """"isExternal"\s*:\s*(true|false)""".r
    val users = objs.map { obj =>
      val email = emailRe.findFirstMatchIn(obj).map(_.group(1)).getOrElse(
        throw new java.io.IOException(s"user object without email: $obj"))
      val ext = extRe.findFirstMatchIn(obj).map(_.group(1).toBoolean).getOrElse(
        throw new java.io.IOException(s"user object without isExternal: $obj"))
      PagedUser(email, ext)
    }.toSeq
    val tokenRe = """"nextPageToken"\s*:\s*"([^"]*)"""".r
    val next = tokenRe.findFirstMatchIn(body).map(_.group(1)).filter(_.nonEmpty)
    PageResponse(users, next)
  }
}

private object PagedApiSourceInternals {
  /** Shared by the batch Scan and the micro-batch stream: construct the
    * right reader for one page partition (live HTTP, token walk, or the
    * synthetic zero-egress default). */
  val readerFactory: PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[PagedApiPartition]
      p.opts.url match {
        case Some(u) =>
          val transport = new HttpPageTransport(u, p.opts.pageSize,
            p.opts.minIntervalMs, p.opts.maxRetries)
          // in token mode an EXPLICIT `pages` is the safety ceiling on
          // the walk (exceeding it throws loudly); with no explicit
          // option only the cycle guard bounds it — see tokenWalkCeiling
          if (p.opts.mode == "token")
            new TokenWalkReader(transport, p.opts.tokenWalkCeiling)
          else new IndexedPageReader(p.page, transport)
        case None => new SyntheticPageReader(p.page, p.opts.pageSize)
      }
    }
}

private class PagedApiTable(opts: PagedApiOptions) extends Table with SupportsRead {
  override def name(): String =
    s"paged_api(pages=${opts.pages}, pageSize=${opts.pageSize}, " +
      s"mode=${opts.mode}, url=${opts.url.getOrElse("<synthetic>")})"
  override def schema(): StructType = PagedApiSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedApiSource.schema
      override def toBatch: Batch = this
      // indexed: one partition per API page — the pagination boundary IS
      // the parallelism boundary. token: the protocol serializes the walk,
      // so it is ONE partition by construction.
      override def planInputPartitions(): Array[InputPartition] =
        if (opts.mode == "token") Array(PagedApiPartition(0, opts))
        else (0 until opts.pages).map(p => PagedApiPartition(p, opts): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        PagedApiSourceInternals.readerFactory
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PagedApiMicroBatchStream(opts)
    }
}

/** Incremental ingestion: the paged API as a Structured Streaming
  * micro-batch source. The offset IS the page number (pages fully
  * ingested so far), so restart-from-checkpoint resumes mid-corpus with
  * exactly-once page accounting — the production shape for "keep pulling
  * the directory while it grows". Admission control bounds each trigger
  * to `pagesPerTrigger` pages (default 1), the `maxOffsetsPerTrigger`
  * discipline every long-running ingest needs so one trigger never
  * swallows the whole backlog. Indexed pagination only: a token-chained
  * API cannot seek to an offset, so streaming it is a contradiction —
  * rejected loudly at stream construction. */
private class PagedApiMicroBatchStream(opts: PagedApiOptions)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  require(opts.mode == "indexed",
    "streaming needs offset-addressable pages (mode=indexed); a " +
      "nextPageToken chain cannot seek and so cannot be a streaming offset")

  // Trigger.AvailableNow contract: capture the availability bound once at
  // query start. Ours is the configured page count already (a growing API
  // would snapshot its current page count here), so this is a no-op —
  // implementing the trait keeps Spark from wrapping the source and
  // overriding per-batch admission with allAvailable().
  override def prepareForTriggerAvailableNow(): Unit = ()

  private def page(o: Offset): Int = o match {
    case p: PagedApiPageOffset => p.page
    case other => throw new IllegalArgumentException(s"alien offset $other")
  }
  override def initialOffset(): Offset = PagedApiPageOffset(0)
  override def deserializeOffset(json: String): Offset =
    PagedApiPageOffset("""\d+""".r.findFirstIn(json).getOrElse(
      throw new IllegalArgumentException(s"bad offset json: $json")).toInt)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called (SupportsAdmissionControl)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = page(start)
    val step = limit match {
      case r: ReadMaxRows => math.max(1L, r.maxRows() / opts.pageSize).toInt
      // Trigger.AvailableNow's wrapper captures the availability bound
      // with allAvailable() once at start; per-trigger admission still
      // comes from getDefaultReadLimit on each micro-batch.
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable =>
        opts.pages
      case _ => opts.pagesPerTrigger
    }
    // never below `from`: a restart with a SMALLER pages option must not
    // rewind the checkpointed offset (a later restart with the original
    // value would then re-ingest pages — duplicate rows in append sinks)
    PagedApiPageOffset(math.max(from, math.min(opts.pages, from + step)))
  }
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(opts.pagesPerTrigger.toLong * opts.pageSize)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    (page(start) until page(end))
      .map(p => PagedApiPartition(p, opts): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    PagedApiSourceInternals.readerFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class PagedApiPageOffset(page: Int)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"page":$page}"""
}

private case class PagedApiPartition(page: Int, opts: PagedApiOptions)
  extends InputPartition

/** Deterministic fake rows — the zero-egress test/bench mode (this
  * container has no network). Same schema as the live readers. */
private class SyntheticPageReader(page: Int, pageSize: Int)
  extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < pageSize }
  override def get(): InternalRow = {
    val n = page * pageSize + i
    InternalRow(
      UTF8String.fromString(s"user$n@domain.example"),
      page, i, n % 7 == 0)
  }
  override def close(): Unit = ()
}

/** Live reader, indexed mode: fetches exactly one page (token = the page
  * number) over the real transport. Runs in the executor task. */
private class IndexedPageReader(page: Int, transport: PageTransport)
  extends PartitionReader[InternalRow] {
  private lazy val users = transport.fetch(page.toString).users
  private var i = -1
  override def next(): Boolean = { i += 1; i < users.length }
  override def get(): InternalRow = InternalRow(
    UTF8String.fromString(users(i).email), page, i, users(i).isExternal)
  override def close(): Unit = ()
}

/** Live reader, token mode: chains nextPageToken serially — the
  * reference's main.go:193-218 loop, rate-limited by the transport.
  * Guarded against misbehaving APIs: a token seen before (a cycle, e.g.
  * from an inconsistent load balancer) and a walk longer than `maxPages`
  * both throw instead of looping forever / silently truncating. */
private class TokenWalkReader(transport: PageTransport,
                              maxPages: Int = Int.MaxValue)
  extends PartitionReader[InternalRow] {
  private var page = -1
  private var token: Option[String] = Some("")
  private val seen = scala.collection.mutable.Set.empty[String]
  private var users: Seq[PagedUser] = Nil
  private var i = -1
  @annotation.tailrec
  private def advance(): Boolean = {
    i += 1
    if (i < users.length) true
    else token match {
      case Some(t) =>
        if (!seen.add(t)) throw new IllegalStateException(
          s"pageToken '$t' re-issued by the API — token cycle detected, " +
            "the walk would loop forever emitting duplicate rows")
        if (page + 1 >= maxPages) throw new IllegalStateException(
          s"token walk exceeded maxPages=$maxPages with more pages " +
            "pending — raise the 'pages' ceiling or fix the API")
        val resp = transport.fetch(t)
        page += 1 // page = fetch ordinal, matching indexed mode's numbering
        users = resp.users
        token = resp.nextPageToken
        i = -1
        advance()
      case None => false
    }
  }
  override def next(): Boolean = advance()
  override def get(): InternalRow = InternalRow(
    UTF8String.fromString(users(i).email), page, i, users(i).isExternal)
  override def close(): Unit = ()
}
