package graft.sources

import java.util
import scala.jdk.CollectionConverters._
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
  * Response shape is an OPTION, not a hard-coded struct — the reference
  * walks six entity kinds with the same pagination discipline (users,
  * groups, members, service accounts, roles, buckets; main.go:221-713),
  * and one connector class per shape is not the DSv2 way:
  *
  *   - `itemsKey` (default `users`): the top-level array holding the
  *     page's items.
  *   - `fields` (default `email:string,isExternal:boolean`): ordered
  *     `name:type` list projected out of each item object (types:
  *     string|boolean|int|long|double). Missing field or wrong type in
  *     any item throws — ingestion that silently drops or coerces rows
  *     is worse than one that stops. The output schema appends `page`
  *     and `idx` provenance columns.
  *
  * Authentication mirrors the reference's authorized Directory client
  * (main.go:740-776 builds a JWT config and walks with its token):
  *
  *   - `header.<Name>=<value>` options attach arbitrary HTTP headers to
  *     every request (API keys, custom auth schemes).
  *   - `bearerTokenEnv=<VAR>` resolves `$VAR` INSIDE the partition reader
  *     (executor-side) and sends `Authorization: Bearer <token>` — the
  *     secret never rides the query plan or the options map that Spark
  *     logs/checkpoints; each executor reads it from its own environment,
  *     the standard secret-distribution channel on a real cluster. A
  *     missing variable fails loudly at first fetch.
  *   - `bearerToken=<value>` inlines the token (tests/dev only — it IS
  *     visible in the plan; production uses `bearerTokenEnv`).
  *   - `tokenUrl=<endpoint>` switches to the OAuth2 JWT-bearer grant
  *     ([[JwtGrant]]): the transport MINTS its own access token — RS256-
  *     sign an assertion with the service-account key, exchange it at the
  *     endpoint, cache until expiry, refresh on 401 — exactly the
  *     reference's JWTConfigFromJSON + domain-wide `Subject` walk
  *     (main.go:745-776). Companion options: `oauthIssuer` (required),
  *     `oauthScope`, `oauthAudience` (default = tokenUrl), `oauthSubject`
  *     (the impersonated admin), `oauthKey` (inline PKCS#8 PEM, dev) /
  *     `oauthKeyEnv` (env var holding the PEM, production — resolved
  *     executor-side), `oauthLifetimeSec`. Mutually exclusive with the
  *     pre-minted bearer options; one mint per executor JVM, not per task.
  *
  * Rate limiting and retry live in the transport (per-reader minimum
  * request interval + exponential backoff on 429/5xx/IO errors), which is
  * where the reference hooks its limiter (main.go:100-102). 401/403 fail
  * immediately with a credentials hint — retrying a rejected credential
  * only burns the rate budget.
  *
  * Without a `url` option the reader synthesizes deterministic rows —
  * the zero-egress test/bench mode, clearly marked, same (default)
  * schema. PagedApiSourceSpec drives the REAL HTTP path against an
  * in-process `com.sun.net.httpserver` fixture: pagination, retry-on-503,
  * request spacing, auth headers, and the field mapping are all exercised
  * over genuine sockets.
  *
  * Usage:
  *   spark.read.format("graft.sources.PagedApiSource")
  *     .option("pages", 8).option("pageSize", 250)          // synthetic
  *   spark.read.format("graft.sources.PagedApiSource")
  *     .option("url", "http://host/users").option("pages", 8)
  *     .option("mode", "indexed")                            // live HTTP
  *   spark.read.format("graft.sources.PagedApiSource")
  *     .option("url", "http://host/groups")
  *     .option("itemsKey", "groups")
  *     .option("fields", "groupEmail:string,directMembers:long")
  *     .option("bearerTokenEnv", "DIRECTORY_API_TOKEN")      // other shapes
  */
class PagedApiSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedApiSource.schemaFor(
      Option(options.get("fields")).map(PageField.parseList))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties arrive case-preserved here (unlike inferSchema's map).
    val opts = new CaseInsensitiveStringMap(properties)
    // header.<Name> options → request headers. CaseInsensitiveStringMap
    // lowercases keys, which is harmless: HTTP header NAMES are
    // case-insensitive (RFC 9110 §5.1); values keep their case. Sorted
    // for a deterministic send order.
    val headers = opts.entrySet().asScala.toSeq
      .filter(_.getKey.startsWith("header."))
      .map(e => e.getKey.stripPrefix("header.") -> e.getValue)
      .sortBy(_._1)
    // tokenUrl switches the transport from static bearer to the OAuth2
    // JWT-bearer grant: mint + cache + refresh-on-401 (the reference's
    // JWTConfigFromJSON + Subject impersonation, main.go:745-776).
    val oauth = Option(opts.get("tokenurl")).map { tu =>
      JwtGrant.Config(
        tokenUrl = tu,
        issuer = Option(opts.get("oauthissuer")).getOrElse(
          throw new IllegalArgumentException("tokenUrl needs oauthIssuer")),
        scope = opts.getOrDefault("oauthscope", ""),
        audience = opts.getOrDefault("oauthaudience", tu),
        subject = Option(opts.get("oauthsubject")),
        keyPem = Option(opts.get("oauthkey")),
        keyEnv = Option(opts.get("oauthkeyenv")),
        lifetimeSec = opts.getLong("oauthlifetimesec", 3600L))
    }
    new PagedApiTable(PagedApiOptions(
      pages = opts.getInt("pages", 4),
      pagesExplicit = opts.containsKey("pages"),
      pageSize = opts.getInt("pagesize", 100),
      url = Option(opts.get("url")),
      mode = opts.getOrDefault("mode", "indexed"),
      minIntervalMs = opts.getLong("minintervalms", 250L),
      maxRetries = opts.getInt("maxretries", 3),
      pagesPerTrigger = opts.getInt("pagespertrigger", 1),
      itemsKey = opts.getOrDefault("itemskey", "users"),
      fieldsOpt = Option(opts.get("fields")).map(PageField.parseList),
      headers = headers,
      bearerToken = Option(opts.get("bearertoken")),
      bearerTokenEnv = Option(opts.get("bearertokenenv")),
      oauth = oauth))
  }
}

object PagedApiSource {
  /** The default (Directory-users) schema — field columns first, then the
    * `page`/`idx` provenance pair. Kept in this exact legacy order so the
    * long-standing b01/sw22 gate contract is byte-stable. */
  val schema: StructType = StructType(Seq(
    StructField("email", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("isExternal", BooleanType, nullable = false)))

  /** Output schema for a field mapping: mapped fields in option order,
    * then `page`/`idx`. `None` = the legacy default layout above. */
  def schemaFor(fields: Option[Seq[PageField]]): StructType = fields match {
    case None => schema
    case Some(fs) =>
      StructType(fs.map(f => StructField(f.name, f.sparkType, nullable = false)) ++ Seq(
        StructField("page", IntegerType, nullable = false),
        StructField("idx", IntegerType, nullable = false)))
  }
}

/** One `name:type` entry of the `fields` option — a typed projection out
  * of each page item. */
case class PageField(name: String, typ: String) {
  require(PageField.types.contains(typ),
    s"field '$name': unsupported type '$typ' (supported: ${PageField.types.mkString("|")})")
  require(name.nonEmpty, "field name must be non-empty")
  require(!name.equalsIgnoreCase("page") && !name.equalsIgnoreCase("idx"),
    s"field name '$name' collides with the connector's provenance columns")
  def sparkType: DataType = typ match {
    case "string" => StringType
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "double" => DoubleType
  }
}

object PageField {
  private[sources] val types = Set("string", "boolean", "int", "long", "double")
  /** The Directory-users shape the connector defaults to. */
  val legacy: Seq[PageField] =
    Seq(PageField("email", "string"), PageField("isExternal", "boolean"))

  /** Parse `name:type,name:type,...`. */
  def parseList(spec: String): Seq[PageField] = {
    val fs = spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      part.split(":") match {
        case Array(n, t) => PageField(n.trim, t.trim.toLowerCase)
        case _ => throw new IllegalArgumentException(
          s"bad fields entry '$part' — expected name:type")
      }
    }
    require(fs.nonEmpty, s"fields option is empty: '$spec'")
    require(fs.map(_.name.toLowerCase).distinct.length == fs.length,
      s"duplicate field names in '$spec'")
    fs
  }
}

private case class PagedApiOptions(pages: Int, pageSize: Int,
                                   url: Option[String], mode: String,
                                   minIntervalMs: Long, maxRetries: Int,
                                   pagesPerTrigger: Int = 1,
                                   pagesExplicit: Boolean = true,
                                   itemsKey: String = "users",
                                   fieldsOpt: Option[Seq[PageField]] = None,
                                   headers: Seq[(String, String)] = Nil,
                                   bearerToken: Option[String] = None,
                                   bearerTokenEnv: Option[String] = None,
                                   oauth: Option[JwtGrant.Config] = None) {
  require(mode == "indexed" || mode == "token",
    s"mode must be 'indexed' or 'token', got '$mode'")
  // one credential story per read: a minted token and a static bearer
  // sending different Authorization headers would be a silent config bug
  require(oauth.isEmpty || (bearerToken.isEmpty && bearerTokenEnv.isEmpty),
    "tokenUrl (OAuth2 JWT grant) and bearerToken/bearerTokenEnv are " +
      "mutually exclusive — the grant mints its own bearer")
  require(oauth.isEmpty || url.isDefined,
    "tokenUrl needs a url: the zero-egress synthetic reader sends no requests")
  require(pagesPerTrigger >= 1,
    s"pagesPerTrigger must be >= 1, got $pagesPerTrigger")
  // the synthetic (no-url) reader is page-addressed; a token walk over it
  // would silently emit ONE page instead of `pages` — reject the combo
  require(mode == "indexed" || url.isDefined,
    "mode=token needs a url: the zero-egress synthetic reader is " +
      "page-addressed and cannot chain tokens")
  // the synthetic reader emits exactly the legacy users shape; a custom
  // mapping against it would silently produce the WRONG columns
  require(url.isDefined || (fieldsOpt.isEmpty && itemsKey == "users"),
    "itemsKey/fields need a url: the zero-egress synthetic reader only " +
      "emits the default users shape")
  /** Effective field mapping (explicit option or the legacy default). */
  def fields: Seq[PageField] = fieldsOpt.getOrElse(PageField.legacy)
  /** Legacy column layout (email, page, idx, isExternal)? Only when no
    * explicit mapping was given — explicit mappings append page/idx. */
  def legacyLayout: Boolean = fieldsOpt.isEmpty
  /** Token-walk safety ceiling: the user's explicit `pages` bounds the
    * walk; with no explicit option the walk is unbounded by design (a
    * token API's page count is unknowable up front — only the cycle
    * guard applies), so the indexed-mode DEFAULT of 4 never converts a
    * working long walk into a runtime failure. */
  def tokenWalkCeiling: Int = if (pagesExplicit) pages else Int.MaxValue
}

/** One page of typed items, as returned by a transport: each item is the
  * field values in mapping order (String/Boolean/Int/Long/Double). */
case class PageResponse(items: Seq[Seq[Any]], nextPageToken: Option[String])

/** Transport abstraction — one page fetch by token. Implementations run
  * INSIDE executor tasks (construct them there; they need not be
  * serializable when built per-reader). */
trait PageTransport {
  def fetch(pageToken: String): PageResponse
}

/** Real HTTP transport on the JDK's built-in client: GET
  * `url?pageToken=T&pageSize=N`, expecting the fixture/API JSON shape
  * `{"<itemsKey>":[{...},...],"nextPageToken":"T"}`.
  *
  *   - Rate limit: a minimum interval between requests of THIS transport
  *     instance (one instance per partition reader ⇒ per-task limiting —
  *     the cluster-wide rate is interval × parallelism, sized by the
  *     `pages`/`minIntervalMs` options exactly like the reference's
  *     4 req/s client limiter).
  *   - Retry: HTTP 429/5xx and IO errors back off exponentially
  *     (interval, 2×, 4×, ...) up to `maxRetries`, then throw — Spark's
  *     task retry is the outer loop, as the scheduler owns re-execution.
  *   - Auth: `headers` are sent verbatim on every request; `bearerTokenEnv`
  *     resolves lazily HERE (executor-side) so the secret never transits
  *     the driver's plan, and a 401/403 aborts without retry.
  */
class HttpPageTransport(url: String, pageSize: Int,
                        minIntervalMs: Long = 250L,
                        maxRetries: Int = 3,
                        itemsKey: String = "users",
                        fields: Seq[PageField] = PageField.legacy,
                        headers: Seq[(String, String)] = Nil,
                        bearerToken: Option[String] = None,
                        bearerTokenEnv: Option[String] = None,
                        oauth: Option[JwtGrant.Config] = None) extends PageTransport {
  private var lastRequestAt = 0L

  /** The JVM-shared token provider for this grant config (one mint per
    * executor JVM, refresh serialized) — lazy so key resolution happens
    * in the executor task that first fetches. */
  private lazy val tokenProvider: Option[JwtGrant.Provider] =
    oauth.map(JwtGrant.provider)

  /** Static header pairs sent on every request: explicit `header.*`
    * options + a PRE-MINTED bearer if one was configured. Lazy so the env
    * lookup happens in the executor task that first fetches, and a
    * missing variable names itself in the task failure. */
  private lazy val staticHeaders: Seq[(String, String)] = {
    val bearer = bearerTokenEnv match {
      case Some(v) => Some(sys.env.getOrElse(v, throw new IllegalStateException(
        s"bearerTokenEnv '$v' is not set in this executor's environment — " +
          "export it on every executor (e.g. via spark.executorEnv) or use " +
          "explicit header options")))
      case None => bearerToken
    }
    headers ++ bearer.map(t => "Authorization" -> s"Bearer $t")
  }

  /** Headers for ONE request — re-evaluated per attempt because a minted
    * token can expire (and be refreshed) mid-walk, unlike the static
    * pairs. The provider re-mints here when its cache is empty/expired. */
  private def requestHeaders(): Seq[(String, String)] = tokenProvider match {
    case Some(p) => staticHeaders :+ ("Authorization" -> s"Bearer ${p.token()}")
    case None => staticHeaders
  }

  private def pace(): Unit = synchronized {
    val wait = lastRequestAt + minIntervalMs - System.currentTimeMillis()
    if (wait > 0) Thread.sleep(wait)
    lastRequestAt = System.currentTimeMillis()
  }

  override def fetch(pageToken: String): PageResponse = {
    var attempt = 0
    // one refresh per fetch: a minted token that expired mid-walk gets
    // exactly one re-mint-and-retry (the standard refresh-on-401); a
    // SECOND 401 means the credential itself is rejected — retrying
    // would loop a dead key against the API forever
    var refreshed = false
    while (true) {
      pace()
      try {
        val sep = if (url.contains("?")) "&" else "?"
        val full = s"$url${sep}pageToken=${java.net.URLEncoder.encode(pageToken, "UTF-8")}&pageSize=$pageSize"
        val conn = new java.net.URL(full).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(5000)
        conn.setReadTimeout(10000)
        requestHeaders().foreach { case (k, v) => conn.setRequestProperty(k, v) }
        try {
          val code = conn.getResponseCode
          if (code == 200) {
            val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
            return HttpPageTransport.parse(body, itemsKey, fields)
          }
          // drain the error body so the keep-alive connection can be
          // reused instead of leaking a socket per failed attempt
          Option(conn.getErrorStream).foreach(s => { s.readAllBytes(); s.close() })
          if (code == 401 || code == 403) tokenProvider match {
            case Some(p) if !refreshed =>
              // minted token presumed expired: drop it, re-mint, retry —
              // doesn't consume the transient-retry budget (it's not a
              // transient fault, it's the token lifecycle)
              p.invalidate()
              refreshed = true
              throw new HttpPageTransport.RefreshRetry
            case _ => throw new IllegalArgumentException(
              s"GET $full -> HTTP $code — credentials rejected" +
                (if (refreshed) " even after a fresh token mint" else "") +
                " (check header.*/bearerToken/bearerTokenEnv/tokenUrl options)")
          }
          if (code != 429 && code < 500) // 4xx (bar 429) = caller bug, no retry
            throw new IllegalArgumentException(s"GET $full -> HTTP $code")
          throw new HttpPageTransport.Retryable(s"HTTP $code")
        } finally conn.disconnect() // also covers IOException mid-body
      } catch {
        case _: HttpPageTransport.RefreshRetry => // loop again with a fresh mint
        case e @ (_: HttpPageTransport.Retryable | _: java.io.IOException) =>
          attempt += 1
          if (attempt > maxRetries)
            throw new java.io.IOException(
              s"page '$pageToken' failed after $maxRetries retries: ${e.getMessage}", e)
          // exponential backoff; shift clamped so a large maxRetries can
          // never overflow the Long into a negative sleep
          Thread.sleep(minIntervalMs.max(1L) << math.min(attempt - 1, 20))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object HttpPageTransport {
  private class Retryable(msg: String) extends RuntimeException(msg)
  /** Control-flow marker for the refresh-on-401 immediate retry. */
  private class RefreshRetry extends RuntimeException("refresh")

  /** Legacy entry point — the default Directory-users shape. */
  private[graft] def parse(body: String): PageResponse =
    parse(body, "users", PageField.legacy)

  /** Parse one page body with a REAL JSON parser ([[JsonLite]] — escape-
    * aware, nesting-exact), then project the typed fields out of each
    * item. An item MISSING a mapped field, or carrying it at the wrong
    * type, throws — a response the parser cannot fully account for must
    * fail loudly, never silently drop or coerce rows (ingestion that
    * quietly loses users is worse than one that stops). Extra fields are
    * tolerated (APIs add fields; a projection ignores them).
    *
    * `nextPageToken` is read ONLY as a top-level key of the response
    * object — a token-lookalike inside an item's string value or a nested
    * object can never be mistaken for the real one (this was the round-13
    * regex scanner's blind spot). */
  private[graft] def parse(body: String, itemsKey: String,
                           fields: Seq[PageField]): PageResponse = {
    def bad(msg: String): Nothing = throw new java.io.IOException(msg)
    val root = JsonLite.parse(body) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => bad(s"response root is not a JSON object: ${body.take(80)}")
    }
    val arr = root.get(itemsKey) match {
      case Some(v: Vector[_]) => v
      case Some(other) => bad(s""""$itemsKey" is not an array""")
      case None => bad(s"""no "$itemsKey" array in response: ${body.take(200)}""")
    }
    val items = arr.map {
      case o: Map[_, _] =>
        val obj = o.asInstanceOf[Map[String, Any]]
        fields.map { f =>
          val raw = obj.getOrElse(f.name,
            bad(s"item without ${f.name}: ${obj.keys.mkString("{", ",", "}")}"))
          (f.typ, raw) match {
            case ("string", s: String) => s
            case ("boolean", b: java.lang.Boolean) => b
            case ("int", l: java.lang.Long) if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
            case ("long", l: java.lang.Long) => l
            case ("double", d: java.lang.Double) => d
            case ("double", l: java.lang.Long) => l.toDouble // 3 and 3.0 both legal JSON doubles
            case _ => bad(s"field ${f.name}: expected ${f.typ}, got " +
              s"${if (raw == null) "null" else raw.getClass.getSimpleName} ($raw)")
          }
        }
      case other => bad(s""""$itemsKey" entry is not an object: $other""")
    }
    val next = root.get("nextPageToken") match {
      case Some(s: String) => Some(s).filter(_.nonEmpty)
      case Some(other) => bad(s"nextPageToken is not a string: $other")
      case None => None
    }
    PageResponse(items, next)
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
            p.opts.minIntervalMs, p.opts.maxRetries,
            p.opts.itemsKey, p.opts.fields,
            p.opts.headers, p.opts.bearerToken, p.opts.bearerTokenEnv,
            p.opts.oauth)
          // in token mode an EXPLICIT `pages` is the safety ceiling on
          // the walk (exceeding it throws loudly); with no explicit
          // option only the cycle guard bounds it — see tokenWalkCeiling
          if (p.opts.mode == "token")
            new TokenWalkReader(transport, p.opts.tokenWalkCeiling, p.opts.legacyLayout)
          else new IndexedPageReader(p.page, transport, p.opts.legacyLayout)
        case None => new SyntheticPageReader(p.page, p.opts.pageSize)
      }
    }

  /** Item values (parse-typed) + provenance → an InternalRow in the
    * table's schema order. The legacy layout interleaves page/idx between
    * email and isExternal (the long-standing b01 contract); explicit
    * mappings append them after the mapped fields. */
  def toRow(item: Seq[Any], page: Int, idx: Int, legacyLayout: Boolean): InternalRow = {
    def cat(v: Any): Any = v match {
      case s: String => UTF8String.fromString(s)
      case other => other
    }
    if (legacyLayout) InternalRow(cat(item.head), page, idx, item(1))
    else InternalRow.fromSeq(item.map(cat) ++ Seq(page, idx))
  }
}

private class PagedApiTable(opts: PagedApiOptions) extends Table with SupportsRead {
  override def name(): String =
    s"paged_api(pages=${opts.pages}, pageSize=${opts.pageSize}, " +
      s"mode=${opts.mode}, itemsKey=${opts.itemsKey}, " +
      s"url=${opts.url.getOrElse("<synthetic>")})"
  override def schema(): StructType = PagedApiSource.schemaFor(opts.fieldsOpt)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = PagedApiSource.schemaFor(opts.fieldsOpt)
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
  * container has no network). Same schema as the live readers' default
  * shape. */
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
private class IndexedPageReader(page: Int, transport: PageTransport,
                                legacyLayout: Boolean)
  extends PartitionReader[InternalRow] {
  private lazy val items = transport.fetch(page.toString).items
  private var i = -1
  override def next(): Boolean = { i += 1; i < items.length }
  override def get(): InternalRow =
    PagedApiSourceInternals.toRow(items(i), page, i, legacyLayout)
  override def close(): Unit = ()
}

/** Live reader, token mode: chains nextPageToken serially — the
  * reference's main.go:193-218 loop, rate-limited by the transport.
  * Guarded against misbehaving APIs: a token seen before (a cycle, e.g.
  * from an inconsistent load balancer) and a walk longer than `maxPages`
  * both throw instead of looping forever / silently truncating. */
private class TokenWalkReader(transport: PageTransport,
                              maxPages: Int = Int.MaxValue,
                              legacyLayout: Boolean = true)
  extends PartitionReader[InternalRow] {
  private var page = -1
  private var token: Option[String] = Some("")
  private val seen = scala.collection.mutable.Set.empty[String]
  private var items: Seq[Seq[Any]] = Nil
  private var i = -1
  @annotation.tailrec
  private def advance(): Boolean = {
    i += 1
    if (i < items.length) true
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
        items = resp.items
        token = resp.nextPageToken
        i = -1
        advance()
      case None => false
    }
  }
  override def next(): Boolean = advance()
  override def get(): InternalRow =
    PagedApiSourceInternals.toRow(items(i), page, i, legacyLayout)
  override def close(): Unit = ()
}
