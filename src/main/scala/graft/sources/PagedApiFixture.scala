package graft.sources

/** In-process loopback HTTP fixture serving deterministic paged corpora —
  * lets the LIVE [[PagedApiSource]] transport run under the driver's
  * correctness gates (`b01_paged_http_ingest`, `b02_paged_groups_ingest`,
  * `sw22_stream_paged_ingest`) with zero egress: the "API" is this JVM
  * (`com.sun.net.httpserver`, ships with the JDK).
  *
  * The server starts lazily on an ephemeral 127.0.0.1 port and lives for
  * the session (the JVM reclaims the socket at exit). Gate scope is
  * local-mode by design: in `local[*]` the executor threads share the
  * driver JVM, so the loopback URL resolves for every partition reader;
  * a real cluster points the connector at a real API instead.
  *
  * Two entity kinds, mirroring the reference walking users AND groups
  * with one pagination discipline (main.go:221-320):
  *
  *   - `/users` — user n = page·pageSize + idx has email
  *     `fix{n}@example.test` and isExternal = (n % 5 == 0). The
  *     connector's DEFAULT shape.
  *   - `/groups` — group n has groupEmail `grp{n}@example.test`,
  *     directMembers = n % 17, adminCreated = (n % 3 == 0). Read via the
  *     `itemsKey`/`fields` options — the b02 gate proving the mapped-
  *     shape path end-to-end under the oracle.
  *
  * `pages` is carried in the query string so one server serves any
  * configuration, and `nextPageToken` chains for the token-walk mode.
  */
object PagedApiFixture {

  /** The deterministic users page body — THE single definition of the row
    * formula (PagedApiSourceSpec's fail-injecting fixture and the b01/
    * sw22 oracles all replay this exact contract). */
  def pageBody(pages: Int, pageSize: Int, page: Int): String = {
    val users = (0 until pageSize).map { i =>
      val n = page * pageSize + i
      s"""{"email":"fix$n@example.test","isExternal":${n % 5 == 0}}"""
    }.mkString(",")
    val next = if (page + 1 < pages) s""","nextPageToken":"${page + 1}"""" else ""
    s"""{"users":[$users]$next}"""
  }

  /** The deterministic groups page body — the b02 oracle's contract. Its
    * objects deliberately carry an extra field (`kind`) the mapping does
    * not project, proving extra-field tolerance on the live path. */
  def groupsBody(pages: Int, pageSize: Int, page: Int): String = {
    val groups = (0 until pageSize).map { i =>
      val n = page * pageSize + i
      s"""{"kind":"directory#group","groupEmail":"grp$n@example.test",""" +
        s""""directMembers":${n % 17},"adminCreated":${n % 3 == 0}}"""
    }.mkString(",")
    val next = if (page + 1 < pages) s""","nextPageToken":"${page + 1}"""" else ""
    s"""{"groups":[$groups]$next}"""
  }

  /** Parse pages/pageSize/pageToken from a fixture request query. A
    * malformed pageToken throws NumberFormatException — the handler maps
    * it to HTTP 400 (the transport treats 4xx as a no-retry caller bug,
    * so a bad request fails fast instead of burning the retry budget). */
  def pageParams(query: String): (Int, Int, Int) = {
    val params = Option(query).getOrElse("").split("&").filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    val tok = params.getOrElse("pageToken", "")
    (params.getOrElse("pages", "4").toInt,
      params.getOrElse("pageSize", "100").toInt,
      if (tok.isEmpty) 0 else tok.toInt)
  }

  /** Wire one paged-corpus handler: parse params, render the body, always
    * close the exchange (try/finally — with the server's calling-thread
    * executor an unclosed exchange would block the client until its read
    * timeout), and turn a malformed request into a fast 400. */
  private def handler(body: (Int, Int, Int) => String): com.sun.net.httpserver.HttpHandler =
    (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val resp =
          try Right(body.tupled(pageParams(ex.getRequestURI.getQuery)))
          catch { case e: Exception => Left(s"bad request: ${e.getMessage}") }
        resp match {
          case Right(json) =>
            val bytes = json.getBytes("UTF-8")
            ex.getResponseHeaders.add("Content-Type", "application/json")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          case Left(msg) =>
            val bytes = msg.getBytes("UTF-8")
            ex.sendResponseHeaders(400, bytes.length)
            ex.getResponseBody.write(bytes)
        }
      } finally ex.close()
    }

  private lazy val server: com.sun.net.httpserver.HttpServer = {
    val s = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/users", handler(pageBody))
    s.createContext("/groups", handler(groupsBody))
    // start() from a daemon thread: the JDK's HTTP-Dispatcher thread
    // inherits daemon status from its creator, so the fixture can never
    // keep a gate JVM alive after main() returns (a non-daemon dispatcher
    // hangs Verify exactly at DestroyJavaVM).
    val starter = new Thread(() => s.start(), "paged-fixture-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    s
  }

  lazy val baseUrl: String =
    s"http://127.0.0.1:${server.getAddress.getPort}/users"

  lazy val groupsUrl: String =
    s"http://127.0.0.1:${server.getAddress.getPort}/groups"
}
