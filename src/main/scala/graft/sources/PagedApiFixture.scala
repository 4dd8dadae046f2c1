package graft.sources

/** In-process loopback HTTP fixture serving a deterministic paged-user
  * corpus — lets the LIVE [[PagedApiSource]] transport run under the
  * driver's correctness gate (`b01_paged_http_ingest`) with zero egress:
  * the "API" is this JVM (`com.sun.net.httpserver`, ships with the JDK).
  *
  * The server starts lazily on an ephemeral 127.0.0.1 port and lives for
  * the session (the JVM reclaims the socket at exit). Gate scope is
  * local-mode by design: in `local[*]` the executor threads share the
  * driver JVM, so the loopback URL resolves for every partition reader;
  * a real cluster points the connector at a real API instead.
  *
  * Row formula (the oracle's contract): user n = page·pageSize + idx has
  * email `fix{n}@example.test` and isExternal = (n % 5 == 0). `pages` is
  * carried in the query string so one server serves any configuration,
  * and `nextPageToken` chains for the token-walk mode.
  */
object PagedApiFixture {

  /** The deterministic page body — THE single definition of the row
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

  /** Parse pages/pageSize/pageToken from a fixture request query. */
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

  lazy val baseUrl: String = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/users", (ex: com.sun.net.httpserver.HttpExchange) => {
      val (pages, pageSize, page) = pageParams(ex.getRequestURI.getQuery)
      val bytes = pageBody(pages, pageSize, page).getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    // start() from a daemon thread: the JDK's HTTP-Dispatcher thread
    // inherits daemon status from its creator, so the fixture can never
    // keep a gate JVM alive after main() returns (a non-daemon dispatcher
    // hangs Verify exactly at DestroyJavaVM).
    val starter = new Thread(() => server.start(), "paged-fixture-start")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    s"http://127.0.0.1:${server.getAddress.getPort}/users"
  }
}
