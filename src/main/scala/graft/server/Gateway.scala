package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.DataFrame

import graft.ast.Json
import graft.exec.BatchExecutor
import graft.model.GraphStore

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Minimal HTTP façade mirroring the reference gateway surface:
  * `POST /v1/query` accepts the DynamicQueryRequest envelope and
  * returns JSON keyed by the batch's returned variable names
  * (sdks/rust/src/lib.rs:244-247; default local port 6969,
  * helix-cli/src/config.rs:7). Built on the JDK's HttpServer —
  * no extra dependencies.
  */
class Gateway(@volatile private var store: GraphStore, port: Int = 6969,
    maxResponseRows: Int = 10000) {

  private var server: HttpServer = _
  private val stored =
    new java.util.concurrent.ConcurrentHashMap[String, QueryBundle.StoredRoute]()
  /** Stored routes that have executed at least once — the `x-helix-warm`
    * serving gate (sdks/rust/src/lib.rs:279-287).
    */
  private val warm = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def currentStore: GraphStore = store

  /** Deploy a stored query (the reference's registered-query surface:
    * `#[register]` fn -> queries.json bundle -> POST /v1/query/<name>
    * with a JSON params body, SURVEY §3.3).
    */
  def registerQuery(name: String, batch: graft.ast.Batch,
      params: Seq[(String, QueryBundle.PTy)] = Nil): Unit = {
    stored.put(name, QueryBundle.StoredRoute(batch, params, batch.write))
    warm.remove(name) // a replaced route is a new, cold query
  }

  /** Deploy every route of a `queries.json` bundle (v4/v5); returns the
    * number of routes loaded. Mirrors read_query_bundle_from_path +
    * route registration (query_generator.rs:150-236).
    */
  def loadBundle(json: String): Int = {
    val routes = QueryBundle.parse(json)
    routes.foreach { case (n, r) => stored.put(n, r); warm.remove(n) }
    routes.size
  }

  /** The currently-deployed routes as a v5 bundle document. */
  def renderBundle: String = {
    import scala.jdk.CollectionConverters._
    QueryBundle.render(stored.asScala.toMap)
  }

  def isWarm(name: String): Boolean = warm.contains(name)

  /** Execute a stored query with a plain JSON parameters object;
    * declared parameter shapes coerce (RFC3339 DateTime, F32 narrowing,
    * element-wise arrays; Bytes rejects).
    */
  def handleStored(name: String, paramsJson: String): String = {
    val route = Option(stored.get(name))
      .getOrElse(throw new IllegalArgumentException(s"unknown stored query: $name"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = if (paramsJson.trim.isEmpty) mapper.createObjectNode()
      else mapper.readTree(paramsJson)
    val types = route.params.toMap
    val params = tree.properties().iterator()
    val pmap = scala.collection.mutable.Map.empty[String, graft.ast.PropertyValue]
    while (params.hasNext) {
      val e = params.next()
      val raw = Json.readParamValue(e.getValue)
      pmap(e.getKey) = types.get(e.getKey).map(QueryBundle.coerce(raw, _)).getOrElse(raw)
    }
    val exec = new BatchExecutor(store, pmap.toMap)
    val out = exec.execute(route.batch)
    if (route.batch.write) {
      store = out.store; graft.search.IndexCache.evictOthers(store.version)
    }
    warm.add(name)
    out.results.toSeq.sortBy(_._1)
      .map { case (k, df) => "\"" + k + "\":" + renderDf(df) }
      .mkString("{", ",", "}")
  }

  /** Render a result frame: single-row single-column -> scalar;
    * otherwise an array of row objects (CLI prints raw JSON,
    * commands/query.rs:93-101).
    *
    * Hand-rolled writer instead of Dataset.toJSON: toJSON OMITS
    * null-valued fields (row objects would silently lose null
    * properties, and a single null scalar NPE'd the unwrap path);
    * the reference's JSON carries explicit nulls. Responses cap at
    * `maxResponseRows` so one unbounded query can't buffer the whole
    * table into a driver string.
    */
  /** Set when the last handled request's rendering hit the row cap —
    * surfaced as the `x-graft-truncated` response header. (The default
    * HttpServer executor serves requests on one thread, so a plain
    * field is race-free on the HTTP path.)
    */
  @volatile private var lastTruncated = false

  private def renderDf(df: DataFrame): String = {
    val collected = df.limit(maxResponseRows + 1).collect()
    val rows =
      if (collected.length > maxResponseRows) { lastTruncated = true; collected.take(maxResponseRows) }
      else collected
    val names = df.columns
    val sb = new StringBuilder
    def writeVal(v: Any): Unit = v match {
      case null => sb.append("null")
      case s: String => sb.append(quote(s))
      case b: Boolean => sb.append(b)
      case d: Double =>
        if (d.isNaN || d.isInfinite) sb.append(quote(d.toString)) else sb.append(d)
      case f: Float =>
        // Float's own shortest representation — widening to double
        // would print 0.1f as 0.10000000149011612
        if (f.isNaN || f.isInfinite) sb.append(quote(f.toString)) else sb.append(f.toString)
      case d: java.math.BigDecimal => sb.append(d.toPlainString)
      case t: java.time.LocalDateTime =>
        // fixed second precision: LocalDateTime.toString drops ":00"
        // seconds, yielding two formats in one column
        sb.append(quote(if (t.getNano == 0)
          t.format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
        else t.toString))
      case t: java.sql.Timestamp => sb.append(quote(t.toInstant.toString))
      case t: java.time.Instant => sb.append(quote(t.toString))
      case d: java.sql.Date => sb.append(quote(d.toString))
      case b: Array[Byte] =>
        sb.append(quote(java.util.Base64.getEncoder.encodeToString(b)))
      case seq: scala.collection.Seq[_] =>
        sb.append('[')
        var first = true
        seq.foreach { x => if (!first) sb.append(','); first = false; writeVal(x) }
        sb.append(']')
      case m: scala.collection.Map[_, _] =>
        sb.append('{')
        var first = true
        m.foreach { case (k, x) =>
          if (!first) sb.append(','); first = false
          sb.append(quote(String.valueOf(k))).append(':'); writeVal(x)
        }
        sb.append('}')
      case r: org.apache.spark.sql.Row =>
        sb.append('{')
        val fns = r.schema.fieldNames
        var i = 0
        while (i < fns.length) {
          if (i > 0) sb.append(',')
          sb.append(quote(fns(i))).append(':'); writeVal(r.get(i))
          i += 1
        }
        sb.append('}')
      case n @ (_: Long | _: Int | _: Short | _: Byte) => sb.append(n.toString)
      case other => sb.append(quote(other.toString))
    }
    if (rows.length == 1 && names.length == 1) writeVal(rows(0).get(0))
    else {
      sb.append('[')
      var i = 0
      while (i < rows.length) {
        if (i > 0) sb.append(',')
        sb.append('{')
        var j = 0
        while (j < names.length) {
          if (j > 0) sb.append(',')
          sb.append(quote(names(j))).append(':'); writeVal(rows(i).get(j))
          j += 1
        }
        sb.append('}')
        i += 1
      }
      sb.append(']')
    }
    sb.toString
  }

  def handle(body: String): String = {
    val req = Json.parseRequest(body)
    val exec = new BatchExecutor(store, req.parameters)
    val out = exec.execute(req.batch)
    if (req.batch.write) { store = out.store; graft.search.IndexCache.evictOthers(store.version) }
    out.results.toSeq.sortBy(_._1)
      .map { case (k, df) => "\"" + k + "\":" + renderDf(df) }
      .mkString("{", ",", "}")
  }

  def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/v1/query", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val path = ex.getRequestURI.getPath
        // x-helix-* request headers (sdks/rust/src/lib.rs:270-298):
        //  - require-writer: single-writer deployment — this node IS the
        //    writer, acknowledged via a response header (routing stub);
        //  - warm: serve a stored route only if it has already run;
        //  - await-durable: writes apply synchronously here, so the ack
        //    is truthful either way.
        def hdr(n: String): Option[String] =
          Option(ex.getRequestHeaders.getFirst(n)).map(_.trim.toLowerCase)
        val warmOnly = hdr("x-helix-warm").contains("true")
        if (hdr("x-helix-require-writer").contains("true"))
          ex.getResponseHeaders.set("x-helix-served-by", "writer")
        hdr("x-helix-await-durable").foreach(v =>
          ex.getResponseHeaders.set("x-helix-durable", v))
        lastTruncated = false
        val resp =
          try {
            // POST /v1/query/<name> runs a deployed stored query
            // (sdks/rust/src/lib.rs:244-247); bare /v1/query takes the
            // inline envelope
            val sub = path.stripPrefix("/v1/query").stripPrefix("/")
            if (sub.nonEmpty) {
              if (warmOnly && !isWarm(sub))
                s"""{"error":${quote(s"query not warm: $sub")}}"""
              else handleStored(sub, body)
            } else Gateway.this.handle(body)
          } catch {
            case e: Exception => s"""{"error":${quote(e.getMessage)}}"""
          }
        if (lastTruncated)
          ex.getResponseHeaders.set("x-graft-truncated", "true")
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.setExecutor(null)
    server.start()
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def quote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
