package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.ast.Json
import graft.model.{GraphStore, GraphWal}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** Single-writer / many-readers serving topology over one WAL — the
  * reference cloud's deployment shape ("queries are routed to the
  * writer or the read replicas", README.md:221; `x-helix-require-writer`
  * routing header, sdks/rust/src/lib.rs:270-298), realized Spark-side:
  *
  *  - ONE writer [[Gateway]] owns the store lineage: every write batch
  *    commits to the GraphWal segment log before its store publishes.
  *  - N [[ReadReplica]]s serve reads from their own store view, caught
  *    up by tailing the SAME log (GraphWal.advanceReplica): catch-up
  *    replays only the segments committed since the replica's last
  *    refresh — cost proportional to write traffic, not store size.
  *  - Dispatch: write batches, stored write routes, and requests
  *    carrying `x-helix-require-writer: true` go to the writer;
  *    everything else round-robins across replicas.
  *
  * Consistency: a write ack carries `x-graft-wal-position` (the log's
  * monotonic commit position). A client that needs read-your-writes
  * sends it back as `x-graft-min-position`; the serving replica
  * refreshes past that position before answering. By default every
  * read refreshes to the log head first (read-committed; the no-change
  * fast path is one manifest read). `x-graft-stale: true` skips the
  * refresh entirely and serves the replica's current view — the
  * zero-coordination path for throughput-over-freshness readers.
  *
  * In this single-JVM build the replicas are in-process (local[32]
  * stands in for the cluster); across machines each replica is the
  * same object tailing the same manifest on shared storage — nothing
  * in the protocol assumes shared memory.
  */
final class Router(spark: SparkSession, walRoot: String, port: Int = 6969,
    numReaders: Int = 2, maxResponseRows: Int = 10000,
    workerThreads: Int = 8,
    /** Optional shared API key (see Gateway.apiKey): enforced once at
      * this HTTP boundary for `/v1/query` and `/v1/deploy` — the
      * replicas are in-process, so the authenticated identity rides the
      * dispatch call itself (the in-process analogue of forwarding the
      * Authorization header). `/v1/cluster` and `/metrics` stay open
      * by default (health/observability) and are gated behind the same
      * key when `protectMetrics` is set (GRAFT_PROTECT_METRICS=true) —
      * they expose WAL position, route names, and cluster topology.
      */
    apiKey: Option[String] = sys.env.get("GRAFT_API_KEY").filter(_.nonEmpty),
    protectMetrics: Boolean =
      sys.env.get("GRAFT_PROTECT_METRICS").exists(_.toBoolean)) {
  require(numReaders >= 1, "a Router needs at least one read replica")

  val writer = new Gateway(GraphWal.recover(spark, walRoot),
    maxResponseRows = maxResponseRows, walRoot = Some(walRoot), mcp = false,
    apiKey = apiKey,
    // a writer-side write must not cold-start the readers: their store
    // versions — including a refresh's in-flight target version, whose
    // artifacts have migrated but whose store has not published yet —
    // stay live through artifact eviction (readers is still null while
    // the writer recovers — guard the early window)
    liveVersions = () => Option(readers).map(_.flatMap(_.liveVersions).toSet)
      .getOrElse(Set.empty))
  private val readers = Array.tabulate(numReaders)(
    i => new ReadReplica(spark, walRoot, maxResponseRows, i, apiKey))
  private val rr = new AtomicInteger(0)
  private val nErrors = new java.util.concurrent.atomic.AtomicLong
  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  /** Deploy to the writer AND every replica (all serve the route; the
    * writer's copy is authoritative for the write/read dispatch bit).
    */
  def registerQuery(name: String, batch: graft.ast.Batch,
      params: Seq[(String, QueryBundle.PTy)] = Nil): Unit = {
    writer.registerQuery(name, batch, params)
    readers.foreach(_.gateway.registerQuery(name, batch, params))
  }

  def loadBundle(json: String): Int = {
    val n = writer.loadBundle(json)
    readers.foreach(_.gateway.loadBundle(json))
    n
  }

  def readerPositions: Seq[Long] = readers.map(_.position).toSeq

  private[graft] def readerVersions: Seq[String] =
    readers.map(_.gateway.currentStore.version).toSeq

  /** Dispatch one request (the in-process entry the HTTP handler and
    * embedded callers share). `sub` is the stored-route name ("" for
    * the inline envelope); returns the status, body, and headers
    * explicitly — the status is part of the public contract (a
    * replica-behind rejection is 400), not an in-band pseudo-header,
    * so any transport that forwards `headers` verbatim stays clean.
    */
  def route(sub: String, body: String,
      hdr: String => Option[String],
      preParsed: Option[Json.Request] = None): Router.Routed = {
    // parse the inline envelope ONCE: the dispatch decision needs its
    // write bit, and the serving gateway reuses the parsed request (a
    // bulk-ingest envelope is megabytes of JSON). `preParsed` lets the
    // streaming pre-flight hand its parse down when a write falls back
    // to this buffered path — the envelope is never parsed twice.
    val parsed =
      if (sub.isEmpty) Some(preParsed.getOrElse(Json.parseRequest(body)))
      else None
    def serve(gw: Gateway): (String, Boolean) = parsed match {
      case Some(req) => gw.handleParsedT(req)
      case None => gw.handleStoredT(sub, body)
    }
    dispatch(sub, parsed, hdr) match {
      case Left((replicaName, errBody)) =>
        Router.Routed(400, errBody,
          Map("x-helix-served-by" -> replicaName))
      case Right((gw, servedBy, pos)) =>
        val (resp, truncated) = serve(gw)
        // the position thunk evaluates AFTER serve: a write's ack must
        // carry the position of the commit it just made
        respond(resp, truncated, servedBy, pos())
    }
  }

  /** The ONE dispatch front half both the buffered and streamed paths
    * share: require-writer/write-bit routing, round-robin replica
    * pick, and the stale/min-position freshness contract. Left =
    * replica-behind (replica name, error body); Right = (serving
    * gateway, served-by name, wal-position THUNK — the writer's
    * position must be read AFTER its serve so a write acks the commit
    * it just made; a replica's is the refresh result, already fixed).
    */
  private def dispatch(sub: String, parsed: Option[Json.Request],
      hdr: String => Option[String])
      : Either[(String, String), (Gateway, String, () => Long)] = {
    val toWriter = hdr("x-helix-require-writer").exists(_.trim.toLowerCase == "true") ||
      parsed.map(_.batch.write)
        .getOrElse(writer.storedIsWrite(sub).getOrElse(false))
    if (toWriter)
      Right((writer, "writer", () => GraphWal.commitPosition(walRoot)))
    else {
      val r = readers(math.floorMod(rr.getAndIncrement(), readers.length))
      val minPos = hdr("x-graft-min-position").flatMap(_.toLongOption).getOrElse(-1L)
      val stale = hdr("x-graft-stale").exists(_.trim.toLowerCase == "true")
      val pos = if (stale && r.position >= minPos) r.position else r.refresh()
      if (pos < minPos)
        Left((r.name,
          s"""{"error":"replica behind requested position: $pos < $minPos"}"""))
      else Right((r.gateway, r.name, () => pos))
    }
  }

  /** Dispatch + stream one NDJSON read over `ex`. Returns (handled,
    * parsed): handled = true when the exchange was answered (streamed,
    * or a pre-flight client error was sent); a write batch returns
    * (false, its parse) — those keep the buffered mutation-summary
    * contract, so the caller falls through to [[route]] WITHOUT
    * re-parsing the envelope. Parse/route/warm failures throw and the
    * caller sends the shared 400 contract.
    */
  private def routeStreaming(sub: String, body: String,
      hdr: String => Option[String],
      ex: HttpExchange): (Boolean, Option[Json.Request]) = {
    val parsed = if (sub.isEmpty) Some(Json.parseRequest(body)) else None
    val (gw, servedBy, pos) = dispatch(sub, parsed, hdr) match {
      case Left((replicaName, errBody)) =>
        ex.getResponseHeaders.set("x-helix-served-by", replicaName)
        send(ex, errBody, 400)
        return (true, parsed)
      case Right(t) => t
    }
    val warmOnly = hdr("x-helix-warm").exists(_.trim.toLowerCase == "true")
    if (sub.nonEmpty && warmOnly && !gw.isWarm(sub))
      throw new IllegalArgumentException(s"query not warm: $sub")
    val (batch, params) = parsed match {
      case Some(req) => (req.batch, req.parameters)
      case None => gw.storedBatchParams(sub, body)
    }
    if (batch.write) return (false, parsed) // buffered mutation summary
    ex.getResponseHeaders.set("x-helix-served-by", servedBy)
    // reads never commit, so the position thunk is stable here; it
    // must resolve before the chunked headers go out
    ex.getResponseHeaders.set("x-graft-wal-position", pos().toString)
    gw.streamServe(ex, batch, params,
      () => if (sub.nonEmpty) gw.markServed(sub))
    (true, parsed)
  }

  private def respond(resp: String, truncated: Boolean, servedBy: String,
      pos: Long): Router.Routed = {
    val base = Map("x-helix-served-by" -> servedBy,
      "x-graft-wal-position" -> pos.toString)
    Router.Routed(200, resp,
      if (truncated) base + ("x-graft-truncated" -> "true") else base)
  }

  /** Cluster status: writer commit position + each replica's ack. */
  def status: String = {
    val rs = readers.zipWithIndex
      .map { case (r, i) => s""""reader-$i":${r.position}""" }.mkString(",")
    s"""{"wal_position":${GraphWal.commitPosition(walRoot)},"readers":{$rs}}"""
  }

  /** Aggregated serving counters: the writer's plus each replica's
    * (Gateway.metricsJson per node, keyed by role).
    */
  def metricsJson: String = {
    val rs = readers.map(r => "\"" + r.name + "\":" + r.gateway.metricsJson)
      .mkString(",")
    s"""{"writer":${writer.metricsJson},$rs,""" +
      s""""router_errors":${nErrors.get()},""" +
      s""""wal_position":${GraphWal.commitPosition(walRoot)}}"""
  }

  private def requireAuth(ex: HttpExchange): Boolean =
    ServerAuth.require(ex, writer.authorized(
      Option(ex.getRequestHeaders.getFirst("Authorization"))))

  def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/v1/query", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (!requireAuth(ex)) return
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val sub = ex.getRequestURI.getPath.stripPrefix("/v1/query").stripPrefix("/")
        def hd(n: String) = Option(ex.getRequestHeaders.getFirst(n))
        // NDJSON streaming passthrough: the same opt-in the Gateway
        // honors works through the cluster topology — dispatch picks
        // the node (round-robin replica or writer, with the same
        // freshness contract), then that node's gateway streams the
        // read straight to this exchange. Write batches and
        // client errors fall to the buffered path / 400 below.
        val wantStream = hd("x-graft-stream")
          .exists(_.trim.toLowerCase == "ndjson") ||
          hd("accept").exists(_.toLowerCase.contains("application/x-ndjson"))
        var preParsed: Option[Json.Request] = None
        if (wantStream) {
          val handled =
            try {
              val (h, parsed) = routeStreaming(sub, body, hd, ex)
              preParsed = parsed
              h
            } catch {
              case e: Exception =>
                nErrors.incrementAndGet()
                send(ex, s"""{"error":${quote(e.getMessage)}}""", 400)
                true
            }
          if (handled) return
        }
        // same error contract as the Gateway's own HTTP layer: a
        // failed request is 400 with an {"error":...} body
        val routed =
          try route(sub, body, hd, preParsed)
          catch { case e: Exception =>
            nErrors.incrementAndGet()
            Router.Routed(400, s"""{"error":${quote(e.getMessage)}}""",
              Map.empty)
          }
        routed.headers.foreach { case (k, v) =>
          ex.getResponseHeaders.set(k, v)
        }
        send(ex, routed.body, routed.status)
      }
    })
    server.createContext("/v1/cluster", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (protectMetrics && !requireAuth(ex)) return
        send(ex, status)
      }
    })
    server.createContext("/metrics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (protectMetrics && !requireAuth(ex)) return
        send(ex, metricsJson)
      }
    })
    // deploy reaches the writer AND every replica (Router.loadBundle);
    // sync reads the writer's authoritative set
    server.createContext("/v1/deploy", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (!requireAuth(ex)) return
        var st = 200
        val resp =
          try {
            if (ex.getRequestMethod == "GET") writer.renderBundle
            else {
              val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
              s"""{"deployed":${loadBundle(body)}}"""
            }
          } catch {
            case e: Exception => st = 400; s"""{"error":${quote(e.getMessage)}}"""
          }
        send(ex, resp, st)
      }
    })
    pool = java.util.concurrent.Executors.newFixedThreadPool(workerThreads)
    server.setExecutor(pool)
    server.start()
  }

  private def send(ex: HttpExchange, resp: String, status: Int = 200): Unit = {
    val bytes = resp.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  def stop(): Unit = {
    if (server != null) server.stop(0)
    if (pool != null) pool.shutdown()
  }

  private def quote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

object Router {
  /** One routed response: HTTP status, body, response headers. The
    * status rides explicitly (not as an in-band header) so any
    * transport forwarding `headers` verbatim cannot leak an internal
    * marker or mis-handle a real header of the same name.
    */
  final case class Routed(status: Int, body: String,
      headers: Map[String, String])
}

/** One read replica: a read-only Gateway over a store view tailed from
  * the WAL. `refresh` is the only mutator and synchronizes with
  * itself; `position` reads are volatile (a concurrent refresh is
  * visible or not — either way a consistent (store, position) pair
  * serves the request).
  */
private[server] final class ReadReplica(spark: SparkSession, walRoot: String,
    maxResponseRows: Int, index: Int, apiKey: Option[String] = None) {
  @volatile private var st = GraphWal.openReplica(spark, walRoot)
  /** Version a refresh is migrating artifacts toward but has not
    * published yet — live for eviction purposes (a writer-side evict
    * racing the migrate window must spare it).
    */
  @volatile private var inFlight: Option[String] = None
  private[server] val gateway =
    new Gateway(st.served, maxResponseRows = maxResponseRows, mcp = false,
      apiKey = apiKey)
  private[server] val name = s"reader-$index"

  def position: Long = st.position

  private[server] def liveVersions: Seq[String] =
    gateway.currentStore.version +: inFlight.toSeq

  /** Catch up to the log head; no-op (one manifest read) when nothing
    * new committed. Returns the acked position.
    *
    * Artifact continuity mirrors the writer's write path: labels whose
    * tables kept reference identity across the advance migrate their
    * cached BM25/IVF artifacts to the new store version (incremental
    * replay leaves untouched labels `eq`), then the superseded
    * version's remainder evicts — a refresh only cold-starts the
    * labels the replayed writes actually touched.
    */
  def refresh(): Long = synchronized {
    val prev = st.served
    val next = GraphWal.advanceReplica(spark, walRoot, st)
    if (next ne st) {
      val unchanged = (prev.nodeTables.keySet ++ prev.edgeTables.keySet).filter { l =>
        prev.nodeTables.get(l).forall(df => next.served.nodeTables.get(l).exists(_ eq df)) &&
          prev.edgeTables.get(l).forall(df => next.served.edgeTables.get(l).exists(_ eq df))
      }
      inFlight = Some(next.served.version)
      graft.search.IndexCache.migrate(prev.version, next.served.version, unchanged)
      // position unchanged means no segments replayed: only the stream
      // overlays can have moved, and those are APPEND-ONLY — declared
      // artifacts on the changed labels refresh incrementally (postings
      // merge with the appended rows' postings; IVF centroids carry
      // forward and new vectors assign to them) instead of cold-starting
      if (next.position == st.position) {
        import graft.ast.IndexSpec
        val (from, to) = (prev.version, next.served.version)
        next.served.indexes.foreach {
          case IndexSpec.NodeText(l, p, t) if !unchanged.contains(l) =>
            for (pt <- prev.nodeTables.get(l); nt <- next.served.nodeTables.get(l))
              graft.search.IndexCache.appendText(from, to, l, p, pt, nt, t)
          case IndexSpec.EdgeText(l, p, t) if !unchanged.contains(l) =>
            for (pt <- prev.edgeTables.get(l); nt <- next.served.edgeTables.get(l))
              graft.search.IndexCache.appendText(from, to, l, p, pt, nt, t)
          case IndexSpec.NodeVector(l, p, _) if !unchanged.contains(l) =>
            graft.search.IndexCache.migrateIvfAppend(from, to, l, p)
          case IndexSpec.EdgeVector(l, p, _) if !unchanged.contains(l) =>
            graft.search.IndexCache.migrateIvfAppend(from, to, l, p)
          case _ =>
        }
      }
      graft.search.IndexCache.evictVersion(prev.version)
      // store BEFORE position: a concurrent stale read that observes the
      // new position must find the new store behind it (the store may
      // lead the advertised position, never lag it — publishing st
      // first would let a min-position check pass against the old view)
      gateway.replaceStore(next.served)
      st = next
      inFlight = None
    }
    next.position
  }
}
