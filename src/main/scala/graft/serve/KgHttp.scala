package graft.serve

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.kg.Sparql
import org.apache.spark.sql.DataFrame

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** KG query endpoint — the engine-side EXTENSION listener (deliberately a
  * SEPARATE server from [[HttpServe]], whose path space and error mapping
  * are pinned to the reference's FastAPI surface and must not grow):
  *
  *   - `POST /kg`  body `{"query": "SELECT …"}` — a [[Sparql]] string run
  *     against the store this listener was started with. Response:
  *     `{"columns": [...], "rows": [[...], ...], "n": N, "truncated": bool}`
  *     with unbound (NULL) bindings as JSON null.
  *   - `GET /`     endpoint + grammar hint.
  *
  * Serving discipline: results are capped at `maxRows` per request
  * (`take(maxRows+1)` detects truncation without a count pass) — an HTTP
  * answer is a page, never a corpus; bulk extraction belongs to the batch
  * path writing parquet. The SparkSession does the real work, so the
  * request pool stays at the same small fixed size as [[HttpServe]] —
  * concurrency beyond it queues on the socket rather than piling drivers
  * onto one session. Parse errors → 400 with the parser's own message;
  * malformed JSON → 400; unknown path → 404; execution failure → 500. */
object KgHttp {

  private val mapper = new ObjectMapper()

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  private def detail(msg: String): String = s"""{"detail":${jsonStr(String.valueOf(msg))}}"""

  private[graft] def runQuery(triples: DataFrame, q: String, maxRows: Int,
                              stats: Option[Map[String, Long]] = None): String = {
    val df = Sparql.query(triples, q, stats)
    val cols = df.columns.toSeq
    val rows = df.take(maxRows + 1)
    val truncated = rows.length > maxRows
    val shown = if (truncated) rows.take(maxRows) else rows
    val rowsJson = shown.map { r =>
      cols.indices.map { i =>
        val v = r.get(i)
        if (v == null) "null" else v match {
          case n: java.lang.Long => n.toString
          case other             => jsonStr(other.toString)
        }
      }.mkString("[", ",", "]")
    }.mkString("[", ",", "]")
    s"""{"columns":${cols.map(jsonStr).mkString("[", ",", "]")},""" +
      s""""rows":$rowsJson,"n":${shown.length},"truncated":$truncated}"""
  }

  /** Start the listener over one loaded store (port 0 = ephemeral).
    * `stats` (per-predicate counts) switches every request to the
    * selectivity-ordered BGP fold — [[startFromStore]] wires them for free. */
  def start(port: Int, triples: DataFrame, maxRows: Int = 1000,
            stats: Option[Map[String, Long]] = None): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (status, out) =
          try {
            val path = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
            (ex.getRequestMethod, path) match {
              case ("GET", "") =>
                (200, """{"endpoint":"/kg","body":{"query":"SELECT [DISTINCT] (?v ...|aggs|*) WHERE { ... FILTER/VALUES ... } [GROUP BY][ORDER BY][LIMIT][OFFSET] | ASK { ... } | CONSTRUCT { ... } WHERE { ... } | DESCRIBE (const|?v ... WHERE { ... })"}}""")
              case ("POST", "kg") =>
                val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
                val root = mapper.readTree(body)
                if (root == null || !root.has("query") || !root.get("query").isTextual)
                  (400, detail("body must be a JSON object with a string 'query' field"))
                else (200, runQuery(triples, root.get("query").asText, maxRows, stats))
              case ("POST", p) => (404, detail(s"unknown path '/$p'"))
              case _           => (405, detail("method not allowed"))
            }
          } catch {
            case e: IllegalArgumentException                    => (400, detail(e.getMessage))
            case e: com.fasterxml.jackson.core.JacksonException =>
              (400, detail(s"malformed JSON body: ${e.getOriginalMessage}"))
            case e: Exception                                   => (500, detail(String.valueOf(e.getMessage)))
          }
        val bytes = out.getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(status, if (bytes.length == 0) -1 else bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-kg-serve"); t.setDaemon(true); t
    }))
    server.start()
    server
  }

  /** [[start]] over a TableFormat.savePartitioned store PATH: loads the
    * table and its per-predicate stats in one call — the stats are a
    * metadata read of the store's lineage manifest
    * ([[graft.kg.Pattern.predStatsFromManifest]]), so a server fronting a
    * 10^12-triple store pays one small JSON read, never a counting scan,
    * and every query it serves gets the selectivity-ordered fold. */
  def startFromStore(port: Int, spark: org.apache.spark.sql.SparkSession,
                     storePath: String, maxRows: Int = 1000): HttpServer =
    start(port, graft.io.TableFormat.load(spark, storePath), maxRows,
      stats = Some(graft.kg.Pattern.predStatsFromManifest(storePath)))

  /** Stop a listener started by [[start]] (socket + its executor pool). */
  def stop(server: HttpServer): Unit = {
    server.stop(0)
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ =>
    }
  }
}
