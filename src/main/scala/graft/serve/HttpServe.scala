package graft.serve

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.Pipeline
import graft.fixtures.Fixtures
import graft.ner.NerModel
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal HTTP listener over [[Serve.handle]] — makes the parity with the
  * reference's FastAPI consumption literal (api_main.py:504-509 GET / command
  * listing; :523-530 POST /{command} with a NEMOQuery JSON body
  * `{"sentences": str | [[token]], "tokenized": bool}` and the model /
  * verbosity knobs as URL QUERY parameters, exactly where FastAPI puts
  * `Optional[...] = Query(...)` arguments). JDK `com.sun.net.httpserver`
  * only — no framework, no new dependency; every NER path stays in
  * [[Serve.handle]], the single code body shared with the batch, streaming
  * and incremental consumption modes, so the socket cannot drift from them.
  *
  * Error mapping mirrors FastAPI's: unknown command path → 404, unknown
  * model name (the reference's `loaded_models[...]` KeyError) → 404,
  * malformed JSON body → 400, a body without `sentences` → 422.
  */
object HttpServe {

  private val mapper = new ObjectMapper()

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  private def detail(msg: String): String = s"""{"detail":"${jsonEscape(msg)}"}"""

  /** `a=1&b=x` → Map; value-less keys map to "". Percent-decoding via URI. */
  private[serve] def parseQuery(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").iterator.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      java.net.URLDecoder.decode(k, UTF_8) -> java.net.URLDecoder.decode(v, UTF_8)
    }.toMap

  /** NEMOQuery body + FastAPI query params → [[Serve.Request]]. The
    * `sentences` union type (api_main.py:491): a JSON string is raw text; a
    * list-of-token-lists is pre-tokenized and joins to the '\n'/' '-separated
    * form [[Serve.handle]]'s tokenized path expects. */
  private[serve] def parseRequest(body: String, query: Map[String, String]): Serve.Request = {
    val root = mapper.readTree(body)
    if (root == null || !root.has("sentences"))
      throw new NoSuchFieldException("body must be a JSON object with a 'sentences' field")
    val sn = root.get("sentences")
    val (sentences, preTokenized) =
      if (sn.isArray) {
        val sents = (0 until sn.size).map { i =>
          val s = sn.get(i)
          (0 until s.size).map(j => s.get(j).asText).mkString(" ")
        }
        (sents.mkString("\n"), true)
      } else (sn.asText, false)
    Serve.Request(
      sentences = sentences,
      tokenized = preTokenized ||
        (root.has("tokenized") && root.get("tokenized").asBoolean(false)),
      modelName = query.getOrElse("model_name", "token-single"),
      multiModelName = query.getOrElse("multi_model_name", "token-multi"),
      morphModelName = query.getOrElse("morph_model_name", "morph"),
      verbose = query.getOrElse("verbose", "0").toInt,
      includeYapOutputs = query.get("include_yap_outputs")
        .exists(v => v == "1" || v.equalsIgnoreCase("true")))
  }

  /** Start the listener (port 0 = ephemeral, read it back from the result).
    * Serving is µs-scale CPU work per request ([[Serve]] scaladoc), so a
    * small fixed pool is plenty; the heavy state (model registry) is loaded
    * once here, exactly like the reference's startup `load_all_models`. */
  def start(port: Int,
            registry: Map[String, NerModel] = Pipeline.fixtureRegistry,
            lexicon: Set[String] = Fixtures.lexicon): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (status, out) =
          try {
            val path = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
            (ex.getRequestMethod, path) match {
              case ("GET", "") => (200, Serve.listCommandsJson)
              case ("POST", cmd) if Serve.availableCommands.contains(cmd) =>
                val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
                val req = parseRequest(body, parseQuery(ex.getRequestURI.getRawQuery))
                (200, Serve.handle(cmd, req, registry, lexicon))
              case ("POST", cmd) => (404, detail(s"unknown command '$cmd'"))
              case _             => (405, detail("method not allowed"))
            }
          } catch {
            case e: NoSuchElementException                       => (404, detail(e.getMessage))
            case e: NoSuchFieldException                         => (422, detail(e.getMessage))
            case e: com.fasterxml.jackson.core.JacksonException  =>
              (400, detail(s"malformed JSON body: ${e.getOriginalMessage}"))
            case e: Exception                                    => (500, detail(String.valueOf(e.getMessage)))
          }
        val bytes = out.getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(status, if (bytes.length == 0) -1 else bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server
  }

  def main(args: Array[String]): Unit = {
    val port = args.headOption.orElse(sys.env.get("GRAFT_SERVE_PORT"))
      .map(_.toInt).getOrElse(8090)
    val s = start(port)
    println(s"[serve] listening on http://127.0.0.1:${s.getAddress.getPort} " +
      s"(commands: ${Serve.availableCommands.mkString(", ")})")
    Thread.currentThread().join()
  }
}
