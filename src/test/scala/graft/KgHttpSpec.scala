package graft

import graft.kg.Sparql
import graft.serve.KgHttp
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The KG HTTP endpoint: socket responses must equal the in-process
  * [[KgHttp.runQuery]] JSON for the same store and query, with the
  * engine-extension error mapping (400 parse/JSON, 404 path, row cap). */
class KgHttpSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val trip = Seq(
    ("ent:1", "category", "PER"),
    ("ent:2", "category", "ORG"),
    ("ent:3", "category", "PER"),
    ("ent:1", "sameAs", "ent:9"),
    ("ent:1", "label", "alpha beta")
  ).toDF("subj", "pred", "obj")

  test("socket round trip equals runQuery; errors map to 400/404; cap truncates") {
    val server = KgHttp.start(0, trip, maxRows = 2)
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = HttpClient.newHttpClient()
      def post(path: String, body: String) = client.send(
        HttpRequest.newBuilder(URI.create(base + path))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      def get(path: String) = client.send(
        HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
        HttpResponse.BodyHandlers.ofString())

      // GET / — endpoint description
      assert(get("/").statusCode() === 200)
      assert(get("/").body().contains("\"endpoint\":\"/kg\""))

      // happy path == in-process JSON (OPTIONAL produces a null binding)
      val q = "SELECT DISTINCT ?e ?al WHERE { ?e category PER OPTIONAL { ?e sameAs ?al } }"
      val wire = post("/kg", s"""{"query": ${jstr(q)}}""")
      assert(wire.statusCode() === 200)
      assert(wire.body() === KgHttp.runQuery(trip, q, maxRows = 2))
      assert(wire.body().contains("null")) // ent:3 has no alias
      // and the JSON content matches the DataFrame the Sparql API returns
      val rows = Sparql.query(trip, q).collect()
      assert(wire.body().contains(s""""n":${rows.length}"""))

      // ASK rides the same endpoint, long-typed
      val ask = post("/kg", """{"query": "ASK { ?e category PER }"}""")
      assert(ask.statusCode() === 200 && ask.body().contains("\"rows\":[[1]]"))

      // cap: 3 triples project to 3 rows > maxRows=2 → truncated
      val capped = post("/kg", """{"query": "SELECT ?s WHERE { ?s ?p ?o }"}""")
      assert(capped.statusCode() === 200)
      assert(capped.body().contains("\"truncated\":true") &&
        capped.body().contains("\"n\":2"))

      // parser error → 400 with the parser's own message
      val bad = post("/kg", """{"query": "SELECT ?z WHERE { ?a b ?c }"}""")
      assert(bad.statusCode() === 400 && bad.body().contains("not bound"))
      // malformed JSON → 400; missing field → 400; unknown path → 404
      assert(post("/kg", "{nope").statusCode() === 400)
      assert(post("/kg", """{"q": "x"}""").statusCode() === 400)
      assert(post("/nope", "{}").statusCode() === 404)
    } finally KgHttp.stop(server)
  }

  test("startFromStore serves the saved store with manifest stats wired in") {
    import graft.io.TableFormat
    val store = java.nio.file.Files.createTempDirectory("graft-kghttp").toString + "/triples"
    TableFormat.savePartitioned(
      trip.withColumn("doc_id", org.apache.spark.sql.functions.lit("d1")),
      store, partCol = "pred", keyCol = "subj", buckets = 2, stage = "triples")
    val server = KgHttp.startFromStore(0, spark, store)
    try {
      val client = HttpClient.newHttpClient()
      // adversarial text order: stats-ordered fold must still bind correctly
      val q = "SELECT DISTINCT ?al ?e WHERE { ?e sameAs ?al . ?e category PER }"
      val wire = client.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${server.getAddress.getPort}/kg"))
          .POST(HttpRequest.BodyPublishers.ofString(s"""{"query": ${jstr(q)}}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(wire.statusCode() === 200)
      assert(wire.body().contains("ent:9") && wire.body().contains("\"n\":1"))
      // the stats the server loaded are the manifest's, which match a count
      assert(graft.kg.Pattern.predStatsFromManifest(store) ===
        Map("category" -> 3L, "sameAs" -> 1L, "label" -> 1L))
    } finally KgHttp.stop(server)
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
