package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Inverted-index retrieval — sparse lexical search over the document table,
  * the retrieval twin of the dense-vector paths in [[Similarity]] (ANN /
  * IVF). A curation pipeline needs BOTH: dense recall for semantic near-dup
  * and lexical precision for targeted corpus probes ("find the docs that
  * mention X") and decontamination-style audits.
  *
  * Index = posting lists (term, doc_id, tf) from the corpus-standard
  * whitespace tokenizer (same tokenization as [[TextQuality.vocabTopK]], so
  * index statistics and vocabulary reports agree). Scoring is tf·idf with
  * EXACT-INTEGER idf — idf_bp(t) = (N·10⁴) div df(t), truncating — so a
  * relational engine replays scores bit-for-bit; float idf (log-scaled)
  * differs in the last ulp across engines and breaks hash comparison.
  * Ranking is row_number over (score DESC, doc_id), never raw float order.
  *
  * Scale shape: the index build is one explode + map-side-combined groupBy
  * on (term, doc_id) — at real scale this is the write-time artifact,
  * bucketed BY TERM so a query touches only its terms' buckets
  * ([[graft.io.TableFormat]] provides exactly that layout). df() is a
  * term-sized aggregate. Query evaluation broadcast-joins the (tiny) query
  * term set against postings — the scored stream is Σ_t df(t) rows, the
  * classic DAAT bound, never corpus-sized — then one groupBy (query, doc)
  * and one per-query top-k window. No UDFs; everything codegens.
  */
object InvertedIndex {

  /** Deterministic probe queries over the synthetic documents vocabulary —
    * ONE source of truth shared by the SparkEntry registry and the DuckDB
    * oracle generator (no hand-synced duplicate). */
  val fixtureQueries: Seq[(String, String)] = Seq(
    "q_hash_join" -> "hash", "q_hash_join" -> "join",
    "q_stream_window" -> "window", "q_stream_window" -> "agg",
    "q_stream_window" -> "stream",
    "q_cust_order" -> "customer", "q_cust_order" -> "order",
    "q_cust_order" -> "line")

  /** Posting lists: (term, doc_id, tf) — lowercase whitespace tokens,
    * empties dropped. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** OR-semantics tf·idf top-k. queries: (query_id, term) — one row per
    * query term (duplicate terms in one query score multiply, like repeated
    * query terms in BM25). nDocs = corpus size for the idf numerator.
    * Returns (query_id, doc_id, score, rk) with rk ≤ k, score the exact
    * integer Σ tf·((nDocs·10⁴) div df). */
  def searchTopK(postings: DataFrame, queries: DataFrame,
                 nDocs: Long, k: Int = 10): DataFrame = {
    require(nDocs > 0 && k > 0)
    // prune the index to the query's terms FIRST (broadcast semi-join — the
    // bucketed-by-term layout turns this into partition pruning at scale),
    // so df and scoring both run over the Σ_t df(t)-row matched stream, and
    // the full posting table is scanned exactly once
    val qterms = queries.select("term").distinct()
    val matched = postings.join(broadcast(qterms), Seq("term"), "left_semi")
      .localCheckpoint(false) // df + scoring branches share one scan
    // postings are unique per (term, doc), so df = row count per term
    val df = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = broadcast(queries.select(col("query_id"), col("term")))
      .join(matched, "term")
      .join(broadcast(df), "term")
      .withColumn("w", expr(s"tf * ((${nDocs}L * 10000L) div df)"))
      .groupBy("query_id", "doc_id").agg(sum("w").as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "score", "rk")
  }
}
