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

  private val logMicroUdf = udf { (n: Long) => TextQuality.logMicro(n) }

  /** Okapi BM25 top-k (Robertson & Walker; the Lucene-default ranking
    * function) with the standard k1 = 1.2, b = 0.75 — the production
    * retrieval scorer; [[searchTopK]]'s raw tf·idf is the validation
    * baseline. Per query term:
    *
    *   score_t = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with the non-negative Lucene idf `ln(1 + (N − df + 0.5)/(df + 0.5))
    * = ln((N+1)/(df+0.5))`.
    *
    * Integer-exact by construction (the [[TextQuality.logMicro]] µ-log
    * device): `idf_micro = L(2N+2) − L(2df+1)` (both arguments odd/even
    * integers after clearing the 0.5 halves), the length norm is cleared to
    * integers by pre-truncating `nd_bp = (dl·10⁴·N) div S` (S = Σ dl) and
    * scaling the fraction by 2·10⁵ — with k1 = 6/5, b = 3/4:
    *
    *   w = (idf_micro · 440000 · tf) div (200000·tf + 60000 + 18·nd_bp)
    *
    * Every operand is a non-negative integer, so Spark's truncating `div`
    * and DuckDB's flooring `//` agree, and the DuckDB oracle replays scores
    * bit-for-bit from the shared `bm25_logtab` µ-log table. Magnitudes:
    * idf_micro ≤ 10⁶·ln(2N+2) ≈ 3·10⁷ at N = 10¹², ×(4.4·10⁵·tf) stays
    * far under Long range for any real tf; the nd_bp intermediate
    * dl·10⁴·N reaches ~10²⁵ at N = 10¹² so it is computed in DECIMAL(38,0)
    * (exact to 38 digits; the quotient dl·10⁴/avgdl is back under 10⁸ and
    * is stored as BIGINT) — DuckDB mirrors with HUGEINT.
    *
    * Scale shape = [[searchTopK]] plus per-doc lengths: dl (= Σ tf per doc)
    * is the write-time doc-stats artifact every index build materializes —
    * here derived from the postings in one map-side-combined groupBy; S is
    * a 1-row action; scoring joins the Σ_t df(t)-row matched stream against
    * dl on doc_id (AQE broadcasts the matched side when the query term set
    * is selective). */
  def searchBM25(postings: DataFrame, queries: DataFrame,
                 nDocs: Long, k: Int = 10): DataFrame = {
    require(nDocs > 0 && k > 0)
    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
      .localCheckpoint(false) // doc-stats artifact: feeds S and the nd join
    val s = dl.agg(sum("dl")).first().getLong(0) // total corpus tokens
    require(s > 0, "empty posting list — no tokens to rank")
    val nd = dl.select(col("doc_id"),
      // widened: dl·10⁴·N overflows Long for dl > ~922 at N = 10¹²; exact
      // DECIMAL(38,0) product, integral divide, result back under Long
      expr(s"CAST((CAST(dl AS DECIMAL(38,0)) * 10000 * ${nDocs}L) div CAST(${s}L AS DECIMAL(38,0)) AS BIGINT)").as("nd_bp"))
    val lnConst = TextQuality.logMicro(2L * nDocs + 2L)
    val qterms = queries.select("term").distinct()
    val matched = postings.join(broadcast(qterms), Seq("term"), "left_semi")
      .localCheckpoint(false)
    val df = matched.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        (lit(lnConst) - logMicroUdf(lit(2L) * col("df") + lit(1L))).as("idf_micro"))
    val scored = broadcast(queries.select(col("query_id"), col("term")))
      .join(matched, "term")
      .join(broadcast(df), "term")
      .join(nd, "doc_id")
      .withColumn("w", expr(
        "(idf_micro * 440000L * tf) div (200000L * tf + 60000L + 18L * nd_bp)"))
      .groupBy("query_id", "doc_id").agg(sum("w").as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "score", "rk")
  }

  /** µ-log table `1..(2N+2)` covering every value [[searchBM25]] looks up
    * (2df+1 ≤ 2N+1 and the constant 2N+2). Oracle-parity scaffolding
    * (dumped to `{{AUX}}/bm25_logtab`) — FIXTURE-SCALE ONLY: the table is
    * 2N+2 rows, so it is materializable only at oracle/test corpus sizes;
    * the engine itself never builds it (scores call [[TextQuality.logMicro]]
    * directly, O(1) per lookup at any N). */
  def bm25LogTable(spark: org.apache.spark.sql.SparkSession, nDocs: Long): DataFrame =
    spark.range(1, 2L * nDocs + 3L)
      .select(col("id").as("n"), logMicroUdf(col("id")).as("l"))

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * ensemble heterogeneous rankers (BM25 + dense ANN in a hybrid RAG
    * stack, or multiple lexical scorers): each system contributes
    * `1/(k + rank)` per retrieved doc, fused score = the sum, re-ranked.
    * Only RANKS cross systems, so incomparable score scales (µ-log BM25 vs
    * raw tf·idf vs cosine) fuse without normalization — RRF's whole point.
    *
    * Integer-exact: contribution = `10⁶ div (k + rk)` (all positive, both
    * engines floor identically); fused ties break on doc_id.
    *
    * Scale shape: inputs are already top-k RESULT tables (query·k rows,
    * never corpus-sized) — a union + one map-side-combined groupBy + the
    * WindowGroupLimit top-k. Cost is independent of corpus size. */
  def rrfFuse(ranked: Seq[DataFrame], k: Int = 60, topK: Int = 10): DataFrame = {
    require(ranked.nonEmpty && k >= 1 && topK >= 1)
    val contrib = ranked.map(_.select(col("query_id"), col("doc_id"),
        expr(s"1000000L div (${k}L + rk)").as("c")))
      .reduce(_ union _)
    val fused = contrib.groupBy("query_id", "doc_id").agg(sum("c").as("score_micro"))
    val w = Window.partitionBy("query_id").orderBy(col("score_micro").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select("query_id", "doc_id", "score_micro", "rk")
  }
}
