package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language-ID, quality scoring, token counting, document fingerprinting.
  * All column-oriented: built from codegen'd `org.apache.spark.sql.functions`
  * where possible; Scala UDFs only where a scan over the string is genuinely
  * needed (langId, rolling hash). Narrow, shuffle-free, pushdown-friendly.
  */
object TextQuality {

  // ---------- token counting ----------

  /** Whitespace token count — pure Catalyst (codegen). */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation each
    * count as one token (the usual pre-tokenizer regex). Pure Catalyst. */
  def bpeTokenCount(colName: String): Column =
    size(expr(s"regexp_extract_all($colName, '\\\\p{L}+|\\\\p{N}+|[^\\\\s\\\\p{L}\\\\p{N}]', 0)"))

  // ---------- fingerprinting ----------

  /** Canonical text: lowercase, collapse whitespace, trim. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint = md5 of normalized text (DuckDB-replicable). */
  def fingerprint(text: Column): Column = md5(normalizedText(text))

  /** 64-bit rolling polynomial hash of the normalized text (Karp-Rabin style,
    * base 1000003, native Long overflow arithmetic) — the cheap non-crypto
    * fingerprint for shingling at scale. UDF form kept for the parity test. */
  val rollingHashUdf = udf { (s: String) =>
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * 1000003L + s.charAt(i); i += 1 }
    h
  }

  /** Codegen'd 64-bit content hash: native Catalyst expression (PolyHash64)
    * over the normalized text — stays inside whole-stage codegen, unlike a UDF.
    */
  def fastFingerprint(text: Column): Column =
    graft.functions.PolyHash64(normalizedText(text))

  // ---------- quality scoring ----------

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with")

  /** Per-doc quality features + a composite score in [0,1]:
    *   - meanTokenLen in a sane band,
    *   - stopword ratio > 0 (running text, not a keyword dump),
    *   - distinct-token ratio (repetition detector),
    *   - alpha ratio (symbol soup detector).
    * All pure Catalyst expressions → whole-stage codegen, no UDF.
    */
  def withQualityFeatures(df: DataFrame, textCol: String = "text",
                          stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val sw = array(stopwords.map(lit): _*)
    df.withColumn("q_n_tokens", size(toks))
      .withColumn("q_mean_tok_len",
        round(expr("aggregate(split(trim(lower(" + textCol + ")), '\\\\s+'), 0L, (a, t) -> a + length(t))")
          .cast("double") / greatest(size(toks), lit(1)), 4))
      .withColumn("q_stopword_ratio",
        round(size(filter(toks, x => array_contains(sw, x))).cast("double") / greatest(size(toks), lit(1)), 4))
      .withColumn("q_distinct_ratio",
        round(size(array_distinct(toks)).cast("double") / greatest(size(toks), lit(1)), 4))
      .withColumn("q_alpha_ratio",
        round(length(regexp_replace(col(textCol), "[^\\p{L}]", "")).cast("double") /
          greatest(length(col(textCol)), lit(1)), 4))
  }

  /** Composite score from the feature columns (call after withQualityFeatures). */
  def qualityScore: Column = {
    val lenOk = when(col("q_mean_tok_len").between(2.0, 12.0), 1.0).otherwise(0.5)
    val rep = col("q_distinct_ratio")
    val stop = least(col("q_stopword_ratio") * 5.0, lit(1.0))
    val alpha = col("q_alpha_ratio")
    round((lenOk + rep + stop + alpha) / 4.0, 4)
  }

  // ---------- language ID ----------

  /** Character/stopword n-gram profiles for a deterministic heuristic langId.
    * Public-knowledge trigram markers; scored by marker hits per language. */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to ", "ing ", " that "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", "sch", " nicht "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " une ", " que "),
    "es" -> Seq(" el ", " la ", " los ", " y ", " es ", " que ", "ción"),
    "he" -> Seq("של", "את", "הוא", "היא", "אשר"))

  /** Heuristic language-ID: marker-hit counting over the padded lowercase text;
    * ties broken lexicographically; "und" (undetermined) when nothing hits.
    * A Scala UDF by necessity (per-language scan), but a cheap single pass. */
  val langIdUdf = udf { (text: String) =>
    if (text == null || text.isEmpty) "und"
    else {
      val padded = " " + text.toLowerCase + " "
      val scores = langMarkers.map { case (lang, ms) =>
        lang -> ms.count(m => padded.contains(m))
      }
      val best = scores.filter(_._2 > 0)
      if (best.isEmpty) "und"
      else best.toSeq.sortBy { case (l, s) => (-s, l) }.head._1
    }
  }

  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("lang_pred", langIdUdf(col(textCol)))
}
