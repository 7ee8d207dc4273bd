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

  // ---------- repetition signals (Gopher-style) ----------

  /** Per-doc n-gram repetition signals (the Gopher "repetition" filters,
    * Rae et al. 2021 §A1.1): fraction of the doc's n-grams taken by the single
    * most frequent n-gram (`top_gram_bp`) and fraction of n-gram occurrences
    * that are repeats (`dup_gram_bp`), both as exact integer basis points.
    *
    * Distributed shape: shingles are hashed to 48-bit longs (md5 fold —
    * [[Dedup.hash48Col]]) BEFORE the (doc, gram) count shuffle, so the shuffle
    * moves (long, long) pairs, never text; both groupBys get map-side partial
    * aggregation. Docs with fewer than n tokens have no n-grams and are
    * excluded (a 1-token doc has no repetition signal). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2): DataFrame = {
    // tokens PROJECTED to a column first: referencing the split(...) expression
    // inside the transform() lambda would re-split the text once per n-gram
    // index (O(len²) per doc — measured 4.1 s → 0.6 s at sf0.1)
    val toks = col("toks")
    // NON-distinct n-grams — repetition is about occurrence multiplicity
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
    df.select(col(idCol).as("doc_id"),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), Dedup.hash48Col(col("g")).as("h"))
      .groupBy("doc_id", "h").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_grams"),
        max("cnt").as("maxc"),
        count(lit(1)).as("ndist"))
      .select(col("doc_id"), col("n_grams"),
        expr("maxc * 10000 div n_grams").as("top_gram_bp"),
        expr("(n_grams - ndist) * 10000 div n_grams").as("dup_gram_bp"))
  }

  // ---------- composite quality filter (C4-style) ----------

  /** Composite document filter in the C4 / Gopher style (Raffel et al. 2020
    * §2.2; Rae et al. 2021 §A1): a doc is kept only if it passes ALL rules;
    * the output carries the FIRST failing rule's name so a pipeline can report
    * per-rule rejection rates. Every threshold is an integer inequality
    * (counts and basis points — no float compare), so the verdict is
    * bit-stable across engines. Pure Catalyst, single narrow pass. Rules:
    *   too_short     n_tokens < minTokens
    *   short_tokens  mean token length < 2   (100·Σlen < 200·n)
    *   long_tokens   mean token length > 12  (100·Σlen > 1200·n)
    *   no_stopwords  zero stopword hits (keyword dump, not running text)
    *   repetitive    distinct-token ratio < 25%  (10000·dist < 2500·n)
    *   symbol_soup   alpha-char ratio < 60%      (10000·alpha < 6000·len)
    */
  /** The verdict as a standalone Column — per-row and stateless, so the SAME
    * expression serves the batch filter and the streaming curation path. */
  def c4Reason(text: Column, minTokens: Int = 20,
               stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => t =!= "")
    val sw = array(stopwords.map(lit): _*)
    val n = size(toks).cast("long")
    val totChars = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val stopCnt = size(filter(toks, x => array_contains(sw, x))).cast("long")
    val distCnt = size(array_distinct(toks)).cast("long")
    val alphaChars = length(regexp_replace(text, "[^\\p{L}]", "")).cast("long")
    val len = length(text).cast("long")
    // null text first: every arithmetic predicate below evaluates to NULL on
    // null input, so without this branch a null document would fall through
    // to otherwise("ok") and pass the quality filter
    when(text.isNull, "null_text")
      .when(n < minTokens, "too_short")
      .when(totChars * 100L < n * 200L, "short_tokens")
      .when(totChars * 100L > n * 1200L, "long_tokens")
      .when(stopCnt === 0L, "no_stopwords")
      .when(distCnt * 10000L < n * 2500L, "repetitive")
      .when(alphaChars * 10000L < len * 6000L, "symbol_soup")
      .otherwise("ok")
  }

  def c4Filter(df: DataFrame, idCol: String, textCol: String,
               minTokens: Int = 20,
               stopwords: Seq[String] = defaultStopwords): DataFrame =
    df.select(col(idCol).as("doc_id"),
        c4Reason(col(textCol), minTokens, stopwords).as("reason"))
      .withColumn("keep", (col("reason") === "ok").cast("int"))

  // ---------- deterministic hash sampling ----------

  /** Seeded hash bucket in [0, 10000) for reproducible sampling: the md5-fold
    * 48-bit hash ([[Dedup.hash48Col]]) of "salt:id". Deterministic across
    * runs, engines, and partitionings — the property rand()-based sampling
    * lacks (a retry or repartition changes rand()'s draw; a hash of the
    * PRIMARY KEY never moves). */
  def hashBucket(id: Column, salt: String): Column =
    pmod(Dedup.hash48Col(concat(lit(salt + ":"), id.cast("string"))), lit(10000L))

  /** Deterministic EXACT-k sample per stratum: the k rows with the smallest
    * seeded hash of the primary key (ties — 48-bit collisions — broken by
    * the key itself, so the order is total and engine-replayable). The
    * fixed-SIZE counterpart of [[stratifiedHashSample]]'s fixed RATE: eval
    * and probe sets want exactly k docs per language/source regardless of
    * stratum size, and a hash-ranked sample stays STABLE as the corpus
    * grows — a doc already in the sample leaves only if a smaller-hash doc
    * arrives, so k stays fixed while membership churn is minimal (bottom-k
    * hashing is the same primitive as the KMV sketch, used here for row
    * selection instead of cardinality).
    * Scale: row_number ≤ k over (strata, hash) runs as partial+final
    * WindowGroupLimit — per-partition top-k heaps before the exchange,
    * never a full per-stratum sort (the vocabTopK plan shape). */
  def topKByHash(df: DataFrame, idCol: String, strataCols: Seq[String],
                 k: Int, salt: String = "sample"): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(col("_tkh_h").asc, col(idCol).asc)
    df.withColumn("_tkh_h", hashBucketRaw(col(idCol), salt))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("_tkh_h")
  }

  /** The un-bucketed 48-bit sampling hash (full resolution — bucketing to
    * 10^4 would make rank ties common; ranking wants the raw hash). */
  private def hashBucketRaw(id: Column, salt: String): Column =
    Dedup.hash48Col(concat(lit(salt + ":"), id.cast("string")))

  /** Deterministic epoch shuffle — the training-data "random shuffle" that
    * is reproducible, retry-stable and resumable: each doc draws a seeded
    * 48-bit hash; the permutation is `(shard, pos)` with
    * `shard = hash mod nShards` and `pos` = the rank of (hash, id) within
    * the shard — the order a loader consuming shard files sequentially
    * sees. Different epochs salt the hash differently → independent
    * permutations from the same immutable corpus, no stored state.
    *
    * Scale: deliberately NOT a global `row_number` (an unpartitioned window
    * serializes the corpus through one task — the classic trap): one
    * Exchange on `shard` + per-shard sort, with nShards sized to the
    * cluster so each shard is corpus/nShards docs and becomes one output
    * file. Only (id, hash) pairs shuffle; text stays columnar. */
  def epochShuffle(df: DataFrame, idCol: String, nShards: Int, epoch: Int = 0,
                   salt: String = "epoch"): DataFrame = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_es_h").asc, col(idCol).asc)
    df.withColumn("_es_h", hashBucketRaw(col(idCol), s"$salt$epoch"))
      .withColumn("shard", pmod(col("_es_h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("_es_h")
  }

  /** Stratified deterministic sample: keep a row iff its hash bucket falls
    * under the per-row rate (basis points), which may depend on strata
    * columns — e.g. downsample a dominant language while keeping the tail
    * (the usual training-mixture rebalance). Narrow, shuffle-free, and
    * repeatable: the same (salt, id) always lands on the same side. */
  def stratifiedHashSample(df: DataFrame, idCol: String, rateBp: Column,
                           salt: String = "sample"): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < rateBp)

  /** Leakage-safe train/val/test split: the split is a deterministic hash
    * of the GROUP column (domain / source / site), never of the document —
    * so every doc of a group lands in the SAME split and near-duplicate
    * pages from one site can never straddle train and eval (the standard
    * contamination guard; the complement of [[graft.datapipe.Dedup
    * .contaminationCheck]], which audits a split after the fact). Rates in
    * basis points of GROUPS, not docs: `test` gets buckets `[0, testBp)`,
    * `val` gets `[testBp, testBp+valBp)`, `train` the rest. Deterministic,
    * narrow and shuffle-free (one hash + CASE per row); resuming or growing
    * the corpus never moves an existing group across splits. */
  def leakageSafeSplit(df: DataFrame, groupCol: String,
                       valBp: Int = 100, testBp: Int = 100,
                       salt: String = "split"): DataFrame = {
    require(valBp >= 0 && testBp >= 0 && valBp + testBp <= 10000,
      s"rates must satisfy 0 <= valBp + testBp <= 10000, got $valBp + $testBp")
    val b = hashBucket(col(groupCol), salt)
    df.withColumn("split",
      when(b < lit(testBp.toLong), lit("test"))
        .when(b < lit((testBp + valBp).toLong), lit("val"))
        .otherwise(lit("train")))
  }

  /** CCNet head/middle/tail quality buckets (Wenzek et al. 2020 §4.3): per
    * language, documents are split into three equal-population tiers by
    * their [[lmPerplexity]] score — `head` (lowest perplexity, cleanest),
    * `middle`, `tail` (likely gibberish/boilerplate); pretraining mixes
    * sample the tiers at different rates. Thresholds use percentile_disc
    * RANK ARITHMETIC ([[tokenLenPercentiles]] device): t1 = smallest ppl
    * with 3·rank ≥ n, t2 = smallest with 3·rank ≥ 2n; bucket = head iff
    * ppl ≤ t1, middle iff ppl ≤ t2, else tail — deterministic integers,
    * tie-invariant, engine-replayable.
    *
    * Shape: the ppl scores ride [[lmPerplexity]]'s plan; the threshold pass
    * shuffles (lang, ppl) longs only — the standard stats-per-stratum job —
    * and the per-language threshold table (2 longs per language) broadcast
    * joins back. At 10^12 docs swap the exact rank pass for the mergeable
    * quantile-histogram sketch ([[graft.datapipe.Sketch]]), identical
    * downstream. */
  def pplBuckets(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", langCol: String = "lang",
                 trainBp: Int = 8000, salt: String = "lmtrain"): DataFrame = {
    val ppl = lmPerplexity(df, textCol, idCol, trainBp = trainBp, salt = salt)
      .join(df.select(col(idCol), col(langCol)), idCol)
      .localCheckpoint(false) // threshold pass + final labeling share one scoring run
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(langCol).orderBy("ppl_micro")
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(langCol)
    val thr = ppl
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(langCol).agg(
        min(when(col("rk") * 3 >= col("n"), col("ppl_micro"))).as("t1"),
        min(when(col("rk") * 3 >= col("n") * 2, col("ppl_micro"))).as("t2"))
    ppl.join(broadcast(thr), langCol)
      .select(col(idCol), col(langCol), col("ppl_micro"),
        when(col("ppl_micro") <= col("t1"), lit("head"))
          .when(col("ppl_micro") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Sketch-thresholded CCNet tiers — the 10^12-rows/stratum twin of
    * [[pplBuckets]] (the swap that method's scaladoc documents). The exact
    * twin ranks every (lang, ppl) row inside one window partition — at
    * 10^12 docs per language that per-stratum sort IS the job. Here the
    * threshold pass runs on the mergeable quantile-histogram sketch
    * ([[Sketch.qhBins]]): the exchange carries (lang, bin, count) rows —
    * ≤ ~2^11 bins per language regardless of corpus size, map-side combined
    * — and the SAME ×3 rank arithmetic picks threshold BINS (t1_bin =
    * first bin whose cumulative count reaches ⌈n/3⌉). Because the bin index
    * is monotone in ppl, the exact threshold VALUE always lands inside
    * t1_bin, so the two twins can only disagree on docs sharing the
    * threshold's bin (< 2^−sub relative width) — asserted in DatapipeSpec.
    * Labeling compares each doc's bin to the threshold bins (bin ≤ t1_bin →
    * head, ≤ t2_bin → middle, else tail): deterministic integers, no
    * float dust, engine-replayable. */
  def pplBucketsSketch(df: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id", langCol: String = "lang",
                       trainBp: Int = 8000, salt: String = "lmtrain",
                       sub: Int = 5): DataFrame = {
    val ppl = lmPerplexity(df, textCol, idCol, trainBp = trainBp, salt = salt)
      .join(df.select(col(idCol), col(langCol)), idCol)
    // one scoring pass shared by the sketch build and the final labeling
    val binned = Sketch.qhBinOf(ppl, col("ppl_micro"), sub).localCheckpoint(false)
    val bins = binned.groupBy(langCol, "bin").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(langCol).orderBy("bin")
    val thr = bins.withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(langCol)))
      .groupBy(langCol).agg(
        min(when(col("cum") * 3 >= col("n"), col("bin"))).as("t1_bin"),
        min(when(col("cum") * 3 >= col("n") * 2, col("bin"))).as("t2_bin"))
    binned.join(broadcast(thr), langCol)
      .select(col(idCol), col(langCol), col("ppl_micro"),
        when(col("bin") <= col("t1_bin"), lit("head"))
          .when(col("bin") <= col("t2_bin"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Per-domain curation snapshot (the C4/RefinedWeb domain-triage table):
    * one row per group (source / registrable domain) with exact-integer
    * corpus-health signals — doc count, token mass, mean doc length,
    * short-doc fraction, and the exact-duplicate fraction (docs whose
    * content fingerprint occurs ≥ 2× CORPUS-WIDE, so a domain mirroring
    * another domain's pages is charged for it). Pipelines read this table
    * to blocklist mirror-heavy or boilerplate domains BEFORE the per-doc
    * passes run — at 10^12 docs, dropping a domain here is free; filtering
    * its docs one by one later is not.
    *
    * `fp` is the caller's fingerprint expression (full-text md5 in
    * production; tests/fixtures may pass a prefix fingerprint to exercise
    * the dup math on unique-text corpora). Fractions are basis points with
    * truncating division — engine-replayable integers.
    *
    * Shape: one narrow per-doc projection (group, fp, n_tokens); fingerprint
    * multiplicities are a map-side-combined groupBy on fp whose shuffle rows
    * are (fp, count) pairs; the join back is fp-keyed (hash or SMJ via AQE)
    * carrying (group, fp, n_tokens) longs; the final per-group rollup is
    * again map-side combined. Text never shuffles. */
  def domainStats(df: DataFrame, groupCol: String, fp: Column,
                  textCol: String = "text", shortTokens: Int = 10): DataFrame = {
    val docs = df.select(col(groupCol).as("grp"), fp.as("fp"),
      coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)).as("n_tok"))
    val mult = docs.groupBy("fp").agg(count(lit(1)).as("fp_n"))
    docs.join(mult, "fp")
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum(when(col("fp_n") >= 2, 1L).otherwise(0L)).as("dup_docs"),
        sum(when(col("n_tok") < shortTokens, 1L).otherwise(0L)).as("short_docs"))
      .select(col("grp").as(groupCol), col("n_docs"), col("n_tokens"),
        expr("n_tokens div n_docs").as("mean_tokens"),
        col("dup_docs"),
        expr("(dup_docs * 10000L) div n_docs").as("dup_bp"),
        col("short_docs"),
        expr("(short_docs * 10000L) div n_docs").as("short_bp"))
  }

  // ---------- corpus vocabulary ----------

  /** Corpus-level top-k vocabulary by occurrence count with a deterministic
    * rank (ties broken by token). The groupBy gets map-side partial
    * aggregation (the shuffle carries one row per distinct token per
    * partition, not one per occurrence); the global sort ranks only the
    * vocab-sized aggregate, and the window runs on k rows post-limit. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    val counts = df
      .select(explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("tok"))
    counts.orderBy(col("n").desc, col("tok")).limit(k)
      .withColumn("rk", row_number().over(w))
  }

  /** One BPE merge-selection iteration, distributed: the top-k most frequent
    * ADJACENT CHARACTER PAIRS across the corpus, weighted by word frequency —
    * the statistic a BPE tokenizer trainer computes to pick its next merge
    * (Sennrich et al. 2016 §3.2). The scale trick is aggregating to the
    * VOCABULARY first: the corpus-sized pass reduces to (word, freq) rows via
    * one map-side-combined groupBy, and the pair explosion then runs over the
    * vocab (≈10⁵–10⁷ rows regardless of corpus size), never over raw tokens.
    * Single-character words carry no pairs and are filtered symmetrically in
    * the oracle. Character semantics: both engines slice by codepoint for BMP
    * text (Spark substring = UTF-16 units, DuckDB = characters — identical
    * off the astral planes, and the corpus is Hebrew+ASCII). */
  def bpeMergePairs(df: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    val words = df
      .select(explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val pairs = words
      .select(explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
        col("freq"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("pair"))
    pairs.orderBy(col("cnt").desc, col("pair")).limit(k)
      .withColumn("rk", row_number().over(w))
  }

  /** FULL BPE trainer (Sennrich et al. 2016 §3.2) — the iterated version of
    * [[bpeMergePairs]]: `nMerges` rounds of (count adjacent pairs → pick the
    * most frequent → merge it everywhere), returning the ordered merge table
    * `(step, a, b, merged, cnt)` that IS a trained BPE tokenizer.
    *
    * Scale shape: the corpus is touched ONCE (the word-frequency groupBy,
    * map-side combined); every iteration then runs over the VOCABULARY
    * aggregate (≈10⁵–10⁷ rows regardless of corpus size) — one vocab-sized
    * pair explosion + groupBy, a 1-row argmax to the driver (metadata-scale),
    * and a narrow merge rewrite, with a `localCheckpoint` per round to cut
    * the growing lineage. This is how production tokenizer trainers work
    * (aggregate first, iterate on counts); for the ~30k merges of a real
    * tokenizer the same aggregate fits one node and the loop runs
    * driver-local — the distributed loop here is for the analysis-sized
    * `nMerges` where each round's statistics are worth distributing.
    *
    * Semantics pinned by the oracle: pair counts include overlapping
    * adjacents ([a,a,a] counts (a,a) twice); the chosen merge applies
    * left-to-right non-overlapping ([a,a,a] → [aa,a]); ties break on
    * (cnt DESC, a ASC, b ASC) in binary UTF-8 order. Words containing the
    * oracle's sentinel codepoints (U+2402/U+2403) are filtered symmetrically
    * on both sides (impossible in the fixture corpus — the filter exists so
    * the parity contract is total). */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    val words = df
      .select(explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")).as("w"))
      .filter(!col("w").contains("␂") && !col("w").contains("␃"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var state = words
      .select(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("toks"),
        col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      // fully-merged words carry no pairs — and must be FILTERED, not fed to
      // sequence(1, 0), which descends ([1,0]) instead of being empty
      val top = state
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))")).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect() // 1 row: the argmax is metadata-scale by definition
      if (top.isEmpty) done = true // corpus fully merged before nMerges rounds
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, a, b, a + b, cnt))
        // left-to-right non-overlapping merge: fold the token array; `get`
        // (total, null OOB) instead of ANSI element_at — And does not
        // short-circuit, so the last-element probe must be safe on empty acc
        val prev = state
        state = state
          .withColumn("toks", aggregate(col("toks"),
            array().cast("array<string>"),
            (acc, x) =>
              when(get(acc, size(acc) - 1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint()
        prev.unpersist()
        step += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq.map(Row.fromTuple), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("step", org.apache.spark.sql.types.IntegerType, false),
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("merged", org.apache.spark.sql.types.StringType, false),
        org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType, false))))
  }

  /** Apply a trained merge table to text: segment each whitespace word with
    * the merges in order (the BPE ENCODE step), returning
    * (doc_id, n_bpe_tokens) — the statistic a mixture/packing planner needs.
    * `mergesLocal` is the (tiny) collected merge table, broadcast inside the
    * closure-free Catalyst expression chain: the merge loop is unrolled into
    * `merges.length` nested HOF rewrites, all codegen-friendly, no UDF. */
  def bpeSegmentCount(df: DataFrame, textCol: String,
                      mergesLocal: Seq[(String, String)]): DataFrame = {
    // words → per-word char arrays (dynamic index ⇒ SQL-string HOF), then the
    // merge list unrolled as nested fold rewrites — one Catalyst tree, no UDF
    val perWord: Column = expr(
      s"transform(filter(split(lower($textCol), '\\\\s+'), " +
        "t -> t != '' AND NOT contains(t, '␂') AND NOT contains(t, '␃')), " +
        "w -> transform(sequence(1, length(w)), i -> substring(w, i, 1)))")
    val folded = mergesLocal.foldLeft(perWord) { case (acc, (a, b)) =>
      transform(acc, toks =>
        aggregate(toks, array().cast("array<string>"),
          (accum, x) =>
            when(get(accum, size(accum) - 1) === lit(a) && x === lit(b),
              concat(slice(accum, lit(1), size(accum) - 1), array(lit(a + b))))
            .otherwise(concat(accum, array(x)))))
    }
    df.select(col("doc_id"),
      aggregate(transform(folded, t => size(t)), lit(0),
        (s, n) => s + n).cast("long").as("n_bpe_tokens"))
  }

  // ---------- corpus statistics ----------

  /** Exact per-group percentiles of the whitespace token count, computed by
    * RANK ARITHMETIC (percentile_disc semantics: the smallest value whose
    * rank r satisfies 100·r ≥ p·n) — deterministic integers, identical in
    * every engine, unlike interpolating percentile functions whose formulas
    * differ across implementations. Tie-invariant: if the boundary rank lands
    * inside a run of equal values, the selected value is that run's value
    * regardless of tie order.
    *
    * Shape: one window shuffle on the group key (rank + group size share the
    * partition), then one partial-agg groupBy. The shuffled rows are
    * (group, long) pairs — at corpus scale this is the standard
    * statistics-per-stratum job, linear and skew-tolerant (a hot language is
    * one big sort partition; AQE splits it). */
  def tokenLenPercentiles(df: DataFrame, textCol: String, groupCol: String,
                          ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("n_tokens")
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val ranked = df
      .select(col(groupCol).as("grp"),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      // null-text docs have no token length — exclude them from the ranks
      // (Spark windows sort NULLS FIRST, DuckDB NULLS LAST: admitting nulls
      // would shift every percentile differently per engine)
      .filter(col("n_tokens").isNotNull)
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
    val aggs = count(lit(1)).as("n_docs") +:
      ps.map(p => min(when(col("rk") * 100 >= col("n") * p, col("n_tokens"))).as(s"p$p"))
    ranked.groupBy("grp").agg(aggs.head, aggs.tail: _*)
  }

  // ---------- PII detection / redaction ----------

  /** PII patterns chosen to evaluate IDENTICALLY under Java regex (Spark
    * codegen) and RE2 (the DuckDB oracle): character classes, bounded
    * quantifiers and \b only — no backreferences, no lookaround, nothing
    * where the engines' matching disciplines could diverge. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val longIdRe = "\\b\\d{9,}\\b"

  /** PII signals + redaction: per-doc counts of emails, IPv4 addresses, and
    * long (≥9-digit) numeric identifiers, plus the md5 fingerprint of the
    * redacted text — so a pipeline can PROVE two engines redact identically
    * without ever materializing the redacted corpus twice. Replacement order
    * matters and is fixed: emails first (an address can contain digit runs),
    * then IPs, then bare long ids; the placeholders contain no digits, so
    * no pass can create a match for a later pass. Each count is taken on the
    * text AS THE CORRESPONDING PASS SEES IT (post-previous-redactions) —
    * counting every pattern on the original text can disagree with what was
    * actually replaced, e.g. in "a@b.com192.168.4.7" the IP has no \\b
    * boundary until <EMAIL> is substituted in, and a digit run inside a
    * matched email would be counted as an id yet never replaced. So
    * n_emails + n_ipv4 + n_long_ids always equals the number of
    * placeholders in the redacted text. Pure Catalyst
    * (regexp_extract_all / regexp_replace) — narrow, shuffle-free, codegen. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def countRe(c: org.apache.spark.sql.Column, re: String) =
      size(regexp_extract_all(c, lit(re), lit(0)))
    val t1 = regexp_replace(col(textCol), emailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, longIdRe, "<ID>")
    df.select(col(idCol).as("doc_id"),
      countRe(col(textCol), emailRe).as("n_emails"),
      countRe(t1, ipv4Re).as("n_ipv4"),
      countRe(t2, longIdRe).as("n_long_ids"),
      md5(t3).as("redacted_fp"))
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

  // ---------- bigram LM quality score (CCNet-style perplexity filter) ----------

  /** µ-log: floor(1e6 · ln n) — the fixed-point log scale of the LM score.
    * JVM-evaluated at MODEL build time only (one call per distinct
    * token/bigram, never in the corpus-scale path); [[lmLogTable]] dumps the
    * same values so the oracle shares one log definition instead of trusting
    * cross-engine `ln` ULP agreement on floor boundaries. */
  def logMicro(n: Long): Long = math.floor(math.log(n.toDouble) * 1e6).toLong
  private val logMicroUdf = udf { (n: Long) => logMicro(n) }

  /** `['<s>'] ++ whitespace-tokens(lower(text))` — the scored sequence.
    * Same tokenization as [[vocabTopK]]/quality-basis (empties filtered). */
  private def lmSeqs(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      concat(array(lit("<s>")),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")).as("seq"))

  /** Adjacent-token bigrams of each sequence: (id, w1, w2) rows. */
  private def lmPairs(seqs: DataFrame, idCol: String): DataFrame = seqs
    .select(col(idCol), explode(when(size(col("seq")) >= 2,
        expr("transform(sequence(0, size(seq)-2), i -> struct(seq[i] AS w1, seq[i+1] AS w2))"))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("p"))
    .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))

  /** Per-document bigram-LM "surprise" — the CCNet quality signal (Wenzek et
    * al. 2020 §4.3, there via KenLM): train a count LM on a deterministic
    * hash slice of the corpus (`trainBp` basis points, same 48-bit
    * hash-bucket primitive as [[stratifiedHashSample]] — stable under
    * retries/repartitioning), then score EVERY document by its mean
    * per-bigram negative log-likelihood under add-one smoothing:
    * `p(w2|w1) = (c2(w1,w2)+1) / (c1(w1)+V)`. Boilerplate, gibberish and
    * out-of-distribution text score high `ppl_micro` and can be filtered.
    *
    * Integer-exact by construction: log-probabilities live on the µ-log
    * scale ([[logMicro]]) ATTACHED TO THE MODEL ROWS at build time, and the
    * per-pair cost is a difference of two integers,
    * `L(c1(w1)+V) − L(c2(w1,w2)+1)` (≥ 0 since c2 ≤ c1 and V ≥ 1; unseen
    * prefix costs the backoff constant L(V), unseen pair subtracts
    * L(1) = 0). Per doc: `nll_micro = Σ cost`, `ppl_micro = nll_micro div
    * n_bigrams` (floor division — both engines agree on non-negatives).
    *
    * Scale: the train slice is a narrow hash filter; both model builds are
    * map-side-combined groupBys whose shuffles carry one row per DISTINCT
    * token/bigram per partition; scoring is two equi-joins of the corpus
    * bigram stream against vocab-sized models (AQE broadcasts them when
    * small, sort-merge otherwise) and a per-doc partial agg — the full text
    * never shuffles. At 10^12 docs prune the bigram model with `minCount`:
    * unseen pairs already cost only the backoff term, so dropping
    * low-count pairs perturbs scores minimally while bounding model size. */
  def lmPerplexity(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   trainBp: Int = 8000, minCount: Long = 1L,
                   salt: String = "lmtrain"): DataFrame = {
    require(trainBp > 0 && trainBp <= 10000, s"trainBp in (0, 10000], got $trainBp")
    val seqs = lmSeqs(df, textCol, idCol)
    // materialize the tokenized train slice ONCE: three consumers below
    // (V scalar, unigram model, bigram model) would otherwise each re-read
    // and re-tokenize the 80% slice; uni0 likewise feeds both V and uniM
    val train = seqs.filter(hashBucket(col(idCol), salt) < lit(trainBp))
      .localCheckpoint(false) // lazy: the V action below materializes both
    val uni0 = train.select(explode(col("seq")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
      .localCheckpoint(false) // vocab-sized
    // V and the backoff constant L(V): two scalars (metadata-scale action)
    val v = uni0.agg(count(lit(1))).first().getLong(0)
    require(v > 0, "empty LM training slice — raise trainBp or check the corpus")
    val lv = logMicro(v)
    val uniM = uni0.select(col("tok").as("w1"), logMicroUdf(col("c1") + lit(v)).as("lb"))
    val biM = lmPairs(train, idCol).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
      .select(col("w1"), col("w2"), logMicroUdf(col("c2") + lit(1L)).as("la"))
    lmPairs(seqs, idCol)
      .join(biM, Seq("w1", "w2"), "left")
      .join(uniM, Seq("w1"), "left")
      .withColumn("cost", coalesce(col("lb"), lit(lv)) - coalesce(col("la"), lit(0L)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cost")).as("nll_micro"))
      .withColumn("ppl_micro", expr("nll_micro div n_bigrams"))
  }

  /** The µ-log table `1..(max c1 + V)` — every value [[lmPerplexity]] can
    * look up. Oracle-parity scaffolding (dumped to `{{AUX}}/lm_logtab`):
    * the engine computes L at model build time from the same [[logMicro]]. */
  def lmLogTable(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                 trainBp: Int = 8000, salt: String = "lmtrain"): DataFrame = {
    val train = lmSeqs(df, textCol, idCol).filter(hashBucket(col(idCol), salt) < lit(trainBp))
    val uni0 = train.select(explode(col("seq")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val r = uni0.agg(count(lit(1)), max("c1")).first()
    require(r.getLong(0) > 0,
      "empty LM training slice — raise trainBp or check the corpus")
    val maxN = r.getLong(1) + r.getLong(0)
    df.sparkSession.range(1, maxN + 1)
      .select(col("id").as("n"), logMicroUdf(col("id")).as("l"))
  }

  /** DSIR-style hashed importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): estimate the TARGET
    * domain's and the RAW pool's unigram distributions over `buckets` fixed
    * hash buckets, then score every document by its log importance weight
    * `log p_target(doc) − log p_raw(doc)` under the hashed bag-of-buckets
    * model with add-one smoothing. High-weight docs look like the target
    * domain and get upweighted/resampled when assembling a pretraining mix.
    *
    * Hashing into a FIXED bucket count is the published algorithm's own
    * scale trick — both model tables are ≤ `buckets` rows by construction
    * regardless of corpus size, so they broadcast at any scale.
    *
    * Integer-exact by construction (same µ-log device as [[lmPerplexity]]):
    * with per-bucket counts ct/cr and totals Tt/Tr,
    * `logw = Σ_tok [L(ct(b)+1) − L(cr(b)+1)] − n_tok·[L(Tt+B) − L(Tr+B)]`
    * where every L is a [[logMicro]] value attached at model-build time —
    * the corpus-scale path is pure integer arithmetic.
    *
    * Scale: per-doc bucket counts are ONE map-side-combined groupBy whose
    * shuffle rows are (id, bucket, cnt) — text never shuffles; the λ join is
    * a B-row broadcast; Tt/Tr are a 2-scalar metadata action. */
  def dsirWeights(df: DataFrame, targetPred: Column,
                  textCol: String = "text", idCol: String = "doc_id",
                  buckets: Int = 1024, salt: String = "dsir"): DataFrame = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    val tokB = df.select(col(idCol), targetPred.as("is_tgt"),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("is_tgt"), explode(col("toks")).as("tok"))
      .select(col(idCol), col("is_tgt"),
        (Dedup.hash48Col(concat(lit(salt + ":"), col("tok"))) % buckets).as("b"))
    // (doc, bucket) counts materialized ONCE: the bucket models below are a
    // second-level fold of this aggregate, so tokenize+md5 runs one time
    val docB = tokB.groupBy(col(idCol), col("is_tgt"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // lazy: the totals action below materializes it
    val bc = docB.groupBy("b").agg(
        sum("cnt").as("cr"),
        sum(when(col("is_tgt"), col("cnt")).otherwise(lit(0L))).as("ct"))
      .localCheckpoint(false) // ≤ B rows
    val r = bc.agg(sum("cr"), sum("ct")).first()
    val tr = r.getLong(0)
    val tt = r.getLong(1)
    require(tt > 0, "empty DSIR target slice — check targetPred")
    val kMicro = logMicro(tt + buckets) - logMicro(tr + buckets)
    val lam = bc.select(col("b"),
      (logMicroUdf(col("ct") + lit(1L)) - logMicroUdf(col("cr") + lit(1L))).as("lam"))
    docB.join(lam, Seq("b"))
      .groupBy(col(idCol))
      .agg(sum("cnt").as("n_tok"), sum(col("cnt") * col("lam")).as("s"))
      .select(col(idCol), col("n_tok"),
        (col("s") - col("n_tok") * lit(kMicro)).as("logw_micro"))
  }

  /** µ-log table `1..(Tr + buckets)` covering every value [[dsirWeights]]
    * looks up (ct+1, cr+1 ≤ Tr+1; the two total terms are Tt+B ≤ Tr+B).
    * Oracle-parity scaffolding (dumped to `{{AUX}}/dsir_logtab`) —
    * FIXTURE-SCALE ONLY: the table grows with the corpus token count, so it
    * is materializable only at oracle/test sizes; the engine itself calls
    * [[logMicro]] directly (O(1) per lookup at any corpus size). */
  def dsirLogTable(df: DataFrame, textCol: String = "text",
                   buckets: Int = 1024): DataFrame = {
    val tr = df.select(size(filter(split(lower(col(textCol)), "\\s+"),
        t => t =!= "")).cast("long").as("n"))
      .agg(sum("n")).first().getLong(0)
    df.sparkSession.range(1, tr + buckets + 1)
      .select(col("id").as("n"), logMicroUdf(col("id")).as("l"))
  }
}
