package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Entity linking (SURVEY §2 C11): mention → candidate entities via blocking-key
  * candidate generation + a salted broadcast/hash join against the entity
  * dictionary, then best-candidate selection.
  *
  * Scale design (north rule): the dictionary side is small relative to mentions
  * (10^6-ish entities vs 10^12 docs) → `broadcast()` it and the join is
  * shuffle-free. When the dictionary is too big to broadcast, the shuffle join
  * is salted: hot blocking keys (Zipfian mention surfaces) are split over
  * `saltBuckets` sub-keys — mention side gets pmod(xxhash64(doc_id), salt), the
  * dictionary side explodes over all salts — plus AQE skew-join splitting as the
  * runtime backstop (spark.sql.adaptive.skewJoin.enabled).
  */
object Linker {

  /** Normalization: case fold, strip punctuation, collapse whitespace. */
  def normalizeKeyCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(lower(c), "[\\p{Punct}]", ""), "\\s+", " "))

  /** Blocking key: FIRST TOKEN of the normalized string. A genuine blocking
    * key (candidates share a cheap signature, scoring decides) rather than
    * exact-match lookup — candidate sets stay small while near-miss surfaces
    * ("acme corp" vs "acme corporation") still meet their entity. */
  def blockKeyCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(split(normalizeKeyCol(c), " "), 1)

  /** Token-set Jaccard between two normalized strings (candidate scorer).
    * Pure Catalyst — array_intersect/array_union are set-semantic (dedup), so
    * this stays inside whole-stage codegen: at 10^12 mentions every candidate
    * pair would otherwise pay a UDF serialization boundary in an otherwise
    * fully codegen'd link plan. Null or token-less input scores 0.0. */
  def tokenJaccardCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sa = filter(split(a, " "), t => t =!= "")
    val sb = filter(split(b, " "), t => t =!= "")
    val inter = size(array_intersect(sa, sb))
    val uni = size(array_union(sa, sb))
    when(a.isNull || b.isNull || uni <= 0, lit(0.0))
      .otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Dictionary (entity_id, canonical, aliases, category) → one row per alias
    * block key. */
  def aliasBlocks(dict: DataFrame): DataFrame =
    dict
      .select(col("entity_id"), col("canonical"), col("category").as("dict_category"),
        explode(col("aliases")).as("alias"))
      .withColumn("alias_norm", normalizeKeyCol(col("alias")))
      .withColumn("block", blockKeyCol(col("alias")))
      .filter(col("block").isNotNull && col("block") =!= "")

  /** Link mentions (needs columns surface, category, doc_id, sent_id, occ,
    * scenario, level) against the dictionary.
    * Candidate score: TOKEN-SET JACCARD of the normalized surface vs the
    * alias (1.0 = exact token set; partial overlaps score fractionally) plus
    * 0.5 for category agreement; candidates below `minScore` are discarded
    * and the best survivor per mention wins (deterministic tie-break on
    * entity_id).
    */
  def link(
      mentions: DataFrame,
      dict: DataFrame,
      broadcastDict: Boolean = true,
      saltBuckets: Int = 8,
      minScore: Double = 0.6): DataFrame = {
    val blocks0 = aliasBlocks(dict)
    val m = mentions
      .withColumn("surface_norm", normalizeKeyCol(col("surface")))
      .withColumn("block", blockKeyCol(col("surface")))
      .filter(col("block").isNotNull && col("block") =!= "")

    val joined =
      if (broadcastDict) {
        m.join(broadcast(blocks0), Seq("block"), "inner")
      } else {
        // salted shuffle join: dict exploded over salts, mention side hashed
        val dictSalted = blocks0.withColumn("salt",
          explode(array((0 until saltBuckets).map(lit): _*)))
        val mSalted = m.withColumn("salt",
          pmod(xxhash64(col("doc_id"), col("sent_id")), lit(saltBuckets)).cast("int"))
        mSalted.join(dictSalted, Seq("block", "salt"), "inner").drop("salt")
      }

    // candidate score: token-set Jaccard of normalized surface vs alias,
    // + 0.5 category agreement; below minScore a candidate is discarded
    val scored = joined
      .withColumn("score",
        tokenJaccardCol(col("surface_norm"), col("alias_norm")) +
          when(col("category") === col("dict_category"), lit(0.5)).otherwise(lit(0.0)))
      .filter(col("score") >= minScore)

    val w = Window
      .partitionBy("doc_id", "sent_id", "scenario", "level", "start", "surface", "category", "occ")
      .orderBy(col("score").desc, col("entity_id").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .drop("rk", "block", "alias", "alias_norm", "surface_norm")
  }
}
