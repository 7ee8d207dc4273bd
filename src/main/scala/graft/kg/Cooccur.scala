package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity co-occurrence edges — canonical entities mentioned in the SAME
  * sentence, scored by exact-integer lift. The KG-construction step after
  * linking + canonicalization: co-occurrence with lift ≫ 1 is the standard
  * candidate-edge signal for relation extraction / KG densification
  * (reference scope ends at per-mention triples; this densifies ACROSS
  * mentions).
  *
  *   lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)
  *
  * emitted as basis points via truncating integer division over
  * DECIMAL(38,0) intermediates (n_ab·N·10⁴ can pass 2⁶³ at web scale;
  * DuckDB replays the identical arithmetic in HUGEINT) — no float, so the
  * oracle hash-matches.
  *
  * Scale shape: the sentence-level self-join fans out k²/2 pairs per
  * sentence where k = DISTINCT canonical entities in that sentence — bounded
  * by sentence length, never corpus-quadratic. The pair aggregation is a
  * map-side-combined groupBy on (ent_a, ent_b); marginals are an
  * entity-sized table (dictionary scale) joined back with broadcast. The
  * distinct mention set is checkpointed once so the count/marginal/pair
  * branches don't recompute the linking chain.
  */
object Cooccur {

  /** linked: one row per linked mention carrying (doc_id, sent_id,
    * canonical_id). Returns (ent_a, ent_b, n_ab, n_a, n_b, n_sent, lift_bp)
    * for pairs with n_ab ≥ minCount and lift ≥ minLiftBp/10⁴. N counts
    * sentences with ≥1 linked entity. */
  def edges(linked: DataFrame, minLiftBp: Long = 10000L,
            minCount: Long = 2L): DataFrame = {
    val sents = linked
      .select(col("doc_id"), col("sent_id"), col("canonical_id"))
      .distinct().localCheckpoint()
    val tot = sents.select("doc_id", "sent_id").distinct()
      .agg(count(lit(1)).as("n_sent"))
    val marg = sents.groupBy("canonical_id").agg(count(lit(1)).as("n_ent"))
    val pairs = sents.select(col("doc_id"), col("sent_id"), col("canonical_id").as("ent_a"))
      .join(sents.select(col("doc_id"), col("sent_id"), col("canonical_id").as("ent_b")),
        Seq("doc_id", "sent_id"))
      .filter(col("ent_a") < col("ent_b"))
      .groupBy("ent_a", "ent_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(broadcast(marg.select(col("canonical_id").as("ent_a"), col("n_ent").as("n_a"))), "ent_a")
      .join(broadcast(marg.select(col("canonical_id").as("ent_b"), col("n_ent").as("n_b"))), "ent_b")
      .crossJoin(broadcast(tot))
      .withColumn("lift_bp",
        expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * n_sent * 10000) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
      .filter(col("lift_bp") >= minLiftBp)
      .select("ent_a", "ent_b", "n_ab", "n_a", "n_b", "n_sent", "lift_bp")
  }
}
