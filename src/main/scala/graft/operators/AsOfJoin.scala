package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join — for each left row, the latest right row with
  * right.ts ≤ left.ts on the same key. Spark lacks this operator natively;
  * the reference has no joins beyond equi/semi (SURVEY §2 H), so this is one
  * of the beyond-reference operators composed from built-ins (extension
  * preference (a), SURVEY §7.4).
  *
  * Technique: tag + union + sorted window with `last(_, ignoreNulls)` — ONE
  * shuffle on the key, a per-partition sort, and NO range explosion (the naive
  * `l.ts >= r.ts` theta-join materializes O(n·m) pairs per key before
  * aggregation; this stays O(n+m)). Skewed keys ride on AQE like any other
  * single-shuffle op. Right rows sort before left rows at equal timestamps, so
  * ties match (ts-inclusive semantics, same as DuckDB's ASOF JOIN).
  */
object AsOfJoin {

  /** @param rightPayload right columns to carry onto matches (prefixed `asof_`)
    * @return left rows that found a match, with asof_<payload> columns */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    // null timestamps cannot be matched: a null right._t sorts first/last in
    // the window and would otherwise surface as a spurious "match"
    val l = left
      .filter(col(leftTs).isNotNull)
      .withColumn("_t", col(leftTs))
      .withColumn("_tag", lit(1))
    val r = right
      .filter(col(rightTs).isNotNull)
      .select((key.map(col) :+ col(rightTs).as("_t")) ++ rightPayload.map(col): _*)
      .withColumn("_tag", lit(0))
      .withColumn("_payload", struct(rightPayload.map(col): _*))
      .drop(rightPayload: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right (_tag 0) before left (_tag 1) at equal _t → ties match;
    // payload struct as a final sort key keeps equal-ts right rows deterministic
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t").asc, col("_tag").asc, col("_payload").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_asof").isNotNull)
      .select(
        left.columns.map(col) ++
          rightPayload.map(p => col(s"_asof.$p").as(s"asof_$p")): _*)
  }

  /** As-of FORWARD join — for each left row, the earliest right row with
    * right.ts ≥ left.ts on the same key. Same union+window technique with the
    * timestamp order reversed; still one shuffle, no range explosion. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    // null timestamps cannot be matched: a null right._t sorts first/last in
    // the window and would otherwise surface as a spurious "match"
    val l = left
      .filter(col(leftTs).isNotNull)
      .withColumn("_t", col(leftTs))
      .withColumn("_tag", lit(1))
    val r = right
      .filter(col(rightTs).isNotNull)
      .select((key.map(col) :+ col(rightTs).as("_t")) ++ rightPayload.map(col): _*)
      .withColumn("_tag", lit(0))
      .withColumn("_payload", struct(rightPayload.map(col): _*))
      .drop(rightPayload: _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // descending ts: the running window holds rows with _t ≥ current; right
    // rows sort before left at equal _t so ties match (ts-inclusive)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t").desc, col("_tag").asc, col("_payload").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_asof").isNotNull)
      .select(
        left.columns.map(col) ++
          rightPayload.map(p => col(s"_asof.$p").as(s"asof_$p")): _*)
  }
}
