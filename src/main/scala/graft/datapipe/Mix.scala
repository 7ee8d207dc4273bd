package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mixture planning: turn per-stratum corpus statistics and target
  * mixture weights into deterministic per-stratum sampling rates that hit a
  * global token budget (the static mixture-rebalance step a training-data
  * run executes before packing — DoReMi-style weights in, rates out).
  *
  * All arithmetic is exact integer (token counts, basis points, truncating
  * div) so the plan is engine-stable and DuckDB-replayable. Downsampling
  * only: a stratum whose target exceeds its supply caps at rate 10⁴ bp and
  * is flagged `capped` (upsampling/repetition is a training-loop decision,
  * not a corpus operation). Long arithmetic holds to ~10¹⁴ budget tokens
  * (budget·10⁴ < 2⁶³); beyond that, widen to DECIMAL(38,0) like Cooccur.
  *
  * Scale shape: one map-side-combined groupBy on the stratum key (stratum
  * cardinality ≪ corpus), the weight table is a literal broadcast, and
  * applying the plan is a broadcast join + the deterministic hash-bucket
  * filter — no extra shuffle on the corpus side.
  */
object Mix {

  /** Per-stratum plan: (stratum, n_docs, n_tokens, target_bp,
    * desired_tokens, rate_bp, planned_tokens, capped). Strata absent from
    * `weightsBp` are excluded (weight 0). */
  def plan(df: DataFrame, stratumCol: String, textCol: String,
           weightsBp: Map[String, Long], budgetTokens: Long): DataFrame = {
    require(weightsBp.values.forall(_ >= 0L), "negative weight")
    require(weightsBp.values.sum <= 10000L, "weights exceed 10000 bp")
    val spark = df.sparkSession
    import spark.implicits._
    // per-row coalesce: a null text counts 0 tokens, so a stratum of null
    // docs aggregates to n_tokens = 0 (a null SUM would otherwise flow into
    // the rate div, and least() SKIPS nulls → silent rate_bp = 10000 with
    // planned_tokens = NULL — unaccounted keep-all)
    val stats = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(TextQuality.tokenCount(col(textCol)).cast("long"), lit(0L)))
          .as("n_tokens"))
    val weights = weightsBp.toSeq.sortBy(_._1).toDF("stratum", "target_bp")
    stats.join(broadcast(weights), "stratum")
      .withColumn("desired_tokens", expr(s"(${budgetTokens}L * target_bp) div 10000"))
      // zero-token stratum: keep-all EXPLICITLY (its docs cost no budget;
      // planned_tokens stays an honest 0) instead of via div-by-zero null
      .withColumn("rate_bp",
        when(col("n_tokens") === 0L, lit(10000L))
          .otherwise(least(lit(10000L), expr("(desired_tokens * 10000) div n_tokens"))))
      .withColumn("planned_tokens", expr("(n_tokens * rate_bp) div 10000"))
      .withColumn("capped", (col("desired_tokens") > col("n_tokens")).cast("int"))
      .select("stratum", "n_docs", "n_tokens", "target_bp", "desired_tokens",
        "rate_bp", "planned_tokens", "capped")
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * rebalance of mT5/XLM-R (Xue et al. 2021 §3.1; Conneau et al. 2020
    * §3.1): `weight_s ∝ n_tokens_s^α` flattens the head strata and boosts
    * the tail, with α = (1/2)^sqrtIters. α is restricted to powers of 1/2
    * because k-fold `sqrt` is IEEE correctly-rounded in EVERY engine —
    * bit-identical and DuckDB-replayable — while `pow(x, 0.3)` is
    * libm-dependent. Output is floored basis points (Σ ≤ 10⁴), exactly the
    * `weightsBp` input of [[plan]].
    *
    * Scale shape: one map-side-combined groupBy to stratum stats (≪
    * corpus); the normalizing sum folds a SINGLE strata-sized collected
    * array in sorted-stratum order, so the double addition order is fixed
    * and engine-stable (the "sequential double fold" convention). */
  def temperatureWeightsBp(df: DataFrame, stratumCol: String, textCol: String,
                           sqrtIters: Int = 1): DataFrame = {
    require(sqrtIters >= 0 && sqrtIters <= 4, s"sqrtIters in [0,4], got $sqrtIters")
    val wExpr = (0 until sqrtIters)
      .foldLeft("cast(n_tokens as double)")((e, _) => s"sqrt($e)")
    val scaled = df.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(coalesce(TextQuality.tokenCount(col(textCol)).cast("long"), lit(0L)))
        .as("n_tokens"))
      .withColumn("w", expr(wExpr))
    val denom = scaled.agg(expr(
      "aggregate(array_sort(collect_list(struct(stratum, w))), 0D, (a, s) -> a + s.w)")
      .as("denom"))
    scaled.crossJoin(broadcast(denom))
      .withColumn("weight_bp",
        when(col("denom") > 0.0,
          floor(lit(10000.0) * col("w") / col("denom")).cast("long"))
          .otherwise(lit(0L)))
      .select("stratum", "n_tokens", "weight_bp")
  }

  /** Apply a plan: keep each doc iff its deterministic hash bucket clears its
    * stratum's rate. Docs in unplanned strata are dropped (rate 0). */
  def apply(df: DataFrame, idCol: String, stratumCol: String,
            planDf: DataFrame, salt: String = "mix"): DataFrame =
    df.join(broadcast(planDf.select(col("stratum").as(stratumCol), col("rate_bp"))),
        Seq(stratumCol))
      .filter(TextQuality.hashBucket(col(idCol), salt) < col("rate_bp"))
      .drop("rate_bp")
}
