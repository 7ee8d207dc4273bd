package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.functions.BloomMightContain

/** Bloom-filter join pruning — the scale answer for a join whose build side
  * is too big to broadcast as DATA but whose KEY SET fits a few hundred MB as
  * a bit array. The fact side is pre-filtered by `might_contain(key)` BEFORE
  * its shuffle, so shuffle volume drops by the join selectivity; the exact
  * join afterwards removes the bloom's false positives, so results are exact.
  *
  * This is Spark's own runtime-filter strategy
  * (spark.sql.optimizer.runtime.bloomFilter.*, InjectRuntimeFilter) made
  * explicit and reusable ACROSS stages: a pipeline that joins the same
  * filtered dimension into several facts builds the bloom once and applies it
  * to each scan, where the optimizer's injected filter is per-query and
  * re-built. At 10^12 rows the decision rule is: broadcast the dim if its
  * ROWS fit (~10 MB), bloom-prune if only its KEYS fit (~2 GB of bits covers
  * 10^9 keys at 1% fpp), otherwise fall back to AQE-skew-handled SMJ. */
object BloomJoin {

  /** Build a bloom over `keyCol` of `dim` (distributed: per-partition blooms
    * merged — DataFrameStatFunctions.bloomFilter). `expectedItems` sizes the
    * bit array; overshooting wastes memory, undershooting inflates fpp. */
  def keyBloom(dim: DataFrame, keyCol: String, expectedItems: Long,
               fpp: Double = 0.01): BloomFilter =
    dim.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** `might_contain` pre-filter as a codegen'd Column — pushes to the fact
    * scan (a Filter directly over the file source, before any Exchange). */
  def mightContain(keyCol: Column, bloom: BloomFilter): Column =
    BloomMightContain(keyCol, bloom)

  /** Exact inner join with bloom pre-pruning of the probe (big) side. The
    * bloom admits ~fpp false positives; the join removes them — output is
    * bit-identical to `big.join(dim, cond)` with strictly less shuffle. */
  def prunedJoin(big: DataFrame, bigKey: String, dim: DataFrame,
                 dimKey: String, expectedItems: Long,
                 fpp: Double = 0.01): DataFrame = {
    val bloom = keyBloom(dim, dimKey, expectedItems, fpp)
    big.filter(mightContain(col(bigKey), bloom))
      .join(dim, col(bigKey) === col(dimKey))
  }
}
