package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the AQE skew-join anomaly (BENCH round-1: AQE skew-split
  * measured 1.8× slower than the plain unsalted join). Hypothesis: the default
  * skew thresholds (256 MB skewed-partition, 64 MB advisory) never trigger at
  * this fixture scale, so "AQE on" was paying adaptive re-planning overhead
  * without ever splitting; with thresholds scaled to the actual partition
  * sizes the split should fire and beat the unsalted join.
  *
  * Prints each variant's wall time and whether the plan shows a skew split.
  */
object SkewProbe {

  /** Zipf-hot mention set (80% of rows hit one surface) + the entity
    * dictionary — ONE source of truth shared with Bench.skewBench, so the
    * probe and the committed bench measure the identical workload. */
  def zipfMentions(spark: SparkSession, nMentions: Long, parts: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val dictRows = graft.fixtures.Fixtures.entityDictionary()
    val dict = spark.createDataset(dictRows).toDF()
    val hotSurface = dictRows.head.canonical
    val surfaces = dictRows.map(_.canonical)
    val bcSurf = spark.sparkContext.broadcast(surfaces)
    val mentions = spark.range(0, nMentions, 1, parts)
      .mapPartitions { it =>
        val surf = bcSurf.value
        it.map { i =>
          val s = if (i % 10 < 8) hotSurface else surf((i % surf.length).toInt)
          (s"doc-${i % 100000}", (i % 7).toLong, s, "PER", 1, 0, "token", "skew")
        }
      }
      .toDF("doc_id", "sent_id", "surface", "category", "occ", "start", "level", "scenario")
    (mentions, dict)
  }

  /** AQE skew-join configuration, shared with Bench.skewBench. `tuned` sizes
    * the thresholds to the fixture's COMPRESSED partition bytes (an
    * 80%-one-key partition compresses ~50×, so the 256 MB defaults never
    * fire at this scale — the round-1 "AQE slower" anomaly). */
  def applySkewConf(spark: SparkSession, aqeSkew: Boolean, tuned: Boolean): Unit = {
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
    if (tuned) {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    } else {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nMentions = if (args.nonEmpty) args(0).toInt else 3000000
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (mentions, dict) = zipfMentions(spark, nMentions.toLong, 8 * cpus)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def run(label: String, salt: Int, aqeSkew: Boolean, tuned: Boolean): Unit = {
      applySkewConf(spark, aqeSkew, tuned)
      val df = graft.kg.Linker.link(mentions, dict, broadcastDict = false, saltBuckets = salt)
      val t0 = System.nanoTime()
      // drive df's OWN QueryExecution (count() would build a separate one and
      // the adaptive final plan would never be observable on df)
      df.queryExecution.executedPlan.execute().count()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString
      val reads = plan.linesIterator.filter(_.contains("AQEShuffleRead")).map(_.trim).toSeq
      val skewed = reads.exists(_.contains("skewed"))
      if (sys.env.contains("SKEW_DUMP_PLAN") && aqeSkew)
        plan.linesIterator.filter(l => l.contains("AQEShuffleRead") || l.contains("Join") || l.contains("Exchange") || l.contains("Window"))
          .foreach(r => println(s"[skewprobe-plan] ${r.trim.take(150)}"))
      println(f"[skewprobe] $label%-28s $sec%8.2f s  skewSplitVisible=$skewed")
    }

    run("warmup", 1, aqeSkew = false, tuned = false)
    run("unsalted", 1, aqeSkew = false, tuned = false)
    run("unsalted(2)", 1, aqeSkew = false, tuned = false)
    run("salted", cpus, aqeSkew = false, tuned = false)
    run("aqe-default-thresholds", 1, aqeSkew = true, tuned = false)
    run("aqe-tuned-thresholds", 1, aqeSkew = true, tuned = true)
    run("aqe-tuned-thresholds(2)", 1, aqeSkew = true, tuned = true)
    spark.stop()
  }
}
