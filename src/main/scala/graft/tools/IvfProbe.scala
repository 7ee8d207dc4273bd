package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.datapipe.Similarity

object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfprobe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val corpus = s.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") >= 5)
    time("count")(corpus.count())
    val seed = time("seed-collect")(corpus.orderBy(col("vec_id")).limit(16).select(col("embedding")).collect())
    val cents = time("centroids-2-iters")(Similarity.centroids(corpus, "vec_id", "embedding", 16))
    val assigned = time("assign+persist")({
      val a = Similarity.assignCells(corpus.select(col("vec_id").as("id"), col("embedding").as("vec")), "vec", cents).persist()
      a.count(); a
    })
    val q = s.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    time("probe-query")(Similarity.ivfTopKAssigned(assigned, "id", "vec", q, "qid", "qvec", 3, cents, 4).count())
    time("probe-query-2")(Similarity.ivfTopKAssigned(assigned, "id", "vec", q, "qid", "qvec", 3, cents, 4).count())
    s.stop()
  }
}
