package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query steady-state timing probe: runs named registered queries for
  * REPS consecutive reps in one session and prints every rep's wall — the
  * tool for telling a transient bench window from a real regression (the
  * bench's min-of-2 can be contaminated when BOTH passes land in the same
  * noisy minute; consecutive reps here show the steady state directly).
  *
  * Usage: `sbt "runMain graft.tools.QueryTime <sfDir> <query...>"`
  * (QUERYTIME_REPS to change the rep count, default 4). First reps include
  * session-artifact builds (IVF/PQ indexes, the annotate cache) exactly as
  * the bench's first pass does — read the tail reps for steady state. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTime <sfDir> <query...>")
    val dir = args(0)
    val names = args.drop(1)
    val reps = sys.env.getOrElse("QUERYTIME_REPS", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).collect().length
      println(f"[querytime] $name rep $rep: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    spark.stop()
  }
}
