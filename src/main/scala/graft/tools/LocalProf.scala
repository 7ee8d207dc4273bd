package graft.tools

/** JFR target: runs the pure annotate loop only (no Spark). */
object LocalProf {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 30000
    Profile.localLoop(2000) // warm
    val (sec, acc) = Profile.localLoop(n)
    println(f"[localprof] $n docs in $sec%.2f s = ${n / sec}%.0f docs/s (sents=$acc)")
  }
}
