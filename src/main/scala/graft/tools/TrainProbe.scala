package graft.tools
import graft.ner.{NerModel, Scorer, Trainer}
import graft.ner.Trainer.TrainExample
import graft.fixtures.Fixtures
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (s, _, _) = Fixtures.oracleVocab(0)
    val oracle = NerModel.synthesizeOracle("token-single", s, s.values.toSeq.distinct)
    def ex(from: Int, until: Int) = (from until until).flatMap(i =>
      Fixtures.doc(i).sentences.map(sn => TrainExample(sn.tokens, sn.goldSingle)))
    val dev = ex(60, 80)
    println("oracle dev acc = " + Trainer.devTokenAccuracy(oracle, dev))
    val r = new scala.util.Random(7)
    val w = oracle.hidden2tag.map(_.map(v => v + (r.nextFloat() * 8f - 4f)))
    val tr = oracle.transitions.map(_.map(v => if (v <= -5000f) v else v + (r.nextFloat() * 2f - 1f)))
    val init = oracle.copy(hidden2tag = w, transitions = tr)
    val train = spark.createDataset(ex(0, 60)).repartition(4)
    val (best, hist) = Trainer.train(spark, train, dev, init, epochs = 25, lr0 = 0.3, lrDecay = 0.05, nBatches = 3)
    hist.foreach(h => println(f"epoch ${h.epoch}%2d lr=${h.lr}%.3f nll=${h.trainNll}%8.4f dev=${h.devTokenAcc}%.4f"))
    // dump residual errors of best
    var shown = 0
    for (e <- dev if shown < 10) {
      val pred = Scorer.decodeBatch(best, IndexedSeq(e.tokens.toIndexedSeq)).head
      for (i <- pred.indices if pred(i) != e.labels(i) && shown < 10) {
        println(s"ERR tok=${e.tokens(i)} gold=${e.labels(i)} pred=${pred(i)} ctx=${e.tokens.mkString(" ")}")
        shown += 1
      }
    }
    spark.stop()
  }
}
