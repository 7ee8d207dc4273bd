package graft

import graft.fixtures.Fixtures
import graft.schema.InputDoc
import graft.streaming.StreamPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streaming pipeline: docs stream → annotate → triples per epoch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[InputDoc]
    val dict = spark.createDataset(Fixtures.entityDictionary()).toDF()
    val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString

    stream.addData(Fixtures.inputDocs(30): _*)
    // continuous micro-batch trigger: AvailableNow would stop before batch 2
    val q = StreamPipeline.run(spark, stream.toDS(), dict, out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    q.processAllAvailable()

    stream.addData(Fixtures.inputDocs(60).drop(30): _*)
    q.processAllAvailable()
    q.stop()

    val triples = spark.read.option("basePath", out).parquet(s"$out/epoch=*")
    assert(triples.count() > 0)
    // both micro-batches landed, all five predicate families present somewhere
    val preds = triples.select("pred").distinct().as[String].collect().toSet
    assert(Set("mentions", "inDoc", "label", "category").subsetOf(preds))
    // doc coverage spans both epochs
    val docIds = triples.select("doc_id").distinct().count()
    assert(docIds >= 50, s"only $docIds docs covered")
  }
}
