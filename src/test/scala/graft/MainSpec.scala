package graft

import graft.io.TableFormat
import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("loadInputTable: schema-asserted read of a TableFormat-written doc table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-input-table").toString
    val docs = spark.createDataset(fixtures.Fixtures.inputDocs(40)).toDF()
    TableFormat.save(docs, dir, "doc_id", buckets = 4, stage = "input")
    val back = Main.loadInputTable(spark, dir)
    assert(back.count() === 40)
    // passenger fidelity through the table round trip
    val m = back.collect().map(d => d.doc_id -> d.spans.sortBy(_.offset).toSeq).toMap
    val orig = fixtures.Fixtures.inputDocs(40).map(d => d.doc_id -> d.spans.sortBy(_.offset).toSeq).toMap
    assert(m === orig)
  }

  test("loadInputTable rejects a wrong-shaped table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bad-table").toString
    val bad = Seq((1L, "x")).toDF("doc_id", "spans")
    bad.write.mode("overwrite").parquet(dir)
    intercept[Exception](Main.loadInputTable(spark, dir))
  }
}
