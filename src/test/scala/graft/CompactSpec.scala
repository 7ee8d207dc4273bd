package graft

import graft.io.{Compact, TableFormat}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-epoch compaction: exactly-once multiset merge into the base
  * table, crash recovery via the `.next` generation, epoch cleanup. */
class CompactSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp() = java.nio.file.Files.createTempDirectory("compact").toString

  private def writeEpoch(dir: String, n: Long, rows: Seq[(Long, String)]): Unit =
    TableFormat.save(rows.toDF("id", "v"), s"$dir/epoch=$n", "id", buckets = 4,
      stage = s"epoch-$n")

  private def baseRows(base: String): Seq[(Long, String)] =
    TableFormat.load(spark, base).as[(Long, String)].collect().toSeq.sorted

  test("merge folds all complete epochs once, preserves multisets, deletes epoch dirs") {
    val stream = tmp(); val base = s"${tmp()}/base"
    // duplicate rows WITHIN and ACROSS epochs are meaningful (triple multiset)
    writeEpoch(stream, 0, Seq((1L, "a"), (1L, "a"), (2L, "b")))
    writeEpoch(stream, 1, Seq((1L, "a"), (3L, "c")))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 2)
    assert(baseRows(base) === Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"), (3L, "c")))
    assert(Compact.completeEpochs(stream).isEmpty, "merged epochs must be deleted")
    // idempotent: nothing new → no-op, base unchanged
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 0)
    assert(baseRows(base).size === 5)
  }

  test("incremental merge appends only fresh epochs") {
    val stream = tmp(); val base = s"${tmp()}/base"
    writeEpoch(stream, 0, Seq((1L, "a")))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 1)
    writeEpoch(stream, 1, Seq((2L, "b")))
    writeEpoch(stream, 2, Seq((3L, "c")))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 2)
    assert(baseRows(base) === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  private def epochStamp(stream: String, n: Long): String = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$stream/epoch=$n", "_manifest.json"))
    """"wall_ms": "(\d+)"""".r.findFirstMatchIn(txt).get.group(1)
  }

  private def copyDir(from: String, to: String): Unit = {
    import scala.jdk.CollectionConverters._
    val src = java.nio.file.Paths.get(from)
    val walk = java.nio.file.Files.walk(src)
    try walk.iterator().asScala.foreach { p =>
      val dst = java.nio.file.Paths.get(to).resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst)
    } finally walk.close()
  }

  test("a crashed run with a complete .next generation is finished, not re-merged") {
    val stream = tmp(); val base = s"${tmp()}/base"
    writeEpoch(stream, 0, Seq((1L, "a")))
    // simulate: previous run wrote the merged generation and died pre-swap
    // (bookkeeping carries epoch IDENTITIES = name@wall_ms)
    TableFormat.save(Seq((1L, "a")).toDF("id", "v"), s"$base.next", "id", 4,
      stage = "compacted",
      extra = Map("compacted_epochs" -> s"epoch=0@${epochStamp(stream, 0)}"))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 0)
    assert(baseRows(base) === Seq((1L, "a")))
    assert(Compact.completeEpochs(stream).isEmpty, "absorbed epoch must be dropped on recovery")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base.next")))
  }

  test("an epoch whose deletion crashed (same identity back on disk) is dropped, never double-counted") {
    val stream = tmp(); val base = s"${tmp()}/base"
    writeEpoch(stream, 0, Seq((1L, "a")))
    val saved = s"${tmp()}/saved-epoch"
    copyDir(s"$stream/epoch=0", saved)
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 1)
    // simulate: deletion crashed — the IDENTICAL merged epoch dir reappears
    copyDir(saved, s"$stream/epoch=0")
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 0)
    assert(baseRows(base) === Seq((1L, "a")))
    assert(Compact.completeEpochs(stream).isEmpty)
  }

  test("a stream restart that reuses epoch numbers merges the new data instead of deleting it") {
    val stream = tmp(); val base = s"${tmp()}/base"
    writeEpoch(stream, 0, Seq((1L, "a")))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 1)
    Thread.sleep(2) // distinct wall_ms stamp for the reused epoch number
    // checkpoint cleared → Spark restarts batch ids at 0 with FRESH docs
    writeEpoch(stream, 0, Seq((9L, "z")))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 1,
      "same-named epoch with new identity must merge as fresh data")
    assert(baseRows(base) === Seq((1L, "a"), (9L, "z")))
    assert(Compact.completeEpochs(stream).isEmpty)
  }

  test("incomplete epochs (in-flight micro-batch) are left alone") {
    val stream = tmp(); val base = s"${tmp()}/base"
    writeEpoch(stream, 0, Seq((1L, "a")))
    // epoch=1 exists but has no manifest → in flight
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$stream/epoch=1"))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 1)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$stream/epoch=1")))
    assert(baseRows(base) === Seq((1L, "a")))
  }
}
