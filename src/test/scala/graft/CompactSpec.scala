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

  test("a crashed run with a complete .next generation is finished, not re-merged") {
    val stream = tmp(); val base = s"${tmp()}/base"
    writeEpoch(stream, 0, Seq((1L, "a")))
    // simulate: previous run wrote the merged generation and died pre-swap
    TableFormat.save(Seq((1L, "a")).toDF("id", "v"), s"$base.next", "id", 4,
      stage = "compacted", extra = Map("compacted_epochs" -> "epoch=0"))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 0)
    assert(baseRows(base) === Seq((1L, "a")))
    assert(Compact.completeEpochs(stream).isEmpty, "absorbed epoch must be dropped on recovery")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base.next")))
  }

  test("an epoch listed as merged but still on disk is deleted, never double-counted") {
    val stream = tmp(); val base = s"${tmp()}/base"
    writeEpoch(stream, 0, Seq((1L, "a")))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 1)
    // simulate: deletion crashed — the merged epoch reappears on disk
    writeEpoch(stream, 0, Seq((1L, "a")))
    assert(Compact.mergeEpochs(spark, stream, base, "id", 4) === 0)
    assert(baseRows(base) === Seq((1L, "a")))
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
