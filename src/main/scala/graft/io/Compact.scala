package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Epoch compaction — fold the streaming sinks' per-epoch tables
  * (`<streamDir>/epoch=N`, each a complete [[TableFormat]] table) into one
  * base table, EXACTLY ONCE and crash-safe. This closes the standard
  * streaming/batch split: micro-batches append small epoch tables at ingest
  * latency; a periodic compaction folds them into the query-facing base so
  * readers never fan out over thousands of epoch directories (the
  * metadata-explosion failure mode of append-only streaming sinks at scale).
  *
  * Semantics: MULTISET-preserving — rows are never deduplicated (triple
  * streams carry meaningful duplicate `mentions` rows), so exactly-once comes
  * from bookkeeping, not idempotent rows:
  *
  *   - the base's manifest carries the cumulative list of merged epoch names
  *     (`compacted_epochs`); an epoch in that list is skipped even if its
  *     directory still exists (deletion crashed last time);
  *   - the new generation is written beside the base (`<base>.next`), then
  *     swapped in (base → `<base>.old` → delete). A crash between write and
  *     swap leaves a complete `.next` whose manifest names the epochs it
  *     contains — the next run finishes the swap instead of re-merging;
  *   - merged epoch directories are deleted only after the swap.
  *
  * Scale shape: the merge is one unionByName of already-bucketed tables and
  * one bucket repartition into the write (TableFormat.save) — no join, no
  * dedup shuffle; compaction cost is proportional to data merged, and the
  * epoch tables are micro-batch-sized.
  */
object Compact {

  private def rmrf(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally walk.close()
    }

  private def listField(path: String, field: String): Seq[String] = {
    val mf = Paths.get(path, "_manifest.json")
    if (!Files.exists(mf)) Seq.empty
    else s""""$field": "([^"]*)"""".r.findFirstMatchIn(Files.readString(mf))
      .map(_.group(1)).filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Seq.empty)
  }

  /** Identity of an epoch table = name @ its manifest's wall_ms stamp. Epoch
    * NAMES alone are not stable identities: a stream whose checkpoint is
    * cleared restarts epoch numbering at 0, so a re-used name with new data
    * must read as a FRESH epoch, never as "already merged" (which would
    * delete unmerged data). */
  private def epochIdentity(streamDir: String, name: String): String = {
    val stamp = listField(s"$streamDir/$name", "wall_ms").headOption.getOrElse("?")
    s"$name@$stamp"
  }

  /** Complete epoch tables under streamDir, oldest first. */
  def completeEpochs(streamDir: String): Seq[String] = {
    val d = Paths.get(streamDir)
    if (!Files.exists(d)) Seq.empty
    else {
      val ls = Files.list(d)
      try ls.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("epoch="))
        .filter(p => TableFormat.isComplete(p.toString))
        .map(_.getFileName.toString).toSeq
        .sortBy(n => n.stripPrefix("epoch=").toLong)
      finally ls.close()
    }
  }

  /** Swap a complete `.next` generation into place and drop the epochs its
    * manifest says it absorbed. Safe to call when no `.next` exists. */
  private def finishSwap(streamDir: String, baseDir: String): Unit = {
    val next = s"$baseDir.next"
    val old = Paths.get(s"$baseDir.old")
    if (!TableFormat.isComplete(next)) {
      // half-written generation → discard; stranded old generation (crash
      // after swap, before cleanup) → base already supersedes it, drop it
      rmrf(Paths.get(next)); rmrf(old); return
    }
    rmrf(old)
    if (Files.exists(Paths.get(baseDir))) {
      Files.move(Paths.get(baseDir), old)
    }
    Files.move(Paths.get(next), Paths.get(baseDir))
    rmrf(old)
    dropAbsorbed(streamDir, listField(baseDir, "compacted_epochs").toSet)
  }

  /** Delete on-disk epochs whose CURRENT identity is in the absorbed set —
    * a same-named epoch with a different stamp is new data and survives. */
  private def dropAbsorbed(streamDir: String, absorbed: Set[String]): Unit =
    completeEpochs(streamDir)
      .filter(e => absorbed.contains(epochIdentity(streamDir, e)))
      .foreach(e => rmrf(Paths.get(streamDir, e)))

  /** Merge all complete, not-yet-merged epochs into baseDir. Returns the
    * number of epochs folded in (0 = nothing to do). */
  def mergeEpochs(spark: SparkSession, streamDir: String, baseDir: String,
                  keyCol: String, buckets: Int = 32): Int = {
    finishSwap(streamDir, baseDir) // recover a crashed previous run first
    val already = listField(baseDir, "compacted_epochs").toSet
    // an epoch whose identity is listed but still on disk: deletion crashed —
    // finish it; a SAME-NAMED epoch with a new stamp stays and merges fresh
    dropAbsorbed(streamDir, already)
    val fresh = completeEpochs(streamDir)
      .filterNot(e => already.contains(epochIdentity(streamDir, e)))
    if (fresh.isEmpty) return 0
    val freshIds = fresh.map(e => epochIdentity(streamDir, e))

    val parts: Seq[DataFrame] =
      (if (TableFormat.isComplete(baseDir)) Seq(TableFormat.load(spark, baseDir)) else Seq.empty) ++
        fresh.map(e => TableFormat.load(spark, s"$streamDir/$e"))
    val merged = parts.reduce(_.unionByName(_))
    TableFormat.save(merged, s"$baseDir.next", keyCol, buckets,
      stage = "compacted",
      extra = Map("compacted_epochs" -> (already.toSeq ++ freshIds).sorted.mkString(",")))
    finishSwap(streamDir, baseDir)
    fresh.size
  }
}
