package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot log over [[TableFormat]] data directories:
  * time-travel reads, incremental (changes-between-snapshots) scans, and
  * snapshot expiry — the table-format half of the north rule's
  * "checkpoint-resumable with per-partition lineage" contract that plain
  * directory-per-stage parquet cannot express.
  *
  * Model (the same three layers Iceberg uses, scaled to the sandbox):
  *  - data layer: each commit writes ONE new bucketed data directory
  *    (`snap-NNNNNN/`, a full [[TableFormat]] dir with its own per-partition
  *    lineage manifest);
  *  - snapshot: an immutable LIST of data directories. `append` = parent's
  *    list + the new dir; `overwrite` = just the new dir. Old snapshots keep
  *    resolving as long as their dirs live — that is what makes time travel
  *    and incremental scans O(1) metadata operations, not data copies;
  *  - log: `_snapshots.jsonl`, one JSON object per line, rewritten atomically
  *    (temp file + rename) on every commit. Single-writer by design — real
  *    Iceberg arbitrates concurrent committers with optimistic locking on the
  *    catalog pointer; the pipeline's stage writers are single-owner per
  *    table, so a compare-and-swap on the rename is the swap-in point.
  *
  * At 10^12-doc scale the snapshot log stays tiny (one line per ingest
  * batch); readers never list the table root — they read the log and go
  * straight to the named directories, exactly like Iceberg's manifest list
  * avoiding S3 LIST storms. */
object Snapshots {

  final case class Snapshot(id: Long, parentId: Long, op: String,
                            dirs: Vector[String], stage: String,
                            rows: Long, tsMs: Long)

  private val Log = "_snapshots.jsonl"

  /** Append-only ingest commit: the new rows land in their own data dir; the
    * new snapshot references parent dirs + the new one. Returns the snapshot.
    * `op = "overwrite"` starts a fresh dir list (full rewrite semantics). */
  def commit(df: DataFrame, tableDir: String, keyCol: String,
             buckets: Int = 32, stage: String = "",
             op: String = "append"): Snapshot = {
    require(op == "append" || op == "overwrite", s"unknown snapshot op: $op")
    val prior = snapshots(tableDir)
    val id = prior.lastOption.map(_.id + 1).getOrElse(1L)
    val dirName = f"snap-$id%06d"
    TableFormat.save(df, s"$tableDir/$dirName", keyCol, buckets,
      stage = if (stage.isEmpty) s"snapshot-$id" else stage)
    val rows = dirRows(s"$tableDir/$dirName")
    val parentDirs =
      if (op == "overwrite") Vector.empty
      else prior.lastOption.map(_.dirs).getOrElse(Vector.empty)
    val snap = Snapshot(id, prior.lastOption.map(_.id).getOrElse(0L), op,
      parentDirs :+ dirName, stage, rows, System.currentTimeMillis())
    writeLog(tableDir, prior :+ snap)
    snap
  }

  /** Row count of one data dir, from its TableFormat manifest (footer-priced
    * at write time — never a data re-read). */
  private def dirRows(dataDir: String): Long =
    "\"rows\": (\\d+)".r
      .findFirstMatchIn(Files.readString(Paths.get(dataDir, "_manifest.json")))
      .map(_.group(1).toLong).getOrElse(0L)

  /** All snapshots, oldest first. Empty for a table that has never committed. */
  def snapshots(tableDir: String): Vector[Snapshot] = {
    val p = Paths.get(tableDir, Log)
    if (!Files.exists(p)) Vector.empty
    else Files.readAllLines(p).asScala.iterator.filter(_.nonEmpty).map(parseLine).toVector
  }

  def current(tableDir: String): Option[Snapshot] = snapshots(tableDir).lastOption

  /** Read the table at a snapshot (`asOf = None` → current). The scan unions
    * exactly the snapshot's data dirs — partition pruning and the bucket
    * layout of each dir are preserved (the dirs are ordinary TableFormat
    * dirs). Time travel is a metadata resolution, not a data operation. */
  def load(spark: SparkSession, tableDir: String,
           asOf: Option[Long] = None): DataFrame = {
    val snap = resolve(tableDir, asOf)
    readDirs(spark, tableDir, snap.dirs)
  }

  /** Incremental scan: rows ADDED after `fromId` up to and including `toId`
    * (`toId = None` → current) — the CDC feed an incremental pipeline run
    * consumes. Fails loudly if an `overwrite` snapshot intervenes: its delta
    * is not expressible as "new dirs only" and the caller must fall back to a
    * full diff (same contract as Iceberg's incremental append scan). */
  def changes(spark: SparkSession, tableDir: String, fromId: Long,
              toId: Option[Long] = None): DataFrame = {
    val all = snapshots(tableDir)
    val from = all.find(_.id == fromId)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $fromId in $tableDir"))
    val to = resolve(tableDir, toId)
    require(to.id >= from.id, s"changes($fromId -> ${to.id}) runs backwards")
    val between = all.filter(s => s.id > from.id && s.id <= to.id)
    between.find(_.op != "append").foreach { s =>
      throw new IllegalStateException(
        s"snapshot ${s.id} is '${s.op}' — incremental scan only spans appends")
    }
    val newDirs = to.dirs.filterNot(from.dirs.toSet)
    readDirs(spark, tableDir, newDirs)
  }

  /** Compaction (Iceberg's rewrite_data_files): merge the current snapshot's
    * data dirs into ONE fresh dir, committed as an `overwrite` snapshot with
    * identical rows. Bounds the per-read dir count an append-only ingest
    * grows without losing history: older snapshots stay time-travelable
    * until [[expire]] reclaims their dirs. Readers of the pre-rewrite
    * snapshots are unaffected (their dirs are immutable); incremental scans
    * cannot span the rewrite (op=overwrite — callers checkpoint their last
    * consumed snapshot BEFORE compaction windows, the same contract as
    * Iceberg's incremental append scan). */
  def rewrite(spark: SparkSession, tableDir: String, keyCol: String,
              buckets: Int = 32, stage: String = "rewrite"): Snapshot = {
    val cur = current(tableDir)
      .getOrElse(throw new IllegalStateException(s"$tableDir has no snapshots to rewrite"))
    if (cur.dirs.size == 1) cur // already compact — no-op, no empty commit
    else commit(load(spark, tableDir), tableDir, keyCol, buckets, stage, op = "overwrite")
  }

  /** Expire snapshots older than the last `keepLast`, deleting data dirs no
    * surviving snapshot references (Iceberg's expire_snapshots + orphan file
    * cleanup collapsed into one step — safe here because the log atomically
    * names every live dir). Returns the deleted dir names. */
  def expire(tableDir: String, keepLast: Int): Vector[String] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val all = snapshots(tableDir)
    if (all.size <= keepLast) return Vector.empty
    val (dead, live) = all.splitAt(all.size - keepLast)
    val liveDirs = live.flatMap(_.dirs).toSet
    val orphans = dead.flatMap(_.dirs).distinct.filterNot(liveDirs)
    writeLog(tableDir, live)
    orphans.foreach { d =>
      val root = Paths.get(tableDir, d)
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(Files.delete)
        finally walk.close()
      }
    }
    orphans.toVector
  }

  private def resolve(tableDir: String, asOf: Option[Long]): Snapshot = {
    val all = snapshots(tableDir)
    require(all.nonEmpty, s"$tableDir has no snapshots")
    asOf match {
      case None => all.last
      case Some(id) => all.find(_.id == id)
        .getOrElse(throw new IllegalArgumentException(s"no snapshot $id in $tableDir"))
    }
  }

  /** Union-read a snapshot's data dirs. An empty dir list (fresh overwrite of
    * nothing — impossible today but cheap to guard) and the empty-stage case
    * both fall back to the schema snapshot via TableFormat.load.
    * `allowMissingColumns`: schema evolution by ADDED column — an old data
    * dir written before the column existed reads as null for it (Iceberg's
    * add-column semantics); renames/drops stay breaking, as they should. */
  private def readDirs(spark: SparkSession, tableDir: String,
                       dirs: Seq[String]): DataFrame = {
    require(dirs.nonEmpty, s"snapshot of $tableDir references no data dirs")
    dirs.map(d => TableFormat.load(spark, s"$tableDir/$d"))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  // ---- log serialization (writer-controlled: stage is the only free-text
  // field and it is escaped; everything else is numeric or enum) ----

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  private def writeLog(tableDir: String, snaps: Seq[Snapshot]): Unit = {
    val body = snaps.map { s =>
      s"""{"id": ${s.id}, "parent": ${s.parentId}, "op": "${s.op}", """ +
        s""""dirs": [${s.dirs.map(d => "\"" + d + "\"").mkString(", ")}], """ +
        s""""stage": "${esc(s.stage)}", "rows": ${s.rows}, "ts_ms": ${s.tsMs}}"""
    }.mkString("", "\n", "\n")
    Files.createDirectories(Paths.get(tableDir))
    val tmp = Paths.get(tableDir, s".$Log.tmp")
    Files.writeString(tmp, body)
    try Files.move(tmp, Paths.get(tableDir, Log),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, Paths.get(tableDir, Log), StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private val LineRe =
    ("""\{"id": (\d+), "parent": (\d+), "op": "(\w+)", "dirs": \[([^\]]*)\], """ +
     """"stage": "((?:[^"\\]|\\.)*)", "rows": (\d+), "ts_ms": (\d+)\}""").r

  private def parseLine(line: String): Snapshot = line match {
    case LineRe(id, parent, op, dirs, stage, rows, ts) =>
      val dirList = "\"([^\"]+)\"".r.findAllMatchIn(dirs).map(_.group(1)).toVector
      Snapshot(id.toLong, parent.toLong, op, dirList,
        stage.replace("\\\"", "\"").replace("\\\\", "\\"), rows.toLong, ts.toLong)
    case other =>
      throw new IllegalStateException(s"malformed snapshot log line: $other")
  }
}
