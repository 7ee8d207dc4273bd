package graft.datapipe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * they are never exploded into RDDs and never pass through a string codec.
  * The decode / feature-extract kernels run as partition-batched functions
  * (`mapPartitions` over a typed Dataset — the Scala analog of `mapInPandas`
  * batches): schema, batching shape, and partitioning are real and tested.
  *
  * Payloads carry a REAL binary container header (GRFT magic, version,
  * modality, dims, duration — see [[parseHeader]]) that the extractor parses
  * byte-for-byte, so modality / frames / width / height are derived from
  * CONTENT, not from catalog columns; only the pixel/sample decode behind the
  * header is stubbed (`decodeStub`, a deterministic byte histogram — no codec
  * libs in this container), clearly marked for swap-in.
  */
object Multimodal {

  /** Typed media row: payload + catalog metadata (what an ingest manifest
    * would carry; the extractor trusts the PAYLOAD header, not these). */
  final case class MediaRow(
      doc_id: String,
      media_ref: String,
      modality: String,          // image | audio | video
      width: Int, height: Int,   // 0 when unknown / not applicable
      durationMs: Int,
      content: Array[Byte])

  final case class MediaFeatures(
      doc_id: String,
      media_ref: String,
      modality: String,          // parsed from the payload header
      width: Int, height: Int,   // parsed from the payload header
      feature: Array[Float],     // extracted feature vector (stub: byte histogram)
      frames: Int)               // sampled frame count (video) / 1 otherwise

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("durationMs", IntegerType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  // ---------- binary container format ----------

  /** GRFT container header, 16 bytes big-endian:
    * [0..3] magic "GRFT" · [4] version (1) · [5] modality code
    * (0=image 1=audio 2=video) · [6..7] width · [8..9] height ·
    * [10..13] durationMs · [14..15] reserved. Body = encoded payload. */
  val HeaderLen = 16
  private val Magic = Array[Byte]('G', 'R', 'F', 'T')
  private val ModalityNames = Array("image", "audio", "video")

  final case class MediaHeader(modality: String, width: Int, height: Int, durationMs: Int)

  def writeHeader(modality: String, width: Int, height: Int, durationMs: Int): Array[Byte] = {
    val h = new Array[Byte](HeaderLen)
    System.arraycopy(Magic, 0, h, 0, 4)
    h(4) = 1
    h(5) = ModalityNames.indexOf(modality).toByte
    h(6) = (width >> 8).toByte; h(7) = width.toByte
    h(8) = (height >> 8).toByte; h(9) = height.toByte
    h(10) = (durationMs >> 24).toByte; h(11) = (durationMs >> 16).toByte
    h(12) = (durationMs >> 8).toByte; h(13) = durationMs.toByte
    h
  }

  /** Parse the container header from payload bytes. None on anything
    * malformed (null / short / bad magic / unknown version or modality) —
    * a corrupted payload must degrade, never crash the partition. */
  def parseHeader(content: Array[Byte]): Option[MediaHeader] = {
    if (content == null || content.length < HeaderLen) return None
    var i = 0
    while (i < 4) { if (content(i) != Magic(i)) return None; i += 1 }
    if (content(4) != 1) return None
    val code = content(5).toInt
    if (code < 0 || code >= ModalityNames.length) return None
    def u8(k: Int) = content(k) & 0xFF
    val width = (u8(6) << 8) | u8(7)
    val height = (u8(8) << 8) | u8(9)
    val durationMs = (u8(10) << 24) | (u8(11) << 16) | (u8(12) << 8) | u8(13)
    Some(MediaHeader(ModalityNames(code), width, height, durationMs))
  }

  /** STUB decode: a real implementation would hand the body bytes to an
    * image/audio codec here (not present in this container). The stub derives
    * a deterministic 16-bucket byte histogram "feature" over the BODY (header
    * excluded) so the full Spark-side plumbing — header parse, batching,
    * schema, partition parallelism — is exercised and testable. */
  def decodeStub(content: Array[Byte], offset: Int): Array[Float] = {
    val hist = new Array[Float](16)
    if (content != null && content.length > offset) {
      var i = offset
      while (i < content.length) { hist((content(i) & 0xFF) >> 4) += 1f; i += 1 }
      val n = (content.length - offset).toFloat
      var j = 0
      while (j < 16) { hist(j) /= n; j += 1 }
    }
    hist
  }

  /** Frame sampling plan for video: every `everyMs` ms, capped at `maxFrames`.
    * Pure metadata math — the real decoder would seek to these timestamps. */
  def framePlan(durationMs: Int, everyMs: Int = 1000, maxFrames: Int = 32): Int =
    if (durationMs <= 0) 1 else math.min(maxFrames, math.max(1, durationMs / everyMs))

  /** Partition-batched feature extraction (the mapInPandas analog): iterator →
    * iterator, constant memory, one batch of rows at a time. All output
    * metadata comes from the PARSED HEADER; a row whose payload fails to parse
    * degrades to modality "unknown" (dims 0, frames 0) with the raw-byte
    * histogram still computed. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a vectorized codec would process N payloads at once
        batch.iterator.map { m =>
          parseHeader(m.content) match {
            case Some(h) =>
              val frames = if (h.modality == "video") framePlan(h.durationMs) else 1
              MediaFeatures(m.doc_id, m.media_ref, h.modality, h.width, h.height,
                decodeStub(m.content, HeaderLen), frames)
            case None =>
              MediaFeatures(m.doc_id, m.media_ref, "unknown", 0, 0,
                decodeStub(m.content, 0), 0)
          }
        }
      }
    }
  }

  /** Hex value of the k-th character from the END of a ref string, clamped to
    * ≥ 0 — the deterministic, SQL-replayable source of the synthetic
    * catalog/header fields (the oracle recomputes the same values from
    * gold_media refs with strpos over a hex alphabet). */
  private def refHex(ref: String, k: Int): Int = {
    if (ref.length < k) 0
    else math.max("0123456789abcdef".indexOf(ref.charAt(ref.length - k)), 0)
  }

  /** Deterministic synthetic media table derived from the fixture docs' media
    * spans. Catalog fields are pure functions of the media_ref's tail hex
    * chars (modality = hv1 mod 3; duration = (1+hv2)s for audio/video; dims =
    * 64+4·hv3 × 64+4·hv4 for image/video), the payload is a real GRFT
    * container: header encoding those fields + seeded body bytes. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      .as[(String, String)]
      .map { case (docId, ref) =>
        val code = refHex(ref, 1) % 3
        val modality = ModalityNames(code)
        val durationMs = if (code == 0) 0 else 1000 * (1 + refHex(ref, 2))
        val width = if (code == 1) 0 else 64 + 4 * refHex(ref, 3)
        val height = if (code == 1) 0 else 64 + 4 * refHex(ref, 4)
        val r = new scala.util.Random(ref.hashCode.toLong)
        val body = new Array[Byte](256 + r.nextInt(256))
        r.nextBytes(body)
        MediaRow(docId, ref, modality, width, height, durationMs,
          writeHeader(modality, width, height, durationMs) ++ body)
      }
  }
}
