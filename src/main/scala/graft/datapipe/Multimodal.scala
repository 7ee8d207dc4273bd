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
  * batches): schema, batching shape, and partitioning are real and tested; the
  * actual codec call is STUBBED (no image/audio libs in this container) behind
  * `decodeStub`, a deterministic fake keyed on the payload bytes, clearly
  * marked for swap-in.
  */
object Multimodal {

  /** Typed media row: payload + metadata. */
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
      modality: String,
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

  /** STUB decode: a real implementation would call an image/audio codec here
    * (not present in this container). The stub derives a deterministic
    * 16-bucket byte histogram "feature" so the full Spark-side plumbing —
    * batching, schema, partition parallelism — is exercised and testable. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    if (content != null) {
      var i = 0
      while (i < content.length) { hist((content(i) & 0xFF) >> 4) += 1f; i += 1 }
      val n = math.max(content.length, 1).toFloat
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
    * iterator, constant memory, one batch of rows at a time. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a vectorized codec would process N payloads at once
        batch.iterator.map { m =>
          MediaFeatures(m.doc_id, m.media_ref, m.modality,
            decodeStub(m.content), framePlan(m.durationMs))
        }
      }
    }
  }

  /** Deterministic synthetic media table derived from the fixture docs' media
    * spans (payload bytes are a seeded function of the media_ref). */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      .as[(String, String)]
      .map { case (docId, ref) =>
        val seed = ref.hashCode.toLong
        val r = new scala.util.Random(seed)
        val bytes = new Array[Byte](256 + r.nextInt(256))
        r.nextBytes(bytes)
        MediaRow(docId, ref, "image", 64 + r.nextInt(192), 64 + r.nextInt(192), 0, bytes)
      }
  }
}
