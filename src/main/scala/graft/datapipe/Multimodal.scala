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
  * modality, dims, duration — see [[parseHeader]]) AND a real encoded body the
  * extractor DECODES byte-for-byte, pure JVM, no codec libs:
  *   - image: binary PPM (P6) — the classic headerful RGB raster format;
  *   - audio: PCM WAV (RIFF/WAVE, fmt + data chunks, 16-bit mono LE);
  *   - video: a concatenation of P6 frames (an MJPEG-style frame sequence,
  *     with PPM in place of JPEG since no entropy codec ships here).
  * Features (pixel sums, sample amplitude sums, channel histograms) are
  * computed over the DECODED pixels/samples — not over raw container bytes.
  * A payload whose header parses but whose body is corrupt DEGRADES
  * (`decoded=false`, byte-histogram fallback) instead of crashing the
  * partition; an unparseable header degrades to modality "unknown".
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

  /** Decoded-content features. `decoded` is true iff the BODY parsed as its
    * modality's codec; the integer sums are exact (oracle-replayable):
    *  - image/video: px_sum = Σ decoded pixel bytes over all frames,
    *    n_px = decoded pixel-byte count (w·h·3 per frame);
    *  - audio: samp_abs_sum = Σ |16-bit samples|, n_samp = sample count.
    * `feature` is the float summary a downstream embedder would consume:
    * 16-bucket histogram over decoded pixel bytes (image/video) / sample
    * magnitudes (audio); falls back to a raw-byte histogram when
    * decoded=false. */
  final case class MediaFeatures(
      doc_id: String,
      media_ref: String,
      modality: String,          // parsed from the payload header
      width: Int, height: Int,   // parsed from the payload header
      feature: Array[Float],
      frames: Int,               // frames actually decoded (video) / 1 otherwise
      decoded: Boolean,
      px_sum: Long, n_px: Long,
      samp_abs_sum: Long, n_samp: Long)

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

  // ---------- PPM (P6) image codec ----------

  /** Encode an RGB raster as binary PPM: "P6\n{w} {h}\n255\n" + w·h·3 bytes. */
  def encodePpm(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * 3, s"PPM body needs ${w * h * 3} bytes")
    val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    hdr ++ pixels
  }

  /** One decoded PPM frame inside a byte array: pixel window + geometry +
    * where the NEXT frame starts (video bodies are frame concatenations). */
  final case class PpmFrame(w: Int, h: Int, pixelOffset: Int, nextOffset: Int)

  /** Parse one binary-PPM (P6, maxval 255) frame at `offset`. None on any
    * malformation — bad magic, absurd dims, truncated raster. */
  def parsePpm(bytes: Array[Byte], offset: Int): Option[PpmFrame] = {
    if (bytes == null || offset < 0 || bytes.length < offset + 9) return None
    if (bytes(offset) != 'P' || bytes(offset + 1) != '6') return None
    var i = offset + 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    // three whitespace-separated decimal fields: width, height, maxval
    def readInt(): Int = {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      var v = 0; var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
        if (v > (1 << 20)) return -1 // absurd dim: reject before overflow
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val mx = readInt()
    if (w <= 0 || h <= 0 || mx != 255) return None
    if (i >= bytes.length || !isWs(bytes(i))) return None
    i += 1 // exactly ONE whitespace byte separates maxval from the raster
    val n = w * h * 3
    if (bytes.length < i + n) return None
    Some(PpmFrame(w, h, i, i + n))
  }

  // ---------- PCM WAV audio codec ----------

  /** Encode 16-bit mono PCM samples as a minimal RIFF/WAVE file. */
  def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits/sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Decoded WAV: sample window inside the byte array. */
  final case class WavData(sampleRate: Int, sampleOffset: Int, nSamples: Int)

  /** Parse a RIFF/WAVE body at `offset`: fmt chunk must be PCM 16-bit mono;
    * chunks are walked by their declared sizes (a real parser, not a fixed
    * 44-byte slice). None on any malformation. */
  def parseWav(bytes: Array[Byte], offset: Int): Option[WavData] = {
    if (bytes == null || offset < 0 || bytes.length < offset + 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII") }
    if (tag() != "RIFF") return None
    bb.getInt // riff size (trusted only for well-formedness of later reads)
    if (tag() != "WAVE") return None
    var sampleRate = -1
    try {
      while (bb.remaining() >= 8) {
        val t = tag(); val sz = bb.getInt
        if (sz < 0 || sz > bb.remaining()) return None
        if (t == "fmt ") {
          if (sz < 16) return None
          val p0 = bb.position()
          val fmt = bb.getShort; val ch = bb.getShort
          sampleRate = bb.getInt; bb.getInt; bb.getShort
          val bits = bb.getShort
          if (fmt != 1 || ch != 1 || bits != 16) return None
          bb.position(p0 + sz)
        } else if (t == "data") {
          if (sampleRate <= 0) return None // fmt must precede data
          return Some(WavData(sampleRate, bb.position(), sz / 2))
        } else bb.position(bb.position() + sz)
      }
      None
    } catch { case _: Exception => None }
  }

  // ---------- feature extraction over DECODED content ----------

  /** Byte histogram over a window — the degrade-path fallback feature and the
    * building block for decoded-pixel histograms. */
  private def byteHistogram(content: Array[Byte], from: Int, until: Int): Array[Float] = {
    val hist = new Array[Float](16)
    if (content != null && until > from) {
      var i = math.max(from, 0); val end = math.min(until, content.length)
      while (i < end) { hist((content(i) & 0xFF) >> 4) += 1f; i += 1 }
      val n = (end - math.max(from, 0)).toFloat
      if (n > 0) { var j = 0; while (j < 16) { hist(j) /= n; j += 1 } }
    }
    hist
  }

  /** Frame sampling plan for video: every `everyMs` ms, capped at `maxFrames`.
    * The synthetic encoder writes exactly this many frames; the decoder
    * counts what it actually parses. */
  def framePlan(durationMs: Int, everyMs: Int = 1000, maxFrames: Int = 32): Int =
    if (durationMs <= 0) 1 else math.min(maxFrames, math.max(1, durationMs / everyMs))

  /** Decode one media payload's BODY (after the GRFT header) per the header's
    * modality and fold the decoded-content features. Returns None when the
    * body fails its codec — the caller degrades. */
  private def decodeBody(h: MediaHeader, content: Array[Byte]): Option[MediaFeatures => MediaFeatures] = {
    h.modality match {
      case "image" =>
        parsePpm(content, HeaderLen).map { f =>
          var s = 0L; var i = f.pixelOffset
          val hist = byteHistogram(content, f.pixelOffset, f.nextOffset)
          while (i < f.nextOffset) { s += (content(i) & 0xFF); i += 1 }
          base => base.copy(feature = hist, frames = 1, decoded = true,
            px_sum = s, n_px = (f.nextOffset - f.pixelOffset).toLong)
        }
      case "audio" =>
        parseWav(content, HeaderLen).map { wv =>
          val bb = java.nio.ByteBuffer.wrap(content)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var s = 0L; var i = 0
          val hist = new Array[Float](16)
          while (i < wv.nSamples) {
            val v = bb.getShort(wv.sampleOffset + 2 * i).toInt
            s += math.abs(v)
            hist(math.min(math.abs(v) >> 11, 15)) += 1f // 16 magnitude buckets
            i += 1
          }
          if (wv.nSamples > 0) { var j = 0; while (j < 16) { hist(j) /= wv.nSamples; j += 1 } }
          base => base.copy(feature = hist, frames = 1, decoded = true,
            samp_abs_sum = s, n_samp = wv.nSamples.toLong)
        }
      case "video" =>
        // frame-concatenated P6: decode frames until the body is exhausted;
        // ANY malformed frame (including trailing garbage) fails the decode
        var off = HeaderLen
        var frames = 0
        var s = 0L; var n = 0L
        val hist = new Array[Float](16)
        var ok = true
        while (ok && off < content.length) {
          parsePpm(content, off) match {
            case Some(f) =>
              var i = f.pixelOffset
              while (i < f.nextOffset) {
                val b = content(i) & 0xFF
                s += b; hist(b >> 4) += 1f; i += 1
              }
              n += (f.nextOffset - f.pixelOffset).toLong
              frames += 1; off = f.nextOffset
            case None => ok = false
          }
        }
        if (ok && frames > 0) {
          var j = 0; while (j < 16) { hist(j) /= n.toFloat; j += 1 }
          val fr = frames
          Some(base => base.copy(feature = hist, frames = fr, decoded = true,
            px_sum = s, n_px = n))
        } else None
      case _ => None
    }
  }

  /** Partition-batched feature extraction (the mapInPandas analog): iterator →
    * iterator, constant memory, one batch of rows at a time. All output
    * metadata comes from the PARSED HEADER and the DECODED BODY; degrade
    * ladder: body fails its codec → decoded=false with the raw-byte-histogram
    * fallback; header fails → modality "unknown" (dims 0, frames 0). */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a vectorized codec would process N payloads at once
        batch.iterator.map { m =>
          parseHeader(m.content) match {
            case Some(h) =>
              val plannedFrames = if (h.modality == "video") framePlan(h.durationMs) else 1
              val base = MediaFeatures(m.doc_id, m.media_ref, h.modality,
                h.width, h.height, byteHistogram(m.content, HeaderLen, Int.MaxValue),
                plannedFrames, decoded = false, 0L, 0L, 0L, 0L)
              decodeBody(h, m.content).map(_(base)).getOrElse(base)
            case None =>
              MediaFeatures(m.doc_id, m.media_ref, "unknown", 0, 0,
                byteHistogram(m.content, 0, Int.MaxValue), 0,
                decoded = false, 0L, 0L, 0L, 0L)
          }
        }
      }
    }
  }

  // ---------- perceptual hashing + near-duplicate detection ----------

  /** One perceptual hash per decoded visual payload (image, or a video's
    * leading frame — thumbnail dedup, the first thing a multimodal pipeline
    * does with decoded pixels). Audio and undecodable payloads emit no row. */
  final case class MediaHash(doc_id: String, media_ref: String,
                             modality: String, ahash: Long)

  /** 48-bit average hash (aHash) over a DECODED frame's pixels: sample a
    * 6×8 grid nearest-neighbor (y = r·h/6, x = c·w/8 — resolution-invariant,
    * so re-encodes at different thumbnail sizes still collide), gray =
    * (R+G+B)/3 integer division, bit r·8+c set iff gray·48 > Σgrays (strict
    * — a flat frame hashes to 0). 48 bits rather than the classic 64 keeps
    * the hash inside the repo's SQL-replayable convention ([[Dedup.hash48]])
    * and slots straight into the 4 × 12-bit Hamming banding machinery. */
  def aHash48(bytes: Array[Byte], f: PpmFrame): Long = {
    val grays = new Array[Int](48)
    var total = 0L
    var r = 0
    while (r < 6) {
      val y = r * f.h / 6
      var c = 0
      while (c < 8) {
        val x = c * f.w / 8
        val p = f.pixelOffset + (y * f.w + x) * 3
        val g = ((bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) + (bytes(p + 2) & 0xFF)) / 3
        grays(r * 8 + c) = g
        total += g
        c += 1
      }
      r += 1
    }
    var hsh = 0L
    var i = 0
    while (i < 48) { if (grays(i).toLong * 48 > total) hsh |= (1L << i); i += 1 }
    hsh
  }

  /** Perceptual hashes of the visual payloads: header parse → first-frame
    * PPM decode → [[aHash48]] over the decoded pixels. Partition-batched
    * like [[extractFeatures]] (binary stays binary; only (ids, long) rows
    * leave the stage). Non-visual / undecodable payloads are dropped — a
    * corrupt body cannot produce a byte-junk hash that poisons a bucket. */
  def perceptualHashes(spark: SparkSession, media: Dataset[MediaRow],
                       batchSize: Int = 64): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          parseHeader(m.content).filter(h => h.modality == "image" || h.modality == "video")
            .flatMap(h => parsePpm(m.content, HeaderLen)
              .map(f => MediaHash(m.doc_id, m.media_ref, h.modality, aHash48(m.content, f))))
        }
      }
    }
  }

  /** Multimodal near-duplicate pairs: [[perceptualHashes]] over decoded
    * pixels → the shared 48-bit Hamming banding machinery
    * ([[Dedup.hamming48Pairs]]: 4 × 12-bit bands, capped buckets, exact
    * bit_count verify) → (id_a, id_b, dist) with id = doc_id:media_ref.
    * Identical re-encodes collide at dist 0; brightness/crop-adjacent
    * variants within Hamming ≤ maxDist. Scale: pixel decode is narrow and
    * per-row; only (id, 48-bit hash) rows reach the banding exchange, and
    * hot buckets (e.g. a flat-black thumbnail half the web shares) are
    * capped like every LSH path. */
  def mediaNearDuplicates(spark: SparkSession, media: Dataset[MediaRow],
                          maxDist: Int = 3, maxBucket: Int = 64): DataFrame = {
    val hs = perceptualHashes(spark, media).toDF()
      .select(concat_ws(":", col("doc_id"), col("media_ref")).as("id"),
        col("ahash").as("sim"))
    Dedup.hamming48Pairs(hs, maxDist, maxBucket)
  }

  // ---------- resize + frame sampling (payload → payload transforms) ----------

  /** Nearest-neighbor resize of one decoded P6 frame to dstW×dstH. Sampling
    * convention matches [[aHash48]]'s grid (src y = r·h/dstH, x = c·w/dstW,
    * floor division) so the resize is closed-form replayable from the
    * synthetic pixel rule: resized pixel (r, c, ch) is source pixel index
    * ((r·h/dstH)·w + c·w/dstW)·3 + ch. */
  def resizeFrame(bytes: Array[Byte], f: PpmFrame, dstW: Int, dstH: Int): Array[Byte] = {
    require(dstW > 0 && dstH > 0, "resize target must be positive")
    val out = new Array[Byte](dstW * dstH * 3)
    var r = 0
    while (r < dstH) {
      val y = r * f.h / dstH
      var c = 0
      while (c < dstW) {
        val x = c * f.w / dstW
        val src = f.pixelOffset + (y * f.w + x) * 3
        val dst = (r * dstW + c) * 3
        out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Resize every visual payload to dstW×dstH: decode each P6 frame (image,
    * or all frames of a video), nearest-neighbor resample, re-encode, and
    * re-wrap in a GRFT header with the new dims — a REAL payload→payload
    * transform, so the output composes with [[extractFeatures]],
    * [[perceptualHashes]], and [[sampleFrames]] unchanged. Partition-batched
    * like every media kernel (binary never leaves the map stage; at 10^12
    * docs this is the narrow per-row preprocessing step before an embedder,
    * and it SHRINKS the bytes that flow downstream). Degrade ladder: audio
    * and unknown-header rows pass through untouched; a visual payload whose
    * body fails its codec (any malformed frame) passes through bit-exact —
    * resize never invents pixels for content it could not decode. */
  def resizeVisual(spark: SparkSession, media: Dataset[MediaRow],
                   dstW: Int, dstH: Int, batchSize: Int = 64): Dataset[MediaRow] = {
    import spark.implicits._
    require(dstW > 0 && dstH > 0, "resize target must be positive")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          parseHeader(m.content) match {
            case Some(h) if h.modality == "image" || h.modality == "video" =>
              var off = HeaderLen
              val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
              var ok = true
              while (ok && off < m.content.length) {
                parsePpm(m.content, off) match {
                  case Some(f) =>
                    frames += encodePpm(dstW, dstH, resizeFrame(m.content, f, dstW, dstH))
                    off = f.nextOffset
                  case None => ok = false
                }
              }
              if (ok && frames.nonEmpty)
                m.copy(width = dstW, height = dstH,
                  content = Array.concat(
                    writeHeader(h.modality, dstW, dstH, h.durationMs) +: frames.toSeq: _*))
              else m
            case _ => m
          }
        }
      }
    }
  }

  /** Evenly-spaced sample plan: which of `n` decoded frames survive when at
    * most `k` are kept — indices ⌊i·n/k⌋ for i < k, deduplicated (n < k ⇒
    * all n frames, once each). Deterministic and SQL-replayable. */
  def sampleIndices(n: Int, k: Int): Seq[Int] = {
    require(k > 0, "sample count must be positive")
    (0 until k).map(i => i * n / k).distinct.filter(_ < n)
  }

  /** Frame sampling: each visual payload → one standalone IMAGE payload per
    * sampled frame (media_ref suffixed `#f<idx>`), frames chosen by
    * [[sampleIndices]] over the frames the decoder ACTUALLY parsed (not the
    * catalog's plan — a truncated video samples what is really there). An
    * image is its own single frame (`#f0`); audio and undecodable payloads
    * emit nothing. Output rows are full GRFT containers, so the sampled
    * frames feed [[extractFeatures]] / [[perceptualHashes]] /
    * [[resizeVisual]] unchanged — the decode → sample → re-encode loop a
    * video-understanding pipeline runs before per-frame embedding. Scale:
    * per-row narrow work; output bytes ≤ k/frames of the input video bytes,
    * and only sampled frames reach any downstream exchange. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
                   k: Int = 4, batchSize: Int = 64): Dataset[MediaRow] = {
    import spark.implicits._
    require(k > 0, "sample count must be positive")
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          parseHeader(m.content) match {
            case Some(h) if h.modality == "image" || h.modality == "video" =>
              var off = HeaderLen
              val fs = scala.collection.mutable.ArrayBuffer.empty[PpmFrame]
              var ok = true
              while (ok && off < m.content.length) {
                parsePpm(m.content, off) match {
                  case Some(f) => fs += f; off = f.nextOffset
                  case None => ok = false
                }
              }
              if (!ok || fs.isEmpty) Iterator.empty
              else sampleIndices(fs.length, k).iterator.map { fi =>
                val f = fs(fi)
                val px = java.util.Arrays.copyOfRange(m.content, f.pixelOffset, f.nextOffset)
                MediaRow(m.doc_id, s"${m.media_ref}#f$fi", "image", f.w, f.h, 0,
                  writeHeader("image", f.w, f.h, 0) ++ encodePpm(f.w, f.h, px))
              }
            case _ => Iterator.empty
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

  /** Synthetic-body geometry, shared by the encoder and the SQL oracle:
    * thumbnail dims = header dims / 8 (real systems store thumbnails next to
    * originals; keeps the oracle's per-row replay list small), audio samples
    * capped at 2048, flattened-pixel value = (3·i + seed + frame) mod 256,
    * sample value = ((i·(7+hv3) + hv4) mod 65536) − 32768. */
  def thumbDim(d: Int): Int = math.max(1, d / 8)

  /** Deterministic synthetic media table derived from the fixture docs' media
    * spans. Catalog fields are pure functions of the media_ref's tail hex
    * chars (modality = hv1 mod 3; duration = (1+hv2)s for audio/video; dims =
    * 64+4·hv3 × 64+4·hv4 for image/video), and the payload is a fully REAL
    * GRFT container: header + an encoded body (P6 / WAV / P6-frames) whose
    * pixel/sample values are closed-form in (i, hv2, hv3, hv4) — so the
    * DuckDB oracle re-derives the DECODED feature sums from the ref alone. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      .as[(String, String)]
      .map { case (docId, ref) =>
        val code = refHex(ref, 1) % 3
        val modality = ModalityNames(code)
        val hv2 = refHex(ref, 2); val hv3 = refHex(ref, 3); val hv4 = refHex(ref, 4)
        val durationMs = if (code == 0) 0 else 1000 * (1 + hv2)
        val width = if (code == 1) 0 else 64 + 4 * hv3
        val height = if (code == 1) 0 else 64 + 4 * hv4
        val seed = 16 * hv2 + hv3
        def frame(f: Int): Array[Byte] = {
          val tw = thumbDim(width); val th = thumbDim(height)
          val px = new Array[Byte](tw * th * 3)
          var i = 0
          while (i < px.length) { px(i) = ((3 * i + seed + f) % 256).toByte; i += 1 }
          encodePpm(tw, th, px)
        }
        val body: Array[Byte] = code match {
          case 0 => frame(0)
          case 1 =>
            val n = math.min(2048, durationMs)
            val smp = new Array[Short](n)
            var i = 0
            while (i < n) {
              smp(i) = (((i * (7 + hv3) + hv4) % 65536) - 32768).toShort; i += 1
            }
            encodeWav(smp)
          case _ =>
            (0 until framePlan(durationMs)).toArray.flatMap(frame)
        }
        MediaRow(docId, ref, modality, width, height, durationMs,
          writeHeader(modality, width, height, durationMs) ++ body)
      }
  }
}
