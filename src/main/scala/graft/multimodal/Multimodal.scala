package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The decode step is REAL (pure-JVM codecs in [[Codecs]]: PNG chunk walk + zlib
  * inflate + scanline unfilter, RIFF/WAVE PCM16 parse, and a length-prefixed frame
  * container for video). The Spark-side shape is what matters at 100 TB: binary
  * payloads stay columnar in parquet, metadata is queryable without touching payload
  * bytes (column pruning skips the blob column entirely), decode runs batch-shaped
  * per partition (the Scala analogue of Python's `mapInPandas`), and payload-heavy
  * shuffles are avoided by extracting small feature rows first.
  */
object Multimodal {

  /** Typed metadata for a media payload; lives alongside the blob, so predicates on
    * (kind, width, height, n_bytes) prune parquet row groups without reading blobs. */
  case class MediaMeta(kind: String, width: Int, height: Int, nBytes: Long)

  /** Decoded per-payload features: `kind` is DETECTED from the payload's magic
    * bytes, not read from metadata. meanVal = mean pixel (image/video first
    * frame), mean PCM sample (audio), or mean raw byte (unknown format).
    * frameCount = 1 (image), sample count (audio), container frames (video). */
  case class MediaFeature(mediaId: Long, kind: String, nBytes: Long,
                          width: Int, height: Int, meanVal: Double, frameCount: Int)

  /** Deterministic synthetic payloads with closed-form content: the pixel /
    * sample values are simple arithmetic in (id, index), so an external oracle
    * can verify the full encode→decode round trip without a codec of its own. */
  object SyntheticMedia {
    def imageDims(id: Long): (Int, Int) = ((8 + id % 9).toInt, (8 + id % 7).toInt)

    def imagePixels(id: Long, frame: Int): Array[Byte] = {
      val (w, h) = imageDims(id)
      Array.tabulate(w * h)(i => ((id * 31 + frame * 17 + i.toLong * 7) % 251).toByte)
    }

    def audioSamples(id: Long): Array[Short] = {
      val n = (64 + id % 64).toInt
      Array.tabulate(n)(i => ((id * 13 + i.toLong * 5) % 2003 - 1001).toShort)
    }

    def videoFrameCount(id: Long): Int = (1 + id % 5).toInt

    /** id % 4: 0 → PNG image, 1 → WAV audio, 2 → GVF0 video of PNG frames,
      * 3 → JPEG (metadata fixture: real marker structure, token scan data). */
    def payload(id: Long): Array[Byte] = (id % 4) match {
      case 0 =>
        val (w, h) = imageDims(id)
        Codecs.encodePng(w, h, imagePixels(id, 0))
      case 1 => Codecs.encodeWav(8000, audioSamples(id))
      case 2 =>
        val (w, h) = imageDims(id)
        val frames = (0 until videoFrameCount(id)).map(f =>
          Codecs.encodePng(w, h, imagePixels(id, f)))
        Codecs.encodeVideo(frames)
      case _ =>
        val (w, h) = imageDims(id)
        Codecs.encodeJpegFixture(w, h)
    }
  }

  /** Attach a real synthetic media payload to a table (test fixture: derives a
    * deterministic PNG/WAV/GVF0 blob from an id column; real pipelines read
    * blobs from parquet). The UDF is fixture-generation only — the query path
    * itself never uses UDFs. */
  def withSyntheticPayload(df: DataFrame, idCol: String): DataFrame = {
    val gen = udf((id: Long) => SyntheticMedia.payload(id))
    df.withColumn("payload", gen(col(idCol).cast("long")))
      .withColumn("media_kind",
        element_at(array(lit("image"), lit("audio"), lit("video"), lit("jpeg")),
          (col(idCol) % 4 + 1).cast("int")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
  }

  private def meanUnsigned(bytes: Array[Byte]): Double =
    if (bytes.isEmpty) 0.0
    else {
      var s = 0L; var i = 0
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      s.toDouble / bytes.length
    }

  final case class MediaDecoded(kind: String, width: Int, height: Int,
                                meanVal: Double, frameCount: Int)

  /** REAL decode, routed by magic bytes; unknown formats degrade to raw byte
    * stats instead of failing the batch. JPEG decode is metadata-only (SOF
    * dimension walk — no entropy decode), so meanVal is 0 for jpeg. */
  def decode(bytes: Array[Byte]): MediaDecoded =
    if (bytes == null || bytes.isEmpty) MediaDecoded("empty", 0, 0, 0.0, 0)
    else if (Codecs.isJpeg(bytes)) {
      val m = Codecs.decodeJpegMeta(bytes)
      MediaDecoded("jpeg", m.width, m.height, 0.0, 1)
    } else if (Codecs.isPng(bytes)) {
      val img = Codecs.decodePng(bytes)
      MediaDecoded("image", img.width, img.height, meanUnsigned(img.pixels), 1)
    } else if (Codecs.isWav(bytes)) {
      val wav = Codecs.decodeWav(bytes)
      val mean =
        if (wav.samples.isEmpty) 0.0
        else wav.samples.foldLeft(0L)(_ + _).toDouble / wav.samples.length
      MediaDecoded("audio", 0, 0, mean, wav.samples.length)
    } else if (Codecs.isVideo(bytes)) {
      val frames = Codecs.decodeVideoFrames(bytes)
      if (frames.isEmpty) MediaDecoded("video", 0, 0, 0.0, 0)
      else {
        val first = Codecs.decodePng(frames.head)
        MediaDecoded("video", first.width, first.height,
          meanUnsigned(first.pixels), frames.length)
      }
    } else MediaDecoded("unknown", 0, 0, meanUnsigned(bytes), 0)

  /** Batch feature extraction over the binary column: per-partition imperative loop
    * (mapPartitions ≈ mapInPandas batches), emitting ONLY small feature rows — the
    * blob never crosses a shuffle boundary. */
  def extractFeatures(spark: SparkSession, media: DataFrame, idCol: String): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col(idCol).cast("long").as("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val d = decode(payload)
          MediaFeature(id, d.kind, if (payload == null) 0L else payload.length.toLong,
            d.width, d.height, d.meanVal, d.frameCount)
        }
      }
  }

  /** Per-frame audio features: one row per fixed-length PCM frame. */
  final case class AudioFrame(media_id: Long, frame_idx: Long, n_samples: Long,
                              zc: Long, sumsq: Long)

  /** Frame-level audio analysis over the binary column: REAL WAV decode per
    * partition, then per `frameLen`-sample frame the zero-crossing count
    * (s[i]·s[i−1] < 0, within-frame only) and energy as the EXACT integer
    * sum of squares — all-integer outputs, so the oracle replays them
    * bit-for-bit. Same shape as extractFeatures: the blob is read once in a
    * partition-local loop and only small feature rows ever shuffle. */
  def audioFrameFeatures(spark: SparkSession, media: DataFrame, idCol: String,
                         frameLen: Int = 16): Dataset[AudioFrame] = {
    import spark.implicits._
    media.filter(col("media_kind") === "audio")
      .select(col(idCol).cast("long").as("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val s = Codecs.decodeWav(payload).samples
          (0 until s.length by frameLen).map { st =>
            val en = math.min(st + frameLen, s.length)
            var zc = 0L
            var sq = 0L
            var i = st
            while (i < en) {
              sq += s(i).toLong * s(i)
              if (i > st && s(i).toInt * s(i - 1) < 0) zc += 1
              i += 1
            }
            AudioFrame(id, (st / frameLen).toLong, (en - st).toLong, zc, sq)
          }
        }
      }
  }

  final case class ImageHash(media_id: Long, kind: String, ahash: String, dhash: String)

  /** Perceptual image hashes through the REAL PNG decode — the image-dedup
    * primitive for multimodal training corpora (bucket on the hash, or
    * hamming-verify within LSH-style bands, exactly like SimHash for text).
    *
    * Exact-integer variants so an external oracle can replay them:
    *   - aHash: 8×8 grid SAMPLE at (⌊r·h/8⌋, ⌊c·w/8⌋) (point sample, not area
    *     interpolation — deterministic under any dims), bit = 64·v ≥ Σv.
    *   - dHash: 8×9 grid, bit = left < right neighbor per row.
    * Emitted as 64-char bit strings (msb-first row-major) — join keys hash
    * the same as a packed int64 and never fight BIGINT sign conventions.
    * Image kinds only (PNG, first video frame); the blob stays in the
    * partition-local loop, only 128 bytes of hash per row ever shuffle. */
  def imagePerceptualHashes(spark: SparkSession, media: DataFrame, idCol: String): Dataset[ImageHash] = {
    import spark.implicits._
    media.filter(col("media_kind").isin("image", "video"))
      .select(col(idCol).cast("long").as("id"), col("media_kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) =>
          val img =
            if (Codecs.isPng(payload)) Codecs.decodePng(payload)
            else Codecs.decodePng(Codecs.decodeVideoFrames(payload).head)
          val w = img.width; val h = img.height
          def px(y: Int, x: Int): Int = img.pixels(y * w + x) & 0xff
          val a = Array.tabulate(64)(k => px(k / 8 * h / 8, k % 8 * w / 8))
          val sum = a.map(_.toLong).sum
          val ahash = a.map(v => if (64L * v >= sum) '1' else '0').mkString
          val d = Array.tabulate(8, 9)((r, c) => px(r * h / 8, c * w / 9))
          val dhash = (for (r <- 0 until 8; c <- 0 until 8)
            yield if (d(r)(c) < d(r)(c + 1)) '1' else '0').mkString
          ImageHash(id, kind, ahash, dhash)
        }
      }
  }

  /** Frame sampling plan for video-kind payloads: metadata-only (never decodes),
    * selecting every k-th frame index — demonstrates pruned, pushdown-friendly
    * planning over multimodal tables. */
  def frameSamplePlan(media: DataFrame, idCol: String, everyK: Int): DataFrame =
    media.filter(col("media_kind") === "video")
      .withColumn("sampled_frames",
        filter(sequence(lit(0L), col("n_bytes") % 64),
          i => i % everyK === 0))
      .select(col(idCol).as("media_id"), size(col("sampled_frames")).as("n_sampled"))
}
