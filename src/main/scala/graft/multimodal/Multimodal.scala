package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this container): a
  * deterministic fake "decoder" derives pixel statistics from the byte stream. The
  * Spark-side plumbing is real and is what matters at 100 TB: binary payloads stay
  * columnar in parquet, metadata is queryable without touching payload bytes (column
  * pruning skips the blob column entirely), batch-shaped per-partition processing is
  * the Scala analogue of Python's `mapInPandas`, and payload-heavy shuffles are avoided
  * by extracting features first and shuffling only the small feature columns.
  */
object Multimodal {

  /** Typed metadata for a media payload; lives alongside the blob, so predicates on
    * (kind, width, height, n_bytes) prune parquet row groups without reading blobs. */
  case class MediaMeta(kind: String, width: Int, height: Int, nBytes: Long)

  case class MediaFeature(mediaId: Long, kind: String, nBytes: Long,
                          meanByte: Double, frameCount: Int)

  /** Attach a synthetic binary payload to a table (test fixture: derives a
    * deterministic blob from an id column; real pipelines read blobs from parquet). */
  def withSyntheticPayload(df: DataFrame, idCol: String): DataFrame = {
    // deterministic pseudo-payload: repeated sha2 of the id, ~1 KiB
    val hexes = (0 until 16).map(i => sha2(concat(col(idCol).cast("string"), lit(i)), 256))
    df.withColumn("payload", to_binary(concat(hexes: _*), lit("hex")))
      .withColumn("media_kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col(idCol) % 3 + 1).cast("int")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
  }

  /** STUB decode: a real implementation would decode image bytes per partition batch
    * (the `???` seam below is where a JNI/codec call goes). The fake derives
    * deterministic "pixel stats" from bytes so the pipeline shape is testable. */
  def decodeStub(bytes: Array[Byte]): (Double, Int) = {
    // ??? — real codec goes here; deterministic fake follows.
    if (bytes == null || bytes.isEmpty) (0.0, 0)
    else {
      var s = 0L
      var i = 0
      while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
      (s.toDouble / bytes.length, 1 + (bytes.length % 16))
    }
  }

  /** Batch feature extraction over the binary column: per-partition imperative loop
    * (mapPartitions ≈ mapInPandas batches), emitting ONLY small feature rows — the
    * blob never crosses a shuffle boundary. */
  def extractFeatures(spark: SparkSession, media: DataFrame, idCol: String): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col(idCol).cast("long").as("media_id"), col("media_kind"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, payload) =>
          val (meanByte, frames) = decodeStub(payload)
          MediaFeature(id, kind, if (payload == null) 0L else payload.length.toLong,
            meanByte, frames)
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
