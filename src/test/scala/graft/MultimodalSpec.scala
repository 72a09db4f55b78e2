package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.withSyntheticPayload(
    spark.range(0, 30).toDF("media_id"), "media_id")

  test("payload plumbing: binary column with typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(media.filter(col("n_bytes") === 512).count() == 30) // 16 × sha2-hex(64B)/2
    assert(media.select("media_kind").distinct().count() == 3)
  }

  test("feature extraction is deterministic and never shuffles payloads") {
    val f1 = Multimodal.extractFeatures(spark, media, "media_id")
      .collect().map(f => f.mediaId -> f.meanByte).toMap
    val f2 = Multimodal.extractFeatures(spark, media.repartition(4), "media_id")
      .collect().map(f => f.mediaId -> f.meanByte).toMap
    assert(f1 == f2)
    assert(f1.size == 30)
  }

  test("metadata-only queries prune the payload column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("media_kind") === "image")
      .select("media_id", "n_bytes")
    val scan = q.queryExecution.executedPlan.toString
    assert(!scan.contains("payload"), "payload column must be pruned:\n" + scan.take(800))
  }

  test("frame sampling plan works without decoding") {
    val sampled = Multimodal.frameSamplePlan(media, "media_id", everyK = 4)
    assert(sampled.count() > 0)
    assert(sampled.filter(col("n_sampled") <= 0).count() == 0)
  }
}
