package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{Codecs, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.withSyntheticPayload(
    spark.range(0, 30).toDF("media_id"), "media_id")

  test("payload plumbing: binary column with typed metadata") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(media.filter(col("n_bytes") <= 0).count() == 0)
    assert(media.select("media_kind").distinct().count() == 4)
  }

  test("feature extraction is deterministic and never shuffles payloads") {
    val f1 = Multimodal.extractFeatures(spark, media, "media_id")
      .collect().map(f => f.mediaId -> f.meanVal).toMap
    val f2 = Multimodal.extractFeatures(spark, media.repartition(4), "media_id")
      .collect().map(f => f.mediaId -> f.meanVal).toMap
    assert(f1 == f2)
    assert(f1.size == 30)
  }

  test("decoded kind comes from payload magic bytes and matches the metadata kind") {
    val feats = Multimodal.extractFeatures(spark, media, "media_id").toDF()
    val joined = feats.join(media.select(col("media_id"), col("media_kind"), col("n_bytes")),
      feats("mediaId") === media("media_id"))
    assert(joined.filter(col("kind") =!= col("media_kind")).count() == 0)
    // nBytes reported by the decoder equals the stored payload length
    assert(joined.filter(col("nBytes") =!= col("n_bytes")).count() == 0)
  }

  test("decoded features round-trip the closed-form synthetic content") {
    val feats = Multimodal.extractFeatures(spark, media, "media_id")
      .collect().map(f => f.mediaId -> f).toMap
    (0L until 30L).foreach { id =>
      val f = feats(id)
      (id % 4) match {
        case 0 => // PNG image
          val (w, h) = Multimodal.SyntheticMedia.imageDims(id)
          val px = Multimodal.SyntheticMedia.imagePixels(id, 0)
          val mean = px.map(_ & 0xff).map(_.toLong).sum.toDouble / px.length
          assert((f.width, f.height, f.frameCount) == (w, h, 1))
          assert(f.meanVal == mean)
        case 1 => // WAV audio
          val s = Multimodal.SyntheticMedia.audioSamples(id)
          val mean = s.map(_.toLong).sum.toDouble / s.length
          assert(f.frameCount == s.length)
          assert(f.meanVal == mean)
        case 3 => // JPEG: metadata-only decode (real SOF walk)
          val (w, h) = Multimodal.SyntheticMedia.imageDims(id)
          assert((f.kind, f.width, f.height, f.meanVal, f.frameCount) ==
            ("jpeg", w, h, 0.0, 1))
        case _ => // video container of PNG frames
          val (w, h) = Multimodal.SyntheticMedia.imageDims(id)
          assert((f.width, f.height) == (w, h))
          assert(f.frameCount == Multimodal.SyntheticMedia.videoFrameCount(id))
      }
    }
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

  // ---- pure-JVM codec unit coverage (no Spark) ----

  test("PNG round trip: gray, rgb, rgba") {
    for ((colorType, bpp) <- Seq((0, 1), (2, 3), (6, 4))) {
      val (w, h) = (13, 7)
      val px = Array.tabulate(w * h * bpp)(i => ((i * 37 + 11) % 256).toByte)
      val img = Codecs.decodePng(Codecs.encodePng(w, h, px, colorType))
      assert((img.width, img.height, img.bitDepth, img.colorType) == (w, h, 8, colorType))
      assert(img.pixels.sameElements(px))
    }
  }

  test("PNG decoder unfilters all five filter types") {
    // forward-filter known pixels per the PNG spec, hand-assemble the file,
    // and require the decoder to recover the originals exactly
    val (w, h) = (9, 5)
    val pixels = Array.tabulate(w * h)(i => ((i * 53 + 7) % 256).toByte)
    def p(x: Int, y: Int): Int =
      if (x < 0 || y < 0) 0 else pixels(y * w + x) & 0xff
    val filters = Array(0, 1, 2, 3, 4) // one row per filter type
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val ft = filters(y)
      raw.write(ft)
      for (x <- 0 until w) {
        val cur = p(x, y); val a = p(x - 1, y); val b = p(x, y - 1); val c = p(x - 1, y - 1)
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val q = a + b - c
            val pa = math.abs(q - a); val pb = math.abs(q - b); val pc = math.abs(q - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw.write((cur - pred) & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val z = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) z.write(tmp, 0, deflater.deflate(tmp))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
      val t = typ.getBytes("US-ASCII"); out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array())
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val img = Codecs.decodePng(out.toByteArray)
    assert(img.pixels.sameElements(pixels))
  }

  test("WAV round trip preserves samples, rate, and layout") {
    val samples = Array.tabulate(333)(i => ((i * 97) % 5000 - 2500).toShort)
    val wav = Codecs.decodeWav(Codecs.encodeWav(16000, samples))
    assert((wav.sampleRate, wav.channels, wav.bitsPerSample) == (16000, 1, 16))
    assert(wav.samples.sameElements(samples))
  }

  test("video container round trip walks every frame") {
    val frames = (0 until 4).map(f =>
      Codecs.encodePng(5, 3, Array.tabulate(15)(i => (f * 40 + i).toByte)))
    val back = Codecs.decodeVideoFrames(Codecs.encodeVideo(frames))
    assert(back.size == 4)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
    assert(Codecs.decodePng(back(2)).pixels(0) == 80.toByte)
  }

  test("JPEG SOF walk: dims from the fixture, marker skipping, progressive, errors") {
    val m = Codecs.decodeJpegMeta(Codecs.encodeJpegFixture(641, 479))
    assert((m.width, m.height, m.components, m.precision, m.progressive) ==
      (641, 479, 3, 8, false))
    // hand-built stream: SOI, APP1 (skipped), fill byte, SOF2 progressive
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0xff.toByte, 0xd8.toByte))
    out.write(Array[Byte](0xff.toByte, 0xe1.toByte, 0, 4, 7, 7)) // APP1 len=4
    out.write(0xff) // fill byte before next marker
    out.write(Array[Byte](0xff.toByte, 0xc2.toByte, 0, 11, 8, 1, 0, 0, 2, 1,
      0x11, 0, 0)) // SOF2: 2x256 image, 1 component
    val p = Codecs.decodeJpegMeta(out.toByteArray)
    assert((p.width, p.height, p.components, p.progressive) == (2, 256, 1, true))
    // DHT (C4) must NOT be taken for a frame header
    val dht = new java.io.ByteArrayOutputStream()
    dht.write(Array[Byte](0xff.toByte, 0xd8.toByte))
    dht.write(Array[Byte](0xff.toByte, 0xc4.toByte, 0, 4, 0, 0))
    dht.write(Array[Byte](0xff.toByte, 0xd9.toByte))
    intercept[IllegalArgumentException](Codecs.decodeJpegMeta(dht.toByteArray))
    intercept[IllegalArgumentException](Codecs.decodeJpegMeta(Array[Byte](1, 2, 3)))
  }

  test("decoders reject malformed input; unknown formats degrade to byte stats") {
    intercept[IllegalArgumentException](Codecs.decodePng(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Codecs.decodeWav("RIFFxxxxJUNK".getBytes))
    val d = Multimodal.decode(Array[Byte](10, 20, 30))
    assert(d.kind == "unknown" && d.meanVal == 20.0)
  }
}
