package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM media codecs — the REAL decode step behind the multimodal feature
  * extraction (no native image/audio libraries ship in this container, so the
  * formats are parsed from first principles against their public specs):
  *
  *   - PNG (ISO/IEC 15948): chunk walk, IHDR parse, zlib inflate of IDAT, and
  *     full scanline unfiltering (None/Sub/Up/Average/Paeth) for 8-bit
  *     grayscale / RGB / RGBA, plus a matching encoder used by the fixture.
  *   - WAV (RIFF PCM): fmt/data chunk walk, 16-bit little-endian samples.
  *   - A minimal length-prefixed video container ("GVF0") holding PNG frames —
  *     a stand-in for a real container format, with a real frame walk + decode.
  *
  * Decoders validate magic bytes and structure and throw on malformed input;
  * `Multimodal.decode` routes by magic and falls back to raw byte stats for
  * unknown formats.
  */
object Codecs {

  // ---------------------------------------------------------------- PNG ----

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** 8-bit image; `pixels` is row-major, `bytesPerPixel` channels per pixel. */
  final case class PngImage(width: Int, height: Int, bitDepth: Int, colorType: Int,
                            pixels: Array[Byte]) {
    def bytesPerPixel: Int = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case other => throw new IllegalArgumentException(s"unsupported color type $other")
    }
  }

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 && bytes.take(8).sameElements(PngSig)

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB)
    out.write(data)
    val crc = new CRC32()
    crc.update(typB)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Encode 8-bit pixels (gray colorType=0, rgb=2, rgba=6) as a real PNG:
    * filter-0 scanlines, one zlib IDAT, CRC32-stamped chunks. */
  def encodePng(width: Int, height: Int, pixels: Array[Byte], colorType: Int = 0): Array[Byte] = {
    val bpp = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    require(pixels.length == width * height * bpp,
      s"pixel buffer ${pixels.length} != $width x $height x $bpp")
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte) // bit depth 8
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive filter, no interlace
      .array()
    chunk(out, "IHDR", ihdr)
    // scanlines: filter byte 0 (None) + row bytes
    val stride = width * bpp
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = 0
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zbuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    chunk(out, "IDAT", zbuf.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG: chunk walk, IHDR, zlib-inflate concatenated IDATs, unfilter
    * every scanline (all five PNG filter types). 8-bit gray/RGB/RGBA,
    * non-interlaced. */
  def decodePng(bytes: Array[Byte]): PngImage = {
    require(isPng(bytes), "not a PNG: bad signature")
    var pos = 8
    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      require(pos + 8 <= bytes.length, "truncated PNG chunk header")
      val len = ByteBuffer.wrap(bytes, pos, 4).getInt
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= bytes.length, s"truncated PNG chunk $typ")
      typ match {
        case "IHDR" =>
          val b = ByteBuffer.wrap(bytes, pos + 8, len)
          width = b.getInt; height = b.getInt
          bitDepth = b.get() & 0xff; colorType = b.get() & 0xff
          b.get() // compression (always 0)
          b.get() // filter method (always 0)
          val interlace = b.get() & 0xff
          require(bitDepth == 8, s"unsupported bit depth $bitDepth (8-bit only)")
          require(interlace == 0, "interlaced PNG not supported")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk: skip
      }
      pos += 12 + len
    }
    require(width > 0 && height > 0, "PNG missing IHDR")
    val img = PngImage(width, height, bitDepth, colorType, null)
    val bpp = img.bytesPerPixel
    val stride = width * bpp
    // zlib inflate
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](height * (stride + 1))
    var off = 0
    while (!inflater.finished() && off < raw.length)
      off += inflater.inflate(raw, off, raw.length - off)
    inflater.end()
    require(off == raw.length, s"short inflate: $off of ${raw.length} bytes")
    // unfilter: a = left, b = above, c = above-left (per PNG spec, per byte
    // with bpp-byte lookback)
    val px = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val a = if (x >= bpp) px(rowOut + x - bpp) & 0xff else 0
        val b = if (y > 0) px(rowOut - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) px(rowOut - stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case other => throw new IllegalArgumentException(s"bad PNG filter type $other")
        }
        px(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    img.copy(pixels = px)
  }

  // ---------------------------------------------------------------- WAV ----

  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                            samples: Array[Short])

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE"

  /** Encode mono 16-bit PCM as a canonical RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode RIFF/WAVE PCM16: chunk walk to fmt + data. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(isWav(bytes), "not a WAV: bad RIFF/WAVE header")
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = ByteBuffer.wrap(bytes, pos + 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      require(len >= 0 && pos + 8 + len <= bytes.length, s"truncated WAV chunk $id")
      id match {
        case "fmt " =>
          val b = ByteBuffer.wrap(bytes, pos + 8, len).order(ByteOrder.LITTLE_ENDIAN)
          val fmt = b.getShort
          require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
          channels = b.getShort
          sampleRate = b.getInt
          b.getInt // byte rate
          b.getShort // block align
          bits = b.getShort
          require(bits == 16, s"unsupported WAV bit depth $bits (16-bit only)")
        case "data" =>
          val b = ByteBuffer.wrap(bytes, pos + 8, len).order(ByteOrder.LITTLE_ENDIAN)
          samples = Array.fill(len / 2)(b.getShort)
        case _ => () // other chunk: skip
      }
      pos += 8 + len + (len & 1) // RIFF chunks pad to even length
    }
    require(sampleRate > 0 && samples != null, "WAV missing fmt or data chunk")
    WavAudio(sampleRate, channels, bits, samples)
  }

  // --------------------------------------------------------------- JPEG ----

  /** Frame-header metadata from a JPEG's SOF marker (ITU-T T.81 §B.2.2). */
  final case class JpegMeta(width: Int, height: Int, components: Int,
                            precision: Int, progressive: Boolean)

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  /** Marker walk to the first SOF0–SOF15 frame header (skipping the
    * non-frame C4/C8/CC markers), returning dimensions without entropy
    * decode — the standard way to read JPEG metadata cheaply; the walk
    * handles fill bytes, standalone markers, and variable-length segments. */
  def decodeJpegMeta(bytes: Array[Byte]): JpegMeta = {
    require(isJpeg(bytes), "not a JPEG: bad SOI signature")
    var pos = 2
    while (pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xff) == 0xff, f"bad JPEG marker alignment at $pos")
      var marker = bytes(pos + 1) & 0xff
      while (marker == 0xff && pos + 2 < bytes.length) { // fill bytes
        pos += 1; marker = bytes(pos + 1) & 0xff
      }
      if (marker == 0xd9) // EOI before any SOF
        throw new IllegalArgumentException("JPEG has no SOF frame header")
      else if ((marker >= 0xd0 && marker <= 0xd8) || marker == 0x01) pos += 2 // standalone
      else {
        val len = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        require(len >= 2 && pos + 2 + len <= bytes.length, s"truncated JPEG segment at $pos")
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          require(len >= 8, "SOF segment too short")
          val precision = bytes(pos + 4) & 0xff
          val height = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
          val width = ((bytes(pos + 7) & 0xff) << 8) | (bytes(pos + 8) & 0xff)
          val comps = bytes(pos + 9) & 0xff
          return JpegMeta(width, height, comps, precision, progressive = marker == 0xc2)
        }
        if (marker == 0xda) // SOS: entropy data follows, no SOF seen
          throw new IllegalArgumentException("JPEG has no SOF before scan data")
        pos += 2 + len
      }
    }
    throw new IllegalArgumentException("truncated JPEG: no SOF marker found")
  }

  /** Structurally-valid JFIF fixture: SOI, APP0, COM, DQT, SOF0 carrying the
    * given dimensions, SOS with a token scan payload, EOI. The entropy data
    * is NOT a real encoded image (fixture for the metadata path — full
    * baseline huffman+DCT decode is out of scope); every marker segment is
    * spec-shaped so the SOF walk exercises real skipping. */
  def encodeJpegFixture(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff)
    val out = new ByteArrayOutputStream()
    def marker(m: Int, payload: Array[Byte]): Unit = {
      out.write(0xff); out.write(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      out.write(payload)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xe0, "JFIF ".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0)) // APP0: v1.2, no density, no thumb
    marker(0xfe, "graft fixture".getBytes("US-ASCII")) // COM
    marker(0xdb, Array[Byte](0) ++ Array.fill[Byte](64)(16)) // DQT: table 0, flat
    val sof = ByteBuffer.allocate(15)
      .put(8.toByte) // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(3.toByte) // components
      .put(Array[Byte](1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0)) // id, sampling, quant
      .array()
    marker(0xc0, sof) // SOF0 baseline
    marker(0xda, Array[Byte](3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS header
    out.write(Array[Byte](0x12, 0x34, 0x56)) // token entropy bytes (not decoded)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------- video container ----

  private val VideoMagic = "GVF0".getBytes("US-ASCII")

  def isVideo(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 && bytes.take(4).sameElements(VideoMagic)

  /** Minimal video container: "GVF0", frame count (BE u32), then each frame as
    * length-prefixed (BE u32) PNG bytes. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(VideoMagic)
    out.write(ByteBuffer.allocate(4).putInt(frames.length).array())
    frames.foreach { f =>
      out.write(ByteBuffer.allocate(4).putInt(f.length).array())
      out.write(f)
    }
    out.toByteArray
  }

  /** Walk the container and return the raw frame payloads (PNGs). */
  def decodeVideoFrames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    require(isVideo(bytes), "not a GVF0 video container")
    val n = ByteBuffer.wrap(bytes, 4, 4).getInt
    require(n >= 0, "negative frame count")
    var pos = 8
    (0 until n).map { _ =>
      require(pos + 4 <= bytes.length, "truncated video frame header")
      val len = ByteBuffer.wrap(bytes, pos, 4).getInt
      require(len >= 0 && pos + 4 + len <= bytes.length, "truncated video frame")
      val f = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)
      pos += 4 + len
      f
    }
  }
}
