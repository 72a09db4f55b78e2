package graft.plans

import java.io.ByteArrayOutputStream
import java.util.zip.{DataFormatException, Deflater, GZIPInputStream, GZIPOutputStream, Inflater}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KQL compression codec scalars (`zlib_compress_to_base64_string` family;
  * reference KQL surface `/root/reference/README.md:33-34`) as native Catalyst
  * expressions: per-row java.util.zip work has no Column-combinator
  * formulation, and an Expression with codegen keeps the call inside
  * WholeStageCodegen (vs a boxed ScalaUDF). Compression bytes are
  * deterministic for a fixed JVM zlib (level/default strategy, zero'd gzip
  * header), and decompression accepts any conformant stream — the oracle
  * checks a roundtrip identity plus fixed Python-generated literals, so the
  * two directions verify each other without trusting either.
  *
  * Kusto's error contract: malformed input to the decompress forms yields an
  * EMPTY string (not null, not an error).
  */
object CodecExpressions {

  val names: Map[String, String] = Map(
    "zlib_compress_to_base64_string" -> "graft_zlib_compress_b64",
    "zlib_decompress_from_base64_string" -> "graft_zlib_decompress_b64",
    "gzip_compress_to_base64_string" -> "graft_gzip_compress_b64",
    "gzip_decompress_from_base64_string" -> "graft_gzip_decompress_b64",
    "punycode_from_string" -> "graft_punycode_encode",
    "punycode_to_string" -> "graft_punycode_decode",
    "parse_xml" -> "graft_xml_to_json",
    "text_normalize_nfc" -> "graft_nfc",
    "text_normalize_nfkc" -> "graft_nfkc",
    "punycode_domain_from_string" -> "graft_punycode_domain_encode",
    "punycode_domain_to_string" -> "graft_punycode_domain_decode")

  /** Unicode normalization (engine extension, like url_normalize — not Kusto
    * surface): NFC for canonical composition parity across sources, NFKC for
    * the compatibility fold (ligatures/width/circled forms) LLM text
    * pipelines apply before tokenization. java.text.Normalizer implements
    * the published UAX #15 algorithm — deterministic for a fixed Unicode
    * version. */
  def nfcNormalize(s: UTF8String): UTF8String = UTF8String.fromString(
    java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  def nfkcNormalize(s: UTF8String): UTF8String = UTF8String.fromString(
    java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFKC))

  // ---- static helpers (also the codegen call targets) ----

  def zlibCompress(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val d = new Deflater() // default level + zlib wrapper
    d.setInput(in); d.finish()
    val out = new ByteArrayOutputStream(in.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    UTF8String.fromString(java.util.Base64.getEncoder.encodeToString(out.toByteArray))
  }

  def zlibDecompress(s: UTF8String): UTF8String = try {
    val bytes = java.util.Base64.getDecoder.decode(s.toString)
    val inf = new Inflater()
    inf.setInput(bytes)
    val out = new ByteArrayOutputStream(bytes.length * 3 + 32)
    val buf = new Array[Byte](4096)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new DataFormatException("truncated")
      out.write(buf, 0, n)
    }
    inf.end()
    UTF8String.fromBytes(out.toByteArray)
  } catch { case _: Exception => UTF8String.EMPTY_UTF8 }

  def gzipCompress(s: UTF8String): UTF8String = {
    val out = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(out) // zero'd MTIME header — deterministic
    gz.write(s.getBytes); gz.close()
    UTF8String.fromString(java.util.Base64.getEncoder.encodeToString(out.toByteArray))
  }

  // ---- punycode (RFC 3492, implemented from the public spec) ----
  // Kusto pair: punycode_from_string ENCODES (plain → punycode),
  // punycode_to_string DECODES. Raw-label semantics (no xn-- / domain
  // splitting — that is the *_domain_* variant). Malformed input → empty
  // string, the Kusto error convention shared with the codecs above.

  private final val PBase = 36; private final val PTmin = 1; private final val PTmax = 26
  private final val PSkew = 38; private final val PDamp = 700
  private final val PInitBias = 72; private final val PInitN = 128

  private def punyAdapt(d0: Int, numPoints: Int, first: Boolean): Int = {
    var delta = if (first) d0 / PDamp else d0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((PBase - PTmin) * PTmax) / 2) { delta /= PBase - PTmin; k += PBase }
    k + (((PBase - PTmin + 1) * delta) / (delta + PSkew))
  }

  private def punyDigitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def punyCharDigit(c: Char): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  def punyEncode(s: UTF8String): UTF8String = try {
    val input = s.toString.codePoints().toArray
    val sb = new StringBuilder
    input.iterator.filter(_ < 128).foreach(c => sb.append(c.toChar))
    val basicCount = sb.length
    if (basicCount > 0) sb.append('-')
    var handled = basicCount
    var n = PInitN; var delta = 0; var bias = PInitBias
    while (handled < input.length) {
      val m = input.iterator.filter(_ >= n).min
      delta = Math.addExact(delta, Math.multiplyExact(m - n, handled + 1))
      n = m
      input.foreach { c =>
        if (c < n) delta = Math.addExact(delta, 1)
        else if (c == n) {
          var q = delta
          var k = PBase
          var done = false
          while (!done) {
            val t = if (k <= bias) PTmin else if (k >= bias + PTmax) PTmax else k - bias
            if (q < t) { sb.append(punyDigitChar(q)); done = true }
            else {
              sb.append(punyDigitChar(t + ((q - t) % (PBase - t))))
              q = (q - t) / (PBase - t); k += PBase
            }
          }
          bias = punyAdapt(delta, handled + 1, handled == basicCount)
          delta = 0; handled += 1
        }
      }
      delta += 1; n += 1
    }
    UTF8String.fromString(sb.toString)
  } catch { case _: Exception => UTF8String.EMPTY_UTF8 }

  def punyDecode(s: UTF8String): UTF8String = try {
    val in = s.toString
    // RFC 3492 3.1: the basic string is everything before the LAST delimiter;
    // a delimiter at position 0 means an EMPTY basic string (input "-abc"
    // decodes the extended body "abc"), only a wholly-absent delimiter does
    val lastDelim = in.lastIndexOf('-')
    val basic = if (lastDelim >= 0) in.substring(0, lastDelim) else ""
    require(basic.forall(_ < 128))
    val buf = scala.collection.mutable.ArrayBuffer[Int](basic.map(_.toInt): _*)
    var i = 0; var n = PInitN; var bias = PInitBias
    var pos = if (lastDelim >= 0) lastDelim + 1 else 0
    while (pos < in.length) {
      val oldi = i
      var w = 1; var k = PBase
      var done = false
      while (!done) {
        require(pos < in.length, "truncated punycode")
        val d = punyCharDigit(in.charAt(pos)); pos += 1
        require(d >= 0, "bad punycode digit")
        i = Math.addExact(i, Math.multiplyExact(d, w))
        val t = if (k <= bias) PTmin else if (k >= bias + PTmax) PTmax else k - bias
        if (d < t) done = true
        else { w = Math.multiplyExact(w, PBase - t); k += PBase }
      }
      bias = punyAdapt(i - oldi, buf.length + 1, oldi == 0)
      n = Math.addExact(n, i / (buf.length + 1))
      i %= buf.length + 1
      require(Character.isValidCodePoint(n))
      buf.insert(i, n)
      i += 1
    }
    UTF8String.fromString(new String(buf.toArray, 0, buf.length))
  } catch { case _: Exception => UTF8String.EMPTY_UTF8 }

  // ---- punycode DOMAIN variants: per-label xn-- handling ----------------
  // Labels split on '.', each encoded (non-ASCII → "xn--" + RFC 3492) or
  // decoded (xn-- prefix stripped) independently; any bad label → empty
  // string for the whole result (the codec-family error convention).

  private def mapLabels(s: UTF8String, f: String => String): UTF8String = try {
    UTF8String.fromString(s.toString.split("\\.", -1).map(f).mkString("."))
  } catch { case _: Exception => UTF8String.EMPTY_UTF8 }

  def punyDomainEncode(s: UTF8String): UTF8String = mapLabels(s, l =>
    if (l.forall(_ < 128)) l
    else {
      val enc = punyEncode(UTF8String.fromString(l)).toString
      require(enc.nonEmpty, "bad label")
      "xn--" + enc
    })

  def punyDomainDecode(s: UTF8String): UTF8String = mapLabels(s, l =>
    if (l.toLowerCase.startsWith("xn--")) {
      val dec = punyDecode(UTF8String.fromString(l.substring(4))).toString
      require(dec.nonEmpty, "bad label")
      dec
    } else l)

  def gzipDecompress(s: UTF8String): UTF8String = try {
    val bytes = java.util.Base64.getDecoder.decode(s.toString)
    val gz = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream(bytes.length * 3 + 32)
    val buf = new Array[Byte](4096)
    var n = gz.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = gz.read(buf) }
    UTF8String.fromBytes(out.toByteArray)
  } catch { case _: Exception => UTF8String.EMPTY_UTF8 }

  // ---- parse_xml: minimal well-formed XML → canonical JSON --------------
  // Hand-rolled non-validating parser (no DTD resolution, no external
  // entities — deliberate, for determinism and safety). Mapping (the public
  // Kusto parse_xml contract): an element with neither attributes nor child
  // elements becomes its trimmed text (or null when empty); otherwise an
  // object with "@attr" entries in document order, child entries in
  // first-appearance order (repeated names become arrays in document
  // order), and a trailing "#text" for non-empty mixed text. Leaf values
  // stay JSON strings (documented deviation: Kusto coerces numeric-looking
  // text on access). Malformed input → EMPTY string (the codec-family error
  // convention; the parse_xml dispatch wraps with try_parse_json, so the
  // observable KQL result is Kusto's null).

  def xmlToJson(s: UTF8String): UTF8String = try {
    val r = XmlLite.toJson(s.toString)
    if (r == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(r)
  } catch { case _: Exception => UTF8String.EMPTY_UTF8 }

  private object XmlLite {
    import scala.collection.mutable.ArrayBuffer

    private final class Elem(val name: String) {
      val attrs = ArrayBuffer[(String, String)]()
      val children = ArrayBuffer[Elem]()
      val text = new java.lang.StringBuilder
    }

    def toJson(xml: String): String = {
      val p = new P(xml)
      p.skipProlog()
      p.ws()
      if (p.atEnd || p.cur != '<') return null
      val root = p.element()
      p.skipMisc(); p.ws()
      if (!p.atEnd) null
      else "{" + jstr(root.name) + ":" + value(root) + "}"
    }

    private def value(e: Elem): String = {
      val t = e.text.toString.trim
      if (e.attrs.isEmpty && e.children.isEmpty) {
        if (t.isEmpty) "null" else jstr(t)
      } else {
        val parts = ArrayBuffer[String]()
        e.attrs.foreach { case (k, v) => parts += jstr("@" + k) + ":" + jstr(v) }
        val grouped = new java.util.LinkedHashMap[String, ArrayBuffer[Elem]]()
        e.children.foreach { c =>
          grouped.computeIfAbsent(c.name, _ => ArrayBuffer[Elem]()) += c
        }
        grouped.forEach { (k, cs) =>
          parts += jstr(k) + ":" + (if (cs.size == 1) value(cs.head)
            else cs.map(value).mkString("[", ",", "]"))
        }
        if (t.nonEmpty) parts += jstr("#text") + ":" + jstr(t)
        parts.mkString("{", ",", "}")
      }
    }

    private def jstr(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length + 2)
      sb.append('"')
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }

    private final class P(s: String) {
      var i = 0
      def atEnd: Boolean = i >= s.length
      def cur: Char = s.charAt(i)
      def fail(): Nothing = throw new IllegalArgumentException("malformed xml")
      def ws(): Unit =
        while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
      def startsWith(p: String): Boolean = s.regionMatches(i, p, 0, p.length)
      def skipUntil(p: String): Unit = {
        val j = s.indexOf(p, i); if (j < 0) fail(); i = j + p.length
      }
      def skipMisc(): Unit = {
        var go = true
        while (go) {
          ws()
          if (startsWith("<?")) skipUntil("?>")
          else if (startsWith("<!--")) skipUntil("-->")
          else go = false
        }
      }
      def skipProlog(): Unit = {
        if (i < s.length && s.charAt(i) == '\uFEFF') i += 1
        skipMisc()
        if (startsWith("<!DOCTYPE")) { skipDoctype(); skipMisc() }
      }
      // internal subsets nest in [...]; skip to the '>' at bracket depth 0
      private def skipDoctype(): Unit = {
        var depth = 0
        while (i < s.length) {
          val c = s.charAt(i); i += 1
          if (c == '[') depth += 1
          else if (c == ']') depth -= 1
          else if (c == '>' && depth == 0) return
        }
        fail()
      }
      def name(): String = {
        val st = i
        if (i < s.length && (Character.isLetter(cur) || cur == '_' || cur == ':')) i += 1
        else fail()
        while (i < s.length && (Character.isLetterOrDigit(cur) ||
          "._-:".indexOf(cur.toInt) >= 0)) i += 1
        s.substring(st, i)
      }
      def decode(t: String): String = if (t.indexOf('&') < 0) t else {
        val sb = new java.lang.StringBuilder(t.length)
        var j = 0
        while (j < t.length) {
          val c = t.charAt(j)
          if (c == '&') {
            val sc = t.indexOf(';', j)
            if (sc < 0) fail()
            t.substring(j + 1, sc) match {
              case "amp" => sb.append('&')
              case "lt" => sb.append('<')
              case "gt" => sb.append('>')
              case "quot" => sb.append('"')
              case "apos" => sb.append('\'')
              case e if e.length > 2 && (e.charAt(0) == '#') &&
                  (e.charAt(1) == 'x' || e.charAt(1) == 'X') =>
                sb.appendCodePoint(Integer.parseInt(e.substring(2), 16))
              case e if e.nonEmpty && e.charAt(0) == '#' =>
                sb.appendCodePoint(Integer.parseInt(e.substring(1)))
              case _ => fail()
            }
            j = sc + 1
          } else { sb.append(c); j += 1 }
        }
        sb.toString
      }
      private def attrValue(): String = {
        val q = cur
        if (q != '"' && q != '\'') fail()
        i += 1
        val end = s.indexOf(q, i); if (end < 0) fail()
        val v = decode(s.substring(i, end)); i = end + 1; v
      }
      def element(): Elem = {
        if (cur != '<') fail()
        i += 1
        val e = new Elem(name())
        var closed = false
        var done = false
        while (!done) {
          ws()
          if (atEnd) fail()
          else if (startsWith("/>")) { i += 2; closed = true; done = true }
          else if (cur == '>') { i += 1; done = true }
          else {
            val an = name(); ws()
            if (atEnd || cur != '=') fail()
            i += 1; ws()
            e.attrs += ((an, attrValue()))
          }
        }
        if (!closed) content(e)
        e
      }
      private def content(e: Elem): Unit = {
        while (true) {
          val lt = s.indexOf('<', i)
          if (lt < 0) fail()
          if (lt > i) { e.text.append(decode(s.substring(i, lt))); i = lt }
          if (startsWith("</")) {
            i += 2
            val n = name(); ws()
            if (atEnd || cur != '>') fail()
            i += 1
            if (n != e.name) fail()
            return
          }
          else if (startsWith("<!--")) skipUntil("-->")
          else if (startsWith("<![CDATA[")) {
            i += 9
            val end = s.indexOf("]]>", i); if (end < 0) fail()
            e.text.append(s.substring(i, end)); i = end + 3
          }
          else if (startsWith("<?")) skipUntil("?>")
          else e.children += element()
        }
      }
    }
  }
}

/** String→string codec expression; `method` is the CodecExpressions helper
  * name (the codegen path emits a direct static-style call on the object). */
case class CodecExpr(child: Expression, method: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }

  override def dataType: DataType = StringType

  @transient private lazy val fn: UTF8String => UTF8String = method match {
    case "zlibCompress" => CodecExpressions.zlibCompress
    case "zlibDecompress" => CodecExpressions.zlibDecompress
    case "gzipCompress" => CodecExpressions.gzipCompress
    case "gzipDecompress" => CodecExpressions.gzipDecompress
    case "punyEncode" => CodecExpressions.punyEncode
    case "punyDecode" => CodecExpressions.punyDecode
    case "xmlToJson" => CodecExpressions.xmlToJson
    case "nfcNormalize" => CodecExpressions.nfcNormalize
    case "nfkcNormalize" => CodecExpressions.nfkcNormalize
    case "punyDomainEncode" => CodecExpressions.punyDomainEncode
    case "punyDomainDecode" => CodecExpressions.punyDomainDecode
  }

  override protected def nullSafeEval(input: Any): Any =
    fn(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CodecExpressions.$method($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = s"graft_codec_$method"
}
