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
    "gzip_decompress_from_base64_string" -> "graft_gzip_decompress_b64")

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

  def gzipDecompress(s: UTF8String): UTF8String = try {
    val bytes = java.util.Base64.getDecoder.decode(s.toString)
    val gz = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream(bytes.length * 3 + 32)
    val buf = new Array[Byte](4096)
    var n = gz.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = gz.read(buf) }
    UTF8String.fromBytes(out.toByteArray)
  } catch { case _: Exception => UTF8String.EMPTY_UTF8 }
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
