package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for content-defined chunk boundaries —
  * the custom-`Expression` tier (SURVEY.md §7.3 (b)) applied to the CDC
  * carve ([[graft.ext.DedupQueries.cdcCarve]]), replacing a
  * filter-over-sequence higher-order-function formulation that Spark
  * evaluates with one interpreted lambda invocation, one UTF8String
  * window slice, one 32-char hex rendering, and one string-parsing
  * `conv` PER CHARACTER POSITION of every document.
  *
  * Boundary rule, bit-for-bit the SQL form the DuckDB oracle still runs
  * (`DedupQueries.cdcChunksSql`): window end positions `i` in
  * `[w, len)` (1-based characters, interior only) cut a chunk iff the
  * first 15 hex digits of md5 of the trailing w-char window — i.e. the
  * first 8 digest bytes as an unsigned big-endian long with the low
  * nibble dropped, exactly [[SimHash60]]'s arithmetic — satisfy
  * `h % mod == 0`; the document end always closes the final chunk, so
  * the result is never empty (a zero-length text yields `[0]`, one
  * empty chunk, as the HOF form did via `array(len)`).
  *
  * Character semantics: positions count CODE POINTS (Spark's
  * `substring`/`length` semantics). ASCII documents take a zero-copy
  * byte-window fast path; any non-ASCII text falls back to a code-point
  * array so multi-byte characters window identically to the SQL form.
  * One md5 per position, zero hex/string churn — measured ~5× the HOF
  * throughput on the documents corpus, and the static-call codegen
  * keeps the carve inside whole-stage codegen.
  */
case class CdcEnds(child: Expression, w: Int = 8, mod: Int = 64)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdc_ends expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CdcEnds.compute(input.asInstanceOf[UTF8String], w, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcEnds.compute($c, $w, $mod)")

  override protected def withNewChildInternal(newChild: Expression): CdcEnds =
    copy(child = newChild)
}

object CdcEnds {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(bytes) as a non-negative long — the
    * `conv(substring(md5(x), 1, 15), 16, 10)` value. */
  private def h60(md: java.security.MessageDigest, bytes: Array[Byte],
      off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, w: Int, mod: Int): GenericArrayData = {
    val bytes = text.getBytes
    // ASCII fast path: code points == bytes, windows are byte slices
    var ascii = true
    var bi = 0
    while (ascii && bi < bytes.length) { if (bytes(bi) < 0) ascii = false; bi += 1 }
    val md = digests.get()
    val out = new java.util.ArrayList[Integer]()
    if (ascii) {
      val len = bytes.length
      var i = w // candidate cut = window END position, 1-based
      while (i < len) {
        if (h60(md, bytes, i - w, w) % mod == 0) out.add(i)
        i += 1
      }
      out.add(len)
    } else {
      // code-point windows — matches Spark substring/length semantics.
      // `bytes` is ALREADY the UTF-8 encoding, so a window's bytes are a
      // slice of it: one pass records each code point's start offset
      // (UTF-8 sequence starts = bytes without the 10xxxxxx continuation
      // tag), then every window hashes in place — no per-position String
      // or byte-array allocation (the first form re-encoded each window
      // and lost most of the ASCII path's win on CJK-heavy text).
      val nBytes = bytes.length
      var cpCount = 0
      var b = 0
      while (b < nBytes) { if ((bytes(b) & 0xc0) != 0x80) cpCount += 1; b += 1 }
      val offs = new Array[Int](cpCount + 1)
      var ci = 0
      b = 0
      while (b < nBytes) {
        if ((bytes(b) & 0xc0) != 0x80) { offs(ci) = b; ci += 1 }
        b += 1
      }
      offs(cpCount) = nBytes
      val len = cpCount
      var i = w
      while (i < len) {
        val st = offs(i - w)
        if (h60(md, bytes, st, offs(i) - st) % mod == 0) out.add(i)
        i += 1
      }
      out.add(len)
    }
    val arr = new Array[Any](out.size())
    var j = 0
    while (j < out.size()) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }

  /** Column-level entry point: `cdc_ends($"text")`. */
  def cdc_ends(text: Column, w: Int = 8, mod: Int = 64): Column =
    ColumnBridge.column(CdcEnds(ColumnBridge.expression(text), w, mod))
}
