package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native K-component MinHash signature over a hash array: the value of
  * `array(array_min(transform(hs, h -> (a_0*h + b_0) % P)), ...,
  *        array_min(transform(hs, h -> (a_{k-1}*h + b_{k-1}) % P)))`
  * for the affine family `a_i = 2i + 3`, `b_i = 104729 (i + 1)`,
  * `P = 2^31 − 1` — the [[graft.ext.DedupQueries]] signature family —
  * as ONE array expression. The HOF formulation plans k independent
  * `array_min(transform(...))` trees and walks the hash array k times
  * with an interpreted lambda per element per component; this walks it
  * once with k running minima inside whole-stage codegen. Arithmetic is
  * the identical Long `(a*h + b) % P` (Java remainder semantics,
  * negative inputs included), so values are bit-equal to the HOF form
  * and the DuckDB oracles' spelled-out idiom (MinhashSigSpec pins it).
  *
  * Null semantics mirror the composite exactly: a null or empty input
  * array yields an array of k nulls (`transform(null)` is null,
  * `array_min` of null/empty is null, `array(...)` of nulls is a
  * non-null array) — NOT a null array, so callers that need a null sig
  * for degenerate docs keep their explicit `when` guard; null elements
  * are skipped, as `array_min` skips nulls.
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<bigint>, got $other")
    }

  // input null must NOT null-propagate (the composite returns an array
  // of k nulls for a null input), so eval/codegen handle null directly
  // instead of the nullSafeEval path
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    MinhashSig.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          graft.functions.MinhashSig.compute(
            ${c.isNull} ? null : ${c.value}, $k);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(hs: ArrayData, k: Int): GenericArrayData = {
    val out = new Array[Any](k) // k nulls until a minimum is seen
    if (hs != null) {
      val n = hs.numElements()
      val mins = new Array[Long](k)
      val has = new Array[Boolean](k)
      var e = 0
      while (e < n) {
        if (!hs.isNullAt(e)) {
          val h = hs.getLong(e)
          var i = 0
          while (i < k) {
            val v = ((2L * i + 3L) * h + 104729L * (i + 1)) % 2147483647L
            if (!has(i) || v < mins(i)) { mins(i) = v; has(i) = true }
            i += 1
          }
        }
        e += 1
      }
      var i = 0
      while (i < k) { if (has(i)) out(i) = java.lang.Long.valueOf(mins(i)); i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Column entry point: the k-component signature of a hash array. */
  def minhash_sig(hs: Column, k: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(hs), k))
}
