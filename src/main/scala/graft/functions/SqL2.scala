package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native squared-L2 distance over `array<double>` columns: the value of
  * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
  *            0.0D, (acc, d) -> acc + d)`
  * — the PQ-family sub-distance — as ONE fused expression. The HOF
  * formulation materializes the per-element squared-difference array and
  * pays an interpreted lambda call per element for zip_with AND per
  * element for the fold; this is a single codegen loop with the
  * IDENTICAL left-to-right double accumulation `((0 + d_0) + d_1) + …`,
  * so results are bitwise-equal (SqL2Spec pins it) and the callers'
  * `round(..., 6)` readout stays outside, unchanged.
  *
  * Null semantics mirror the composite: null input array → null;
  * unequal lengths → zip_with pads the shorter side with nulls, the
  * squared term is null, and the fold's `acc + null` nulls the result —
  * so ANY null operand position nulls the whole distance.
  */
case class SqL2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sq_l2 expects array<double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SqL2.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
       |java.lang.Double $boxed = graft.functions.SqL2.compute($a, $b);
       |if ($boxed == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $boxed.doubleValue(); }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqL2 =
    copy(left = newLeft, right = newRight)
}

object SqL2 {

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null (boxed) when any aligned position has a null operand —
    * including the positions zip_with would pad on a length mismatch.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb) return null // a padded position is null either way
    var acc = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column entry point: `sq_l2($"a", $"b")`. */
  def sq_l2(a: Column, b: Column): Column =
    ColumnBridge.column(SqL2(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
