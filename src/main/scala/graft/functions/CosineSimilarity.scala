package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for cosine similarity over `array<float>` /
  * `array<double>` columns — the custom-`Expression` tier (SURVEY.md §7.3
  * preference order (b)) for the similarity-search operators.
  *
  * Versus the HOF formulation (`aggregate(zip_with(...))`): one fused
  * loop, no intermediate product array, no lambda-function call overhead,
  * and float inputs are consumed without first materializing a casted
  * double array. The arithmetic is IDENTICAL (sequential left-to-right
  * double accumulation of `(double)a[i] * (double)b[i]`), so results are
  * bitwise-equal to the HOF version and the DuckDB
  * `list_cosine_similarity(CAST(... AS DOUBLE[]), ...)` oracle.
  *
  * Semantics: null input → null; length mismatch → null (defensive;
  * DuckDB errors instead, so oracle-checked queries must only compare
  * equal-length vectors); null elements read as 0.0; zero-norm → null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val af = isFloat(left); val bf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
       |final int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  ${ev.isNull} = true;
       |} else {
       |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    final double $x = $a.isNullAt($i) ? 0.0 : (double) $a.$getA($i);
       |    final double $y = $b.isNullAt($i) ? 0.0 : (double) $b.$getB($i);
       |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |  }
       |  final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
       |  if ($denom == 0.0) { ${ev.isNull} = true; }
       |  else { ${ev.value} = $dot / $denom; }
       |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-level entry point: `cosine_sim($"a", $"b")`. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `cosine_sim` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
}
