package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for the character-bigram entropy's heavy
  * term: Σ c·⌊ln(c)·10⁶⌋ over the bigram histogram of the input string
  * (the `sclc` of `char_entropy`'s H = ln n − (Σ c·ln c)/n, with n =
  * length−1 left to the built-in `length`).
  *
  * This is the custom-`Expression` tier (SURVEY.md §7.3 (b)), replacing
  * a 4-stage higher-order-function pipeline (code-point transform →
  * packed-bigram transform → array_sort → run-length fold) that Spark
  * evaluates with interpreted lambdas — one boxed invocation per
  * character per stage, measured ~6.8 s for the sf0.1 suite row where
  * this one-pass JVM loop runs it in well under a second. Semantics are
  * BIT-IDENTICAL to the HOF form and to the DuckDB oracle's
  * explode+groupBy spelling: bigram identity is the consecutive
  * CODE-POINT pair (bijective with the 2-char substring both engines
  * count), counts come from a primitive-long sort + run-length scan,
  * and the ln/floor is the same `Math.log`/`Math.floor` Spark's
  * LN/FLOOR evaluate.
  */
case class BigramSclc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bigram_sclc expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    BigramSclc.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramSclc.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramSclc =
    copy(child = newChild)
}

object BigramSclc {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < 2) return 0L
    // consecutive code-point pairs packed into one long (2^21 > the
    // 0x10FFFF ceiling — bijective with the 2-char substring)
    val grams = new Array[Long](n - 1)
    var i = 0
    var prev = s.codePointAt(0)
    var g = 0
    i = Character.charCount(prev)
    while (i < s.length) {
      val cp = s.codePointAt(i)
      grams(g) = (prev.toLong << 21) | cp.toLong
      g += 1
      prev = cp
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(grams)
    // run-length scan: Σ c·⌊ln(c)·1e6⌋ with the exact Math.log/floor
    // Spark's LN/FLOOR evaluate (and DuckDB matches at the 6dp floor)
    var sclc = 0L
    var runStart = 0
    i = 1
    while (i <= grams.length) {
      if (i == grams.length || grams(i) != grams(runStart)) {
        val c = (i - runStart).toLong
        sclc += c * math.floor(math.log(c.toDouble) * 1000000).toLong
        runStart = i
      }
      i += 1
    }
    sclc
  }

  /** Column-level entry point: `bigramSclc($"t")`. */
  def bigramSclc(text: Column): Column =
    ColumnBridge.column(BigramSclc(ColumnBridge.expression(text)))

  /** Register `bigram_sclc` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bigram_sclc", exprs => BigramSclc(exprs(0)), "built-in")
}
