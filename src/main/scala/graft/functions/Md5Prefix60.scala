package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst scalar for the house 60-bit string hash — the value
  * of `cast(conv(substring(md5(x), 1, 15), 16, 10) AS bigint)`, i.e.
  * the first 15 hex digits of md5 as a non-negative long (first 8
  * digest bytes big-endian, low nibble dropped — [[SimHash60]]'s
  * arithmetic, factored out).
  *
  * That four-function SQL idiom appears per ELEMENT inside the
  * higher-order-function lambdas of the text/dedup tier (per shingle,
  * per word, per n-gram), where Spark evaluates it interpreted: one
  * 32-char hex rendering, one substring, one string-parsing `conv`
  * per element. This expression does one digest and long math — no
  * intermediate strings — and registers as SQL `md5h60` so lambda
  * bodies can call it directly; the DuckDB oracles keep the spelled-out
  * idiom, which stays bit-equal by construction (Md5FnSpec pins
  * native == idiom on random strings).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5h60 expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(text.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Column-level entry point: `md5h60($"s")`. */
  def md5h60(s: Column): Column =
    ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(s)))

  /** Register `md5h60` for SQL use (idempotent) — required for call
    * sites INSIDE higher-order-function lambdas, where only registry
    * functions resolve. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5h60", exprs => Md5Prefix60(exprs(0)), "built-in")
}
