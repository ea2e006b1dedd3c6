package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for the 60-bit SimHash signature — the
  * custom-`Expression` tier (SURVEY.md §7.3 (b)) for the dedup operators,
  * replacing a 3-level higher-order-function formulation that Spark
  * evaluates with interpreted lambdas (one invocation per word per bit).
  *
  * Bit-for-bit equal to the SQL form the DuckDB oracle still runs
  * (`DedupQueries.simhashSqlCtes`): words = split on a single space
  * keeping empties; per-word hash = first 15 hex digits of md5
  * (= first 8 digest bytes as an unsigned big-endian long, low nibble
  * dropped); per-bit majority vote over words WITH multiplicity
  * (tie → 0, matching `CASE WHEN vote > 0`); signature = Σ bit_i · 2^i.
  *
  * One md5 and one fused 60-bit vote loop per word, zero allocations
  * beyond the digest — ~10× the HOF throughput, and the static-call
  * codegen keeps the projection inside whole-stage codegen.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    // literal-space split keeping trailing empties — the exact token list
    // of Spark `split(text, ' ')` and DuckDB `string_split(text, ' ')`
    val words = text.toString.split(" ", -1)
    val votes = new Array[Int](60)
    val md = digests.get()
    var wi = 0
    while (wi < words.length) {
      md.reset()
      val d = md.digest(words(wi).getBytes(StandardCharsets.UTF_8))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4 // first 15 hex digits = 60 bits, as conv(substring(hex,1,15),16,10)
      var b = 0
      while (b < 60) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      wi += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** Column-level entry point: `simhash60($"text")`. */
  def simhash60(text: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(text)))

  /** Register `simhash60` for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs(0)), "built-in")
}
