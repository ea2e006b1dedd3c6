package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership test against a BROADCAST sketch — the
  * probabilistic "seen before?" projection for incremental dedup at
  * corpus scales where the fingerprint set no longer fits a broadcast
  * hash join.
  *
  * Contract: NO false negatives (a fingerprint that was put in always
  * answers true), bounded false-positive rate (the builder's `fpp`), so
  * dedup stays conservative — a false positive drops a genuinely-new
  * document, never the reverse. The filter itself is Spark's public
  * `org.apache.spark.util.sketch.BloomFilter` (the same sketch
  * `DataFrameStatFunctions.bloomFilter` builds), shipped once per
  * executor as a broadcast variable — the [[CentroidTopK]] pattern: the
  * sketch bits never serialize into the plan, and generated code reaches
  * the object via `addReferenceObj`, staying inside whole-stage codegen.
  */
case class BloomMightContain(
    child: Expression,
    bc: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects string or integral, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    BloomMightContain.test(bc.value, v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc, classOf[Broadcast[_]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.BloomMightContain.test(
         |  (org.apache.spark.util.sketch.BloomFilter) $bcRef.value(), $v);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {

  /** Shared eval/codegen kernel (must stay public for generated code). */
  def test(bf: BloomFilter, v: Any): Boolean = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => bf.mightContainString(s.toString)
    case l: java.lang.Long => bf.mightContainLong(l)
    case i: java.lang.Integer => bf.mightContainLong(i.longValue())
    case other => bf.mightContain(other)
  }

  /** `bloom_might_contain(col)` against a filter built from `items`. */
  def might_contain(spark: org.apache.spark.sql.SparkSession,
                    bf: BloomFilter, c: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(c), spark.sparkContext.broadcast(bf)))
}
