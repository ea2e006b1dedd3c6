package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.{defaultCompressThreshold, Stats}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** MERGEABLE quantile sketches as first-class binary columns — the
  * percentile analogue of `hll_sketch_agg`/`hll_union_agg`: per-cell
  * Greenwald–Khanna summaries (Spark's own [[QuantileSummaries]], the
  * state behind `approx_percentile`) persist as bounded bytes, and any
  * coarser rollup — week from days, global from shards — is a cheap
  * merge over sketches instead of a re-shuffle of raw values. Spark
  * exposes the HLL state publicly but keeps the quantile state internal
  * to one aggregation; these three operators make it a storable,
  * re-aggregatable column:
  *
  *  - [[QuantileSketchAgg]]   `quantile_sketch_agg(value, ε)` → binary
  *  - [[QuantileSketchMergeAgg]] `quantile_sketch_merge(sk)`  → binary
  *  - [[QuantileSketchQuery]] `quantile_sketch_query(sk, p)`  → double
  *
  * GK guarantees rank error ≤ ε·n per sketch; merging widens the bound
  * (≤ 2ε worst-case per merge level), so consumers validate against a
  * rank ENVELOPE (exact values at p ± kε), not a value tolerance —
  * `events_quantile_weekly` asserts exactly that.
  */
object QuantileSketch {

  def serializeQs(qs: QuantileSummaries): Array[Byte] = {
    val c = qs.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(c.relativeError); out.writeLong(c.count)
    out.writeInt(c.sampled.length)
    c.sampled.foreach { s => out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta) }
    out.flush(); bos.toByteArray
  }

  def deserializeQs(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val re = in.readDouble(); val count = in.readLong(); val n = in.readInt()
    val sampled = Array.fill(n)(Stats(in.readDouble(), in.readLong(), in.readLong()))
    new QuantileSummaries(defaultCompressThreshold, re, sampled, count, true)
  }

  /** Codegen/eval kernel for the query expression (stays public). */
  def queryBytes(bytes: Array[Byte], p: Double): java.lang.Double =
    deserializeQs(bytes).query(p).map(java.lang.Double.valueOf).orNull

  def quantile_sketch_agg(value: Column, relativeError: Double = 0.01): Column =
    ColumnBridge.column(QuantileSketchAgg(
      ColumnBridge.expression(value), relativeError).toAggregateExpression())

  def quantile_sketch_merge(sketch: Column): Column =
    ColumnBridge.column(QuantileSketchMergeAgg(
      ColumnBridge.expression(sketch)).toAggregateExpression())

  def quantile_sketch_query(sketch: Column, p: Double): Column =
    ColumnBridge.column(QuantileSketchQuery(
      ColumnBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(p)))
}

/** Build a sketch from raw values (one pass, map-side partial merge). */
case class QuantileSketchAgg(
    child: Expression,
    relativeError: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  require(relativeError > 0 && relativeError < 1, "relativeError in (0, 1)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(defaultCompressThreshold, relativeError)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantile_sketch_agg expects a numeric column, got $t")
    }

  override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else v match {
      // Spark's internal DecimalType value is o.a.s.sql.types.Decimal,
      // NOT a java.lang.Number — a bare Number cast throws at runtime
      case d: Decimal => buf.insert(d.toDouble)
      case n: Number  => buf.insert(n.doubleValue())
    }
  }

  override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  override def eval(buf: QuantileSummaries): Any = QuantileSketch.serializeQs(buf)
  override def serialize(buf: QuantileSummaries): Array[Byte] = QuantileSketch.serializeQs(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries = QuantileSketch.deserializeQs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren(0))
}

/** Merge already-built sketch binaries (the rollup tier). */
case class QuantileSketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // ε is carried by the INPUT sketches; QuantileSummaries.merge keeps
  // the non-empty side, so the empty-buffer ε never wins
  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(defaultCompressThreshold, 0.01)

  override def update(buf: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else buf.compress().merge(QuantileSketch.deserializeQs(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  override def eval(buf: QuantileSummaries): Any = QuantileSketch.serializeQs(buf)
  override def serialize(buf: QuantileSummaries): Array[Byte] = QuantileSketch.serializeQs(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries = QuantileSketch.deserializeQs(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketchMergeAgg =
    copy(child = newChildren(0))
}

/** Extract a percentile from a sketch binary (post-agg scalar). */
case class QuantileSketchQuery(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantile_sketch_query expects (binary, double), got ($l, $r)")
    }

  override def nullSafeEval(b: Any, p: Any): Any =
    QuantileSketch.queryBytes(b.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p) => {
      val r = ctx.freshName("qsq")
      s"""java.lang.Double $r = graft.functions.QuantileSketch.queryBytes($b, $p);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchQuery =
    copy(left = newLeft, right = newRight)
}
