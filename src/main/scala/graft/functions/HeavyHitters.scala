package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MERGEABLE frequency sketches — Misra–Gries summaries (Misra & Gries
  * 1982, "Finding repeated elements") as first-class binary columns,
  * completing the re-aggregatable sketch family next to HLL (distinct),
  * GK (quantiles — [[QuantileSketch]]) and Bloom (membership): k counters
  * answer "which items exceed an n/(k+1) share of the stream" without
  * ever shuffling raw frequencies. The merge is Agarwal et al.'s
  * (PODS'12, "Mergeable summaries") counter-sum + (k+1)-th-largest
  * subtraction, which PRESERVES the deterministic envelope
  *
  *   estimate(x) ≤ true_count(x) ≤ estimate(x) + error()
  *
  * for every item x in ANY partition/merge order — the property the
  * `vocab_heavy_hitters` envelope query asserts per row. At 100 TB this
  * is the per-shard vocabulary rollup a corpus store keeps: bounded
  * bytes per shard, coarser rollups are sketch merges, never re-scans.
  *
  *  - [[MisraGriesAgg]]      `mg_sketch_agg(item, k)`  → binary
  *  - [[MisraGriesMergeAgg]] `mg_sketch_merge(sk)`     → binary
  *  - [[MgEstimate]]         `mg_estimate(sk, item)`   → long (0 if absent)
  *  - [[MgError]]            `mg_error(sk)`            → long
  */
object HeavyHitters {

  /** k counters + the accumulated undercount bound. */
  final class MGState(val k: Int, var err: Long,
      val counts: mutable.HashMap[String, Long]) {

    def add(item: String): Unit = counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item, 1L)
      case None =>
        // the textbook decrement-all round: every stored counter and the
        // new item each give up one occurrence; undercount grows by 1
        err += 1
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (w, c) =>
          if (c == 1L) dead += w else counts.update(w, c - 1)
        }
        dead.foreach(counts.remove)
    }

    def mergeIn(other: MGState): MGState = {
      other.counts.foreach { case (w, c) =>
        counts.update(w, counts.getOrElse(w, 0L) + c)
      }
      err += other.err
      if (counts.size > k) {
        // subtract the (k+1)-th largest counter from all, drop <= 0 —
        // the merge that keeps the envelope (Agarwal et al. PODS'12)
        val m = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        err += m
        val dead = mutable.ArrayBuffer.empty[String]
        counts.foreach { case (w, c) =>
          if (c <= m) dead += w else counts.update(w, c - m)
        }
        dead.foreach(counts.remove)
      }
      this
    }
  }

  def serializeMg(st: MGState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(st.k); out.writeLong(st.err); out.writeInt(st.counts.size)
    st.counts.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  def deserializeMg(bytes: Array[Byte]): MGState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val k = in.readInt(); val err = in.readLong(); val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { m.update(in.readUTF(), in.readLong()); i += 1 }
    new MGState(k, err, m)
  }

  /** Codegen/eval kernels (stay public for generated code). */
  def estimateBytes(bytes: Array[Byte], item: UTF8String): Long =
    deserializeMg(bytes).counts.getOrElse(item.toString, 0L)
  def errorBytes(bytes: Array[Byte]): Long = deserializeMg(bytes).err

  def mg_sketch_agg(item: Column, k: Int): Column =
    ColumnBridge.column(MisraGriesAgg(
      ColumnBridge.expression(item), k).toAggregateExpression())

  def mg_sketch_merge(sketch: Column): Column =
    ColumnBridge.column(MisraGriesMergeAgg(
      ColumnBridge.expression(sketch)).toAggregateExpression())

  def mg_estimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(MgEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))

  def mg_error(sketch: Column): Column =
    ColumnBridge.column(MgError(ColumnBridge.expression(sketch)))
}

/** Build a sketch from raw items (one pass, map-side partial merge). */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.MGState] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mg_sketch_agg expects a string column, got $t")
  }

  override def createAggregationBuffer(): HeavyHitters.MGState =
    new HeavyHitters.MGState(k, 0L, mutable.HashMap.empty)

  override def update(buf: HeavyHitters.MGState, input: InternalRow): HeavyHitters.MGState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: HeavyHitters.MGState, b: HeavyHitters.MGState): HeavyHitters.MGState =
    a.mergeIn(b)

  override def eval(buf: HeavyHitters.MGState): Any = HeavyHitters.serializeMg(buf)
  override def serialize(buf: HeavyHitters.MGState): Array[Byte] = HeavyHitters.serializeMg(buf)
  override def deserialize(bytes: Array[Byte]): HeavyHitters.MGState = HeavyHitters.deserializeMg(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
}

/** Merge already-built sketch binaries (the rollup tier). */
case class MisraGriesMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.MGState] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mg_sketch_merge expects a binary sketch column, got $t")
  }

  // k is carried by the INPUT sketches; mergeIn keeps this buffer's k
  // only until the first real sketch arrives (empty ∪ x == x, and an
  // empty buffer's k can't shrink anything since size 0 ≤ any k)
  override def createAggregationBuffer(): HeavyHitters.MGState =
    new HeavyHitters.MGState(Int.MaxValue, 0L, mutable.HashMap.empty)

  override def update(buf: HeavyHitters.MGState, input: InternalRow): HeavyHitters.MGState = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val in = HeavyHitters.deserializeMg(v.asInstanceOf[Array[Byte]])
      if (buf.counts.isEmpty && buf.err == 0L) in.mergeIn(buf) else buf.mergeIn(in)
    }
  }

  override def merge(a: HeavyHitters.MGState, b: HeavyHitters.MGState): HeavyHitters.MGState =
    if (a.counts.isEmpty && a.err == 0L) b.mergeIn(a) else a.mergeIn(b)

  override def eval(buf: HeavyHitters.MGState): Any = HeavyHitters.serializeMg(buf)
  override def serialize(buf: HeavyHitters.MGState): Array[Byte] = HeavyHitters.serializeMg(buf)
  override def deserialize(bytes: Array[Byte]): HeavyHitters.MGState = HeavyHitters.deserializeMg(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesMergeAgg =
    copy(child = newChildren(0))
}

/** Stored-counter lookup: the guaranteed UNDER-estimate (0 if absent). */
case class MgEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"mg_estimate expects (binary, string), got ($l, $r)")
    }

  override def nullSafeEval(b: Any, item: Any): Any =
    HeavyHitters.estimateBytes(b.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, item) =>
      s"${ev.value} = graft.functions.HeavyHitters.estimateBytes($b, $item);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MgEstimate =
    copy(left = newLeft, right = newRight)
}

/** The sketch's accumulated undercount bound. */
case class MgError(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"mg_error expects a binary sketch column, got $t")
  }

  override def nullSafeEval(b: Any): Any =
    HeavyHitters.errorBytes(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.HeavyHitters.errorBytes($b)")

  override protected def withNewChildInternal(newChild: Expression): MgError =
    copy(child = newChild)
}
