package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Mutable single-winner state ([[MinByOrd]]); `row` is null until the
  * first non-null-ord input. */
final class MinByOrdState(var row: UnsafeRow)

/** Hash-friendly min-by / max-by over an arbitrary orderable key.
  *
  * Spark's built-in `min_by`/`min(struct(...))` are declarative
  * aggregates whose buffers hold the struct/string itself; those are not
  * UnsafeRow-mutable, so HashAggregate refuses them and the whole
  * aggregation silently degrades to SortAggregate — a full sort of every
  * input row by the grouping key. On a 100 TB merge/dedup keyed by
  * high-cardinality ids that sort dominates the stage.
  *
  * This TypedImperativeAggregate keeps exactly one row of object state
  * (the current winner), so it executes as ObjectHashAggregate: hash
  * grouping with map-side partial aggregation, state O(1) per group, and
  * winners — not raw rows — in the shuffle. The ordering key is evaluated
  * per input row, but the (potentially wide) payload is materialized ONLY
  * when it wins — at scrape-grade duplication that is orders of magnitude
  * rarer than a row. Null ord never wins; ties keep the first-seen
  * winner, matching `min_by`.
  *
  * `eval` returns struct(ord, p) — callers project `.getField("p")`.
  */
case class MinByOrd(ord: Expression, payload: Expression, reverse: Boolean,
    override val mutableAggBufferOffset: Int,
    override val inputAggBufferOffset: Int)
  extends TypedImperativeAggregate[MinByOrdState] with BinaryLike[Expression] {

  override def left: Expression = ord
  override def right: Expression = payload

  private lazy val structType = StructType(Seq(
    StructField("ord", ord.dataType, nullable = true),
    StructField("p", payload.dataType, nullable = true)))
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType).asInstanceOf[Ordering[Any]]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def dataType: DataType = structType
  override def nullable: Boolean = true
  override def prettyName: String = if (reverse) "graft_max_by_ord" else "graft_min_by_ord"

  override def createAggregationBuffer(): MinByOrdState = new MinByOrdState(null)

  private def ordOf(r: InternalRow): Any = r.get(0, ord.dataType)

  private def better(a: Any, b: Any): Boolean = {
    val c = ordering.compare(a, b)
    if (reverse) c > 0 else c < 0
  }

  override def update(buffer: MinByOrdState, input: InternalRow): MinByOrdState = {
    val o = ord.eval(input)
    if (o != null && (buffer.row == null || better(o, ordOf(buffer.row)))) {
      val combined = new GenericInternalRow(Array[Any](o, payload.eval(input)))
      buffer.row = toUnsafe(combined).copy()
    }
    buffer
  }

  override def merge(b1: MinByOrdState, b2: MinByOrdState): MinByOrdState = {
    if (b2.row != null && (b1.row == null || better(ordOf(b2.row), ordOf(b1.row))))
      b1.row = b2.row
    b1
  }

  override def eval(buffer: MinByOrdState): Any = buffer.row

  override def serialize(buffer: MinByOrdState): Array[Byte] =
    if (buffer.row == null) Array.emptyByteArray else buffer.row.getBytes

  override def deserialize(bytes: Array[Byte]): MinByOrdState =
    if (bytes.isEmpty) new MinByOrdState(null)
    else {
      val row = new UnsafeRow(structType.length)
      row.pointTo(bytes, bytes.length)
      new MinByOrdState(row)
    }

  override def withNewMutableAggBufferOffset(n: Int): MinByOrd =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinByOrd =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinByOrd =
    copy(ord = l, payload = r)
}

object MinByOrd {
  /** struct(ord, p) of the row minimizing `ord`; project `.getField("p")`. */
  def minBy(ord: Column, payload: Column): Column = agg(ord, payload, reverse = false)

  /** struct(ord, p) of the row maximizing `ord`. */
  def maxBy(ord: Column, payload: Column): Column = agg(ord, payload, reverse = true)

  private def agg(ord: Column, payload: Column, reverse: Boolean): Column =
    GraftBridge.column(
      MinByOrd(GraftBridge.expression(ord), GraftBridge.expression(payload),
        reverse, 0, 0).toAggregateExpression())
}
