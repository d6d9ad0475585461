package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Compact gram → eval-document inverted index, shipped to every task as
  * a reference object (same transport as [[LongBloomMightContain]]'s
  * filter: Java serialization of the expression — broadcast-sized BY
  * CONSTRUCTION, the caller gates on index size).
  *
  * Layout: `gramKeys` sorted for binary search; `lists` holds each
  * gram's eval-SLOT postings concatenated, `offsets(i)..offsets(i+1)`
  * delimiting gram i's slice; slots are assigned in ascending eval-id
  * order so the smallest slot IS the smallest eval id (the tie rule
  * below needs no second comparison). All primitive arrays — a 500k-pair
  * index is ~8 MB on the wire.
  *
  * Counting scratch (`counts`, one int per eval doc, plus the touched
  * list that resets only what a row dirtied) is per-THREAD and
  * transient: rebuilt lazily after deserialization, reused across every
  * row a task evaluates. */
final class OverlapEvalIndex(
    val gramKeys: Array[Long], val offsets: Array[Int], val lists: Array[Int],
    val evalIds: Array[Long]) extends Serializable {

  @transient private lazy val scratch =
    new ThreadLocal[(Array[Int], Array[Int])] {
      override def initialValue(): (Array[Int], Array[Int]) =
        (new Array[Int](evalIds.length), new Array[Int](evalIds.length))
    }

  /** Best-overlap eval doc for one corpus doc's sorted gram-hash set:
    * maximizes round₄(inter/n) (HALF_UP, exact long arithmetic — the
    * same value the join formulation sorts on), ties to the smallest
    * eval id; null when no gram matches. Returns (eval_id, inter). */
  def best(grams: ArrayData): InternalRow = {
    val n = grams.numElements()
    if (n == 0) return null
    val (counts, touched) = scratch.get()
    var nTouched = 0
    var i = 0
    while (i < n) {
      val k = java.util.Arrays.binarySearch(gramKeys, grams.getLong(i))
      if (k >= 0) {
        var j = offsets(k)
        val end = offsets(k + 1)
        while (j < end) {
          val slot = lists(j)
          if (counts(slot) == 0) { touched(nTouched) = slot; nTouched += 1 }
          counts(slot) += 1
          j += 1
        }
      }
      i += 1
    }
    if (nTouched == 0) return null
    // round-half-up of (inter/n) at scale 4 as a long in [0, 10000]:
    // floor((2·inter·10⁴ + n) / (2n)) — exact, no doubles in the argmax
    var bestSlot = -1
    var bestInter = 0L
    var bestR = -1L
    var t = 0
    while (t < nTouched) {
      val slot = touched(t)
      val inter = counts(slot).toLong
      counts(slot) = 0 // reset as we go — scratch clean for the next row
      val r = (2L * inter * 10000L + n) / (2L * n)
      if (r > bestR || (r == bestR && slot < bestSlot)) {
        bestR = r; bestSlot = slot; bestInter = inter
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](evalIds(bestSlot), bestInter))
  }
}

/** Per corpus document, the argmax-overlap probe of its gram-hash set
  * against a broadcast [[OverlapEvalIndex]] — the zero-shuffle plan of
  * [[graft.operators.Decontaminate]]: one codegen'd narrow stage over
  * the corpus, no (doc, eval) pair row ever materialized. Returns
  * struct(eval_id, inter) or null when no gram matches. */
case class TopEvalOverlap(child: Expression, index: OverlapEvalIndex)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("eval_id", LongType, nullable = false),
    StructField("inter", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_eval_overlap"

  override def nullSafeEval(input: Any): Any =
    index.best(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("overlapIndex", index,
      classOf[OverlapEvalIndex].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.best($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): TopEvalOverlap =
    copy(child = newChild)
}

object OverlapIndexColumns {
  def topEvalOverlap(grams: Column, index: OverlapEvalIndex): Column =
    GraftBridge.column(TopEvalOverlap(GraftBridge.expression(grams), index))
}
