package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long column against a pre-built Bloom filter,
  * as a codegen'd Catalyst predicate.
  *
  * This is the map-side half of a semi-join reduction: build the filter
  * over the SMALL side's join keys (bounded — e.g. an eval set's gram
  * vocabulary, never the corpus), ship it to executors as a reference
  * object inside the generated stage, and drop non-candidate rows of the
  * big side before they reach the shuffle. False positives only let a few
  * extra rows through to the real join (which discards them); false
  * negatives are impossible, so any exact downstream join keeps its exact
  * result. The same pattern Spark's runtime bloom-filter join injects for
  * shuffle joins, available here as an explicit building block.
  *
  * The filter rides along via Java serialization of the expression
  * (BloomFilterImpl is Serializable); at the default 1% fpp it costs
  * ~1.2 bytes per key, so a 10M-gram eval set is a ~12 MB task payload —
  * broadcast-sized, by construction of the small side.
  */
case class LongBloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LongBloomMightContain =
    copy(child = newChild)
}

object BloomFilterColumns {
  def mightContainLong(c: Column, bloom: BloomFilter): Column =
    GraftBridge.column(LongBloomMightContain(GraftBridge.expression(c), bloom))
}
