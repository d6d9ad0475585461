package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Decimal-exact sum of the `price` field over an offers array, as a
  * double — the compiled twin of
  * `aggregate(transform(offers, o => o.price.cast(decimal(18,2))),
  *            0.cast(decimal(28,2)), (acc,p) => (acc+p).cast(decimal(28,2)))
  *  .cast(double)`,
  * which is two nested higher-order functions (CodegenFallback) and kept
  * the a1b output projection interpreted (r11 catalog audit).
  *
  * Exact-parity contract with the column formulation (and the DuckDB
  * oracle built from the same arithmetic):
  *  - each price: double → decimal(18,2) via Spark's Cast semantics
  *    (HALF_UP on the shortest-representation BigDecimal; overflow → null)
  *  - running sum re-cast to decimal(28,2) each step (overflow → null)
  *  - a null element or null price poisons the whole sum to null, exactly
  *    like `acc + null`
  *  - null array → null; empty array → 0.00 → 0.0
  * Implemented WITH Spark's own Decimal so the rounding/overflow paths
  * are the Cast code paths, not a re-derivation. Asserted equal to the
  * column formulation in ProductMergeSpec and pinned by the a1b oracle.
  */
case class OfferPriceSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_offer_price_sum"

  @transient private lazy val elemStruct: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  @transient private lazy val priceOrdinal: Int = elemStruct.fieldIndex("price")
  @transient private lazy val numFields: Int = elemStruct.size

  def sum(arr: ArrayData): java.lang.Double = {
    var acc = Decimal(0L, 28, 2)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val row = arr.getStruct(i, numFields)
      if (row.isNullAt(priceOrdinal)) return null
      val p = Decimal(row.getDouble(priceOrdinal))
      if (!p.changePrecision(18, 2)) return null // Cast overflow → null
      val s = Decimal(acc.toJavaBigDecimal.add(p.toJavaBigDecimal))
      if (!s.changePrecision(28, 2)) return null
      acc = s
      i += 1
    }
    acc.toDouble
  }

  override def nullSafeEval(input: Any): Any = {
    val r = sum(input.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("offerPriceSum", this, classOf[OfferPriceSum].getName)
    val tmp = ctx.freshName("priceSum")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Double $tmp = $ref.sum($c);
         |${ev.isNull} = ($tmp == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): OfferPriceSum =
    copy(child = c)
}

object OfferPriceSum {
  def apply(c: Column): Column =
    GraftBridge.column(OfferPriceSum(GraftBridge.expression(c)))
}
