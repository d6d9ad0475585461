package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered substring→canonical map lookup (the brand-normalization core):
  * first key (in insertion order) contained in lowercase(input) wins;
  * otherwise Title Case of the lowercased input (initcap semantics) or
  * null, per `titleCaseFallback`.
  *
  * Why an expression and not a WHEN-chain: the column formulation is a
  * 22-deep nested CASE whose `contains` each re-evaluate the lower/trim
  * subtree, and the Avito transform needs THREE such chains (field, title,
  * model stages) feeding model/product-id trees — the collapsed Project's
  * generated code grew past janino's limits, silently dropping the whole
  * scan stage out of codegen into interpreted eval. This compiles to one
  * reference-object call (doGenCode), keeps the stage inside whole-stage
  * codegen, and walks the key list once per row.
  *
  * Semantics are bit-identical to the WHEN-chain (same insertion order,
  * same `contains`, same initcap fallback — asserted in
  * ScalarFunctionsSpec), so the DuckDB oracles, which still generate
  * WHEN-chains from the same ListMap, are unchanged.
  */
case class BrandMapLookup(child: Expression, keys: Seq[String], values: Seq[String],
                          titleCaseFallback: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_brand_lookup"

  @transient private lazy val keyU: Array[UTF8String] =
    keys.map(UTF8String.fromString).toArray
  @transient private lazy val valU: Array[UTF8String] =
    values.map(UTF8String.fromString).toArray

  def lookup(s: UTF8String): UTF8String = {
    val lc = s.toLowerCase
    var i = 0
    while (i < keyU.length) {
      if (lc.contains(keyU(i))) return valU(i)
      i += 1
    }
    if (!titleCaseFallback) return null
    // Python str.title() of the input (all reference fallbacks are
    // `brand_str.title()`): a letter is title-cased when the PREVIOUS
    // char is not a cased letter — so '.', digits and '8' restart a word
    // ('my.jumia.ma' → 'My.Jumia.Ma', 'l8star' → 'L8Star'), unlike
    // initcap's space-only word starts. Input is already lowercased, so
    // non-word-start chars pass through. Caught by the 2,029-record
    // jumia golden replay; the oracle fixtures feed only single-word
    // fallback brands where both renderings agree.
    val str = lc.toString
    val sb = new java.lang.StringBuilder(str.length)
    var prevCased = false
    var j = 0
    while (j < str.length) {
      val ch = str.charAt(j)
      sb.append(if (prevCased) ch else Character.toTitleCase(ch))
      prevCased = Character.isUpperCase(ch) || Character.isLowerCase(ch) ||
        Character.isTitleCase(ch)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any = lookup(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("brandLookup", this,
      classOf[BrandMapLookup].getName)
    // lookup() returns null on a miss with titleCaseFallback=false even
    // for a non-null input — re-derive isNull from the value, don't let
    // nullSafeCodeGen's child-only null propagation stand
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $ref.lookup($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): BrandMapLookup =
    copy(child = c)
}

object BrandMapLookup {
  def column(c: Column, map: scala.collection.immutable.ListMap[String, String],
             titleCaseFallback: Boolean): Column =
    GraftBridge.column(BrandMapLookup(GraftBridge.expression(c),
      map.keys.toSeq, map.values.toSeq, titleCaseFallback))
}
