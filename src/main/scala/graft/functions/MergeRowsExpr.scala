package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-product merge fold of [[graft.operators.ProductMerge]] as ONE
  * compiled pass over the collected row array.
  *
  * The column formulation (array_sort with a lambda comparator + five
  * higher-order transform/aggregate chains over the same array) is
  * semantically right but every lambda application walks an expression
  * tree per element and the per-key spec fold allocates a map per offer —
  * at offers-per-product fan-in this dominated the merge stage. This
  * expression sorts once (binary UTF8String order == Spark string order)
  * and computes every output field in a single traversal.
  *
  * Semantics (identical to the column version, asserted in
  * ProductMergeSpec and the a1b_merge_documents oracle):
  *   - rows ordered by the `ord` struct (source rank, scraped_at, url);
  *   - brand/model/category from the first row;
  *   - product_name: longest name, first-seen on ties (null names lose);
  *   - specifications: first-non-null-wins per key in encounter order;
  *   - offers: all offers in encounter order;
  *   - sources: flattened, deduped, first-encounter order;
  *   - created_at min / last_updated max (binary string order).
  *
  * Expected child shape: array<struct<ord:struct<rank:int,t:string,
  * u:string>, brand, model, name, category, specs:map<string,string>,
  * sources:array<string>, created_at, last_updated, offer:struct<…>>>
  * (field positions fixed by ProductMerge.merge).
  */
case class MergeProductRows(child: Expression, dedupPerProduct: Boolean)
    extends UnaryExpression {

  private def rowType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private def offerType: DataType = rowType(OfferIdx).dataType

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType),
    StructField("model", StringType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("specifications", MapType(StringType, StringType)),
    StructField("offers", ArrayType(offerType)),
    StructField("sources", ArrayType(StringType, containsNull = true)),
    StructField("created_at", StringType),
    StructField("last_updated", StringType)))

  override def prettyName: String = "graft_merge_product_rows"

  private val OrdIdx = 0
  private val BrandIdx = 1
  private val ModelIdx = 2
  private val NameIdx = 3
  private val CategoryIdx = 4
  private val SpecsIdx = 5
  private val SourcesIdx = 6
  private val CreatedIdx = 7
  private val UpdatedIdx = 8
  private val OfferIdx = 9

  def merge(arr: ArrayData): InternalRow = {
    val nFields = rowType.length
    val n = arr.numElements()
    val rows = new Array[InternalRow](n)
    var i = 0
    while (i < n) { rows(i) = arr.getStruct(i, nFields); i += 1 }
    java.util.Arrays.sort(rows, new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        val oa = a.getStruct(OrdIdx, 3)
        val ob = b.getStruct(OrdIdx, 3)
        val c1 = java.lang.Integer.compare(oa.getInt(0), ob.getInt(0))
        if (c1 != 0) return c1
        val c2 = oa.getUTF8String(1).compareTo(ob.getUTF8String(1))
        if (c2 != 0) return c2
        oa.getUTF8String(2).compareTo(ob.getUTF8String(2))
      }
    })

    def str(r: InternalRow, idx: Int): UTF8String =
      if (r.isNullAt(idx)) null else r.getUTF8String(idx)

    // per-product (source,url) dedup folded into the same pass (A2b): the
    // key is LOCAL to the product group, so running it here instead of a
    // pre-aggregation window removes one full shuffle+sort of the wide
    // rows from the merge plan — first-seen-wins order is identical
    // because rows are already in ord order
    val offerT = offerType.asInstanceOf[StructType]
    val srcFieldIdx = offerT.fieldIndex("source")
    val urlFieldIdx = offerT.fieldIndex("url")
    val seen = new java.util.HashSet[(UTF8String, UTF8String)]()

    val first = rows(0)
    var bestName: UTF8String = null
    var bestLen = -1
    val specKeys = new java.util.LinkedHashMap[UTF8String, UTF8String]()
    val sources = new java.util.LinkedHashSet[UTF8String]()
    val offers = new scala.collection.mutable.ArrayBuffer[Any](n)
    var created: UTF8String = null
    var updated: UTF8String = null
    i = 0
    var skip = false
    while (i < n) {
      val r = rows(i)
      skip = false
      if (dedupPerProduct) {
        // a null offer keys as (null,null) — identical to the window
        // formulation this fold replaced (partitionBy offer.source,
        // offer.url groups null offers together and keeps the first)
        val key = if (r.isNullAt(OfferIdx)) (null, null) else {
          val o = r.getStruct(OfferIdx, offerT.length)
          (if (o.isNullAt(srcFieldIdx)) null else o.getUTF8String(srcFieldIdx),
            if (o.isNullAt(urlFieldIdx)) null else o.getUTF8String(urlFieldIdx))
        }
        skip = !seen.add(key)
      }
      if (skip) { i += 1 }
      else {
      val name = str(r, NameIdx)
      val len = if (name == null) -1 else name.numChars()
      if (len > bestLen) { bestLen = len; bestName = name }
      if (!r.isNullAt(SpecsIdx)) {
        val m: MapData = r.getMap(SpecsIdx)
        val ks = m.keyArray(); val vs = m.valueArray()
        var j = 0
        while (j < m.numElements()) {
          val k = ks.getUTF8String(j)
          if (!specKeys.containsKey(k))
            specKeys.put(k, if (vs.isNullAt(j)) null else vs.getUTF8String(j))
          j += 1
        }
      }
      if (!r.isNullAt(SourcesIdx)) {
        val sa = r.getArray(SourcesIdx)
        var j = 0
        while (j < sa.numElements()) {
          sources.add(if (sa.isNullAt(j)) null else sa.getUTF8String(j))
          j += 1
        }
      }
      val c = str(r, CreatedIdx)
      if (c != null && (created == null || c.compareTo(created) < 0)) created = c
      val u = str(r, UpdatedIdx)
      if (u != null && (updated == null || u.compareTo(updated) > 0)) updated = u
      offers += (if (r.isNullAt(OfferIdx)) null else r.getStruct(OfferIdx, offerT.length))
      i += 1
      }
    }
    val keyArr = new Array[Any](specKeys.size())
    val valArr = new Array[Any](specKeys.size())
    var k = 0
    val it = specKeys.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); keyArr(k) = e.getKey; valArr(k) = e.getValue; k += 1 }
    val srcArr = new Array[Any](sources.size())
    var s = 0
    val sit = sources.iterator()
    while (sit.hasNext) { srcArr(s) = sit.next(); s += 1 }

    InternalRow(
      str(first, BrandIdx), str(first, ModelIdx), bestName, str(first, CategoryIdx),
      new ArrayBasedMapData(new GenericArrayData(keyArr), new GenericArrayData(valArr)),
      new GenericArrayData(offers.toArray), new GenericArrayData(srcArr), created, updated)
  }

  override def nullSafeEval(input: Any): Any = merge(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mergeRows", this, classOf[MergeProductRows].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.merge($c);")
  }

  override protected def withNewChildInternal(c: Expression): MergeProductRows =
    copy(child = c)
}

object MergeProductRows {
  def column(c: Column, dedupPerProduct: Boolean): Column =
    GraftBridge.column(MergeProductRows(GraftBridge.expression(c), dedupPerProduct))
}
