package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass "last matching spec entry" pick over the Jumia specs dict
  * (jumia_extractor.py:60-88 / dag:441-456: an if/elif chain iterated
  * over the dict, so each entry hits at most one slot — ram, then
  * storage, then screen — and the LAST matching entry wins per slot).
  *
  * Why an expression and not filter()+try_element_at(-1): filter() is a
  * higher-order function, which is CodegenFallback — ONE of them in a
  * projection kicks the entire final Jumia output-assembly Project out of
  * whole-stage codegen into interpreted eval (measured: extract_Jumia's
  * top Project lost its codegen star while Avito/Electroplanet kept
  * theirs), and the column formulation needs 12 ArrayFilter instances
  * (3 slots × referenced twice × matched/value arms) each allocating a
  * lambda row per entry. This walks the entries ONCE per row inside
  * codegen.
  *
  * Output is a flat struct: (ram_matched, ram_value, sto_matched,
  * sto_value, scr_matched, scr_value) — `*_matched` distinguishes "no
  * entry matched" from "matched entry with null/empty value", which the
  * DAG path renders as the reference's str(None)='None'. Semantics are
  * bit-identical to the filter()/try_element_at formulation (asserted by
  * the EP1 fixtures, the 2,029-record jumia golden replay, and the p1
  * oracle rows, all unchanged).
  *
  * Plugin mode (dagMode=false, jumia_extractor.py:60-88):
  *   val(e)  = entry value, null→""
  *   ram: lower(key) contains "ram" AND val != ""
  *   sto: lower(key) contains "stockage" OR (contains "storage" AND val != "")
  *   scr: lower(key) contains "écran"    OR (contains "screen"  AND val != "")
  * DAG mode (dagMode=true, dag:441-456):
  *   truthy(e) = value IS NOT NULL AND value != ""
  *   ram: contains "ram" AND truthy;  sto: contains "stockage" OR
  *   (contains "storage" AND truthy);  scr slot never matches.
  */
case class JumiaSpecPick(child: Expression, dagMode: Boolean) extends UnaryExpression {
  override def dataType: DataType = JumiaSpecPick.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_spec_pick"

  @transient private lazy val RAM = UTF8String.fromString("ram")
  @transient private lazy val STO = UTF8String.fromString("stockage")
  @transient private lazy val STO2 = UTF8String.fromString("storage")
  @transient private lazy val SCR = UTF8String.fromString("écran")
  @transient private lazy val SCR2 = UTF8String.fromString("screen")
  @transient private lazy val EMPTY = UTF8String.fromString("")

  def pick(m: MapData): InternalRow = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    var ramM = false; var ramV: UTF8String = null
    var stoM = false; var stoV: UTF8String = null
    var scrM = false; var scrV: UTF8String = null
    var i = 0
    val n = m.numElements()
    while (i < n) {
      val k = keys.getUTF8String(i).toLowerCase
      val v = if (vals.isNullAt(i)) null else vals.getUTF8String(i)
      // plugin: null value reads as ""; dag: truthy needs non-null AND != ""
      val nonEmpty = v != null && !v.equals(EMPTY)
      val ram = k.contains(RAM) && nonEmpty
      val sto = k.contains(STO) || (k.contains(STO2) && nonEmpty)
      val scr = !dagMode && (k.contains(SCR) || (k.contains(SCR2) && nonEmpty))
      if (ram) { ramM = true; ramV = v }
      else if (sto) { stoM = true; stoV = v }
      else if (scr) { scrM = true; scrV = v }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ramM, ramV, stoM, stoV, scrM, scrV))
  }

  override def nullSafeEval(input: Any): Any = pick(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("specPick", this, classOf[JumiaSpecPick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.pick($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): JumiaSpecPick =
    copy(child = newChild)
}

object JumiaSpecPick {
  val schema: StructType = StructType(Seq(
    StructField("ram_matched", BooleanType, nullable = false),
    StructField("ram_value", StringType),
    StructField("sto_matched", BooleanType, nullable = false),
    StructField("sto_value", StringType),
    StructField("scr_matched", BooleanType, nullable = false),
    StructField("scr_value", StringType)))

  def apply(specs: Column, dagMode: Boolean): Column =
    GraftBridge.column(JumiaSpecPick(GraftBridge.expression(specs), dagMode))
}
