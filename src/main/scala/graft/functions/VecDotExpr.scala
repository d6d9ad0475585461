package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Sequential dot product of two numeric arrays (float or double) as one
  * compiled loop. The column formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a correct sequential
  * fold but higher-order functions never enter codegen — every element
  * walks an interpreted lambda tree, which dominates the pairwise
  * similarity operators (|pairs|·dim applications). Accumulation order is
  * the same left-to-right fold, so results are bit-identical to the
  * column version and to the oracles' list_reduce (floats are widened to
  * double exactly). Arrays are assumed non-null-elemented and
  * equal-length (embedding columns); the shorter length bounds the loop.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecDot", this, classOf[VecDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.dot($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

object VecDot {
  def column(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
