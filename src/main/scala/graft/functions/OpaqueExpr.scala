package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that the optimizer must treat as a wall.
  *
  * `Opaque(e)` evaluates exactly `e` (same value, same nullability, same
  * generated code), but reports `deterministic = false`, so Catalyst will
  * not move a predicate containing it across Projects/Unions/Generates
  * (PushPredicateThroughNonJoin requires a deterministic condition) and
  * will not substitute Project aliases into it.
  *
  * Why this exists (measured, round 11): predicate pushdown assumes a
  * filter is cheap and earlier-is-better. When the predicate references a
  * DERIVED column whose defining expression is a large transform cascade
  * (EP1's product_id = md5/concat over the F3-F6 brand/model cascades),
  * pushdown substitutes the cascade into the filter at every Project it
  * crosses: below the EP1 union the filter condition inflates to
  * 47K/113K/48K-char trees per source branch, the fused stage's generated
  * `processNext()` passes the JVM's 64 KB method limit, janino throws
  * ("Code grows beyond 64 KB"), and Spark silently de-optimizes the whole
  * merge stage to interpreted execution — plus the cascade would be
  * evaluated twice per row (filter arm + project arm). Fencing the ONE
  * cheap-on-materialized-attribute predicate keeps the filter where it is
  * written, the cascades evaluated once, and every stage inside
  * whole-stage codegen.
  *
  * Trade-off by design: a fenced predicate is excluded from parquet
  * pushdown, partition pruning, and join-constraint inference. Only wrap
  * predicates over expensive derived columns where pushdown is the
  * pessimization.
  */
case class Opaque(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the wall: never constant-folded, never pushed, never substituted
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}

object Opaque {
  /** Fence a column against optimizer movement/substitution. */
  def apply(c: Column): Column = GraftBridge.column(Opaque(GraftBridge.expression(c)))
}
