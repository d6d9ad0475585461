package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics: everything the quality/language-id operators
  * need, computed in a single compiled scan of the string instead of six
  * separate regex passes plus interpreted token-array folds. Generates
  * code (a call to the static [[NativeText.textStatsRow]]) so it composes
  * with whole-stage codegen instead of forcing a fallback row.
  *
  * Field semantics match the column formulations exactly (same ASCII
  * punctuation classes, same normalize/tokenize, occurrence counts not
  * distinct), so derived ratios are bit-identical and the DuckDB oracles
  * hold unchanged.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("chars", IntegerType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("letters", IntegerType, nullable = false),
    StructField("uppers", IntegerType, nullable = false),
    StructField("tok_chars", IntegerType, nullable = false),
    StructField("stop_en", IntegerType, nullable = false),
    StructField("stop_fr", IntegerType, nullable = false),
    StructField("stop_es", IntegerType, nullable = false),
    StructField("stop_all", IntegerType, nullable = false)))

  override def prettyName: String = "graft_text_stats"

  override def nullSafeEval(input: Any): Any =
    NativeText.textStatsRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeText.textStatsRow($c);")

  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
}

object TextStats {
  private[functions] val En = TextFunctions.StopwordsEn.toSet
  private[functions] val Fr = TextFunctions.StopwordsFr.toSet
  private[functions] val Es = TextFunctions.StopwordsEs.toSet

  def textStats(c: Column): Column =
    GraftBridge.column(TextStats(GraftBridge.expression(c)))
}
