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

  def repetitionStats(c: Column): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(c)))
}

/** One-pass repetition signals (the Gopher repetition rules): token count,
  * duplicate-token count, the occurrence count of the most frequent word
  * bigram, and the bigram instance count — from ONE tokenizer pass and two
  * occurrence maps. The column formulation (split + transform/filter per
  * distinct bigram) re-inlines the split and the normalize regex into
  * every array lambda (the p1 brand-chain bug class, BENCH_NOTES) and was
  * measured at ~25 ms/document; this is the fix, not an optimization. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("dup_tok", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false)))

  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(input: Any): Any =
    NativeText.repetitionStatsRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeText.repetitionStatsRow($c);")

  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
}
