package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** One-pass text statistics: everything the quality/language-id operators
  * need, computed in a single compiled scan of the string instead of six
  * separate regex passes plus interpreted token-array folds.
  *
  * Field semantics match the column formulations exactly (same ASCII
  * punctuation classes, same normalize/tokenize, occurrence counts not
  * distinct), so derived ratios are bit-identical and the DuckDB oracles
  * hold unchanged.
  */
case class TextStats(child: Expression) extends UnaryExpression with CodegenFallback {

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

  override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var punct, letters, uppers = 0
    var i = 0
    val n = s.length
    val chars = s.codePointCount(0, n)
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
          (c >= '[' && c <= '`') || (c >= '{' && c <= '~')) punct += 1
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) letters += 1
      if (c >= 'A' && c <= 'Z') uppers += 1
      i += 1
    }
    var nTok, tokChars, en, fr, es, all = 0
    NativeText.tokenize(s).foreach { t =>
      nTok += 1
      tokChars += t.length
      val inEn = TextStats.En.contains(t)
      val inFr = TextStats.Fr.contains(t)
      val inEs = TextStats.Es.contains(t)
      if (inEn) en += 1
      if (inFr) fr += 1
      if (inEs) es += 1
      if (inEn || inFr || inEs) all += 1
    }
    InternalRow(chars, nTok, punct, letters, uppers, tokChars, en, fr, es, all)
  }

  override protected def withNewChildInternal(c: Expression): TextStats = copy(child = c)
}

object TextStats {
  private[functions] val En = TextFunctions.StopwordsEn.toSet
  private[functions] val Fr = TextFunctions.StopwordsFr.toSet
  private[functions] val Es = TextFunctions.StopwordsEs.toSet

  def textStats(c: Column): Column =
    GraftBridge.column(TextStats(GraftBridge.expression(c)))
}
