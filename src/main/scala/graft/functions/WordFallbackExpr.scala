package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Avito model-extraction word fallback
  * (avito_extractor.py:181-183):
  * `' '.join(w for w in title.split()[:3] if len(w) > 2 and not
  * w.isdigit())`, null when nothing survives.
  *
  * Replaces `filter(split(trim(t0),"\\s+"), _ =!= "")` + a second
  * `filter(len>2 && !rlike ^[0-9]+$)` + array_join: filter() is a
  * higher-order function (CodegenFallback), and its presence dropped the
  * Avito model Project out of whole-stage codegen. Same semantics as the
  * column formulation it replaces (the digit test is the ASCII
  * `^[0-9]+$` — the cascade upstream has already uppercased an
  * ASCII-normalized title): split on whitespace runs, take the first 3
  * non-empty words, keep length > 2 with at least one non-digit char,
  * join with ' '. Pinned by the Avito real-record golden replay and the
  * f5 oracle row.
  */
case class ModelWordFallback(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_model_word_fallback"

  // exactly Java regex \s (the class split("\\s+") used) — NOT
  // Character.isWhitespace, which adds unicode spaces \s doesn't match
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def fallback(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(24)
    var kept = 0
    var seen = 0
    var i = 0
    val n = str.length
    while (i < n && seen < 3) {
      while (i < n && isWs(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        seen += 1
        // codepoint count, like Spark's length() (surrogate pair = 1)
        val len = str.codePointCount(start, i)
        if (len > 2) {
          var digitsOnly = true
          var j = start
          while (j < i && digitsOnly) {
            val c = str.charAt(j)
            if (c < '0' || c > '9') digitsOnly = false
            j += 1
          }
          if (!digitsOnly) {
            if (kept > 0) sb.append(' ')
            sb.append(str, start, i)
            kept += 1
          }
        }
      }
    }
    if (kept == 0) null else UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    fallback(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordFallback", this,
      classOf[ModelWordFallback].getName)
    // null on "nothing survives" even for non-null input — re-derive
    // isNull from the returned value
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $ref.fallback($c);
         |${ev.isNull} = (${ev.value} == null);""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): ModelWordFallback =
    copy(child = newChild)
}

object ModelWordFallback {
  def apply(c: Column): Column =
    GraftBridge.column(ModelWordFallback(GraftBridge.expression(c)))
}
