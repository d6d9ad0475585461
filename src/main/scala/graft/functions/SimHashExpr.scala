package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Native 64-bit SimHash of a text column as a single Catalyst expression
  * with code generation.
  *
  * The column-expression formulation ([[graft.operators.Dedup.simhash64]])
  * composes 64 interpreted higher-order `aggregate` calls — correct, but it
  * re-walks the token array 64 times outside whole-stage codegen. This
  * expression does one tokenizer pass and one 64-counter accumulation per
  * row (~64× less work), and `doGenCode` keeps the call inside the
  * generated stage, so the surrounding projection stays codegen'd.
  *
  * Semantics: whitespace-tokenize the lowercased alphanumeric-normalized
  * text (exactly [[TextFunctions.normalizeText]]), take distinct tokens,
  * hash each with xxhash64 (Spark's seed 42), and set result bit i to the
  * sign of Σ(2·bit_i(h) − 1) — identical to `Dedup.simhash64`.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val Seed = 42L

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val s = text.toString.toLowerCase
    val counters = new Array[Int](64)
    val seen = mutable.HashSet.empty[String]
    val token = new java.lang.StringBuilder(16)
    var i = 0
    val n = s.length
    while (i <= n) {
      val alnum = i < n && {
        val ch = s.charAt(i)
        (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')
      }
      if (alnum) token.append(s.charAt(i))
      else if (token.length > 0) {
        val t = token.toString
        token.setLength(0)
        if (seen.add(t)) {
          val utf8 = UTF8String.fromString(t)
          val h = XXH64.hashUnsafeBytes(utf8.getBaseObject, utf8.getBaseOffset,
            utf8.numBytes(), Seed)
          var b = 0
          while (b < 64) {
            counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column wrapper (via the sql-package bridge for Spark 4's private
    * Column↔Expression converters). */
  def simhash64Native(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash64(org.apache.spark.sql.GraftBridge.expression(c)))
}
