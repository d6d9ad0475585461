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

/** Native twin of the PORTABLE 16-bit SimHash
  * ([[graft.operators.Dedup.simhash16]], the d3 catalog entry whose
  * md5-derived bits the DuckDB oracle reproduces verbatim).
  *
  * The column formulation composes 16 interpreted `aggregate` calls, each
  * re-walking the distinct-token array and re-hashing every token with
  * md5 — 16 md5 digests per token per row, all outside whole-stage
  * codegen (r11 catalog audit: d3 carried an interpreted Project for it).
  * This does ONE tokenizer pass and ONE md5 per distinct token (its first
  * two bytes are exactly `conv(substring(md5(t),1,4),16,10)`), then a
  * 16-counter accumulation — and `doGenCode` keeps the projection
  * codegen'd. Bit-identical by construction; asserted against the column
  * formulation in DedupSimilaritySpec.
  */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash16"

  override def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val s = text.toString.toLowerCase
    val counters = new Array[Int](16)
    val seen = mutable.HashSet.empty[String]
    val md = java.security.MessageDigest.getInstance("MD5")
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
          md.reset()
          val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 4 hex chars of the digest = top two bytes
          val h = ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
          var b = 0
          while (b < 16) {
            counters(b) += (if (((h >>> b) & 1) == 1) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Null text simhashes to 0L in the column formulation (empty token
    * array → every bitSum 0) — coalesce before the null-strict expression
    * so the twins agree on null rows too. */
  def simhash16Native(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(SimHash16(
      org.apache.spark.sql.GraftBridge.expression(
        org.apache.spark.sql.functions.coalesce(
          c, org.apache.spark.sql.functions.lit("")))))
}
