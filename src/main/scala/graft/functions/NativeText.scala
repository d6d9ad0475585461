package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Native text/pair expressions for the hot near-dup paths.
  *
  * The column-expression formulations (normalize → split → slice-transform
  * shingles → per-seed transform+md5 minhash → nested-transform pair
  * explosion) are correct but live entirely in interpreted higher-order
  * functions: every lambda application walks an expression tree per
  * element. These expressions do the same work as straight compiled JVM
  * loops — one pass per row — behind a single CodegenFallback call
  * boundary. Semantics are bit-identical to the column versions (asserted
  * in DedupSimilaritySpec), so the DuckDB oracles are unchanged.
  */
object NativeText {

  /** normalizeText + whitespace tokenization in one pass: lowercase,
    * [a-z0-9]+ runs are tokens, everything else separates. */
  def tokenize(s: String): mutable.ArrayBuffer[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = s.length
    while (i <= n) {
      val c = if (i < n) Character.toLowerCase(s.charAt(i)) else ' '
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    out
  }

  /** Word n-gram shingles with the same edge semantics as
    * [[TextFunctions.shingles]]: k ≤ n → one whole-text shingle. */
  def shingleStrings(s: String, n: Int): Array[String] = {
    val toks = tokenize(s)
    val k = toks.length
    if (n <= 1) return toks.toArray
    if (k <= n) return Array(toks.mkString(" "))
    Array.tabulate(k - n + 1)(i => toks.slice(i, i + n).mkString(" "))
  }

  private val Hex = "0123456789abcdef".toCharArray

  /** First 16 hex chars of an md5 digest (manual hex — String.format here
    * costs more than the digest itself). */
  def hex16(d: Array[Byte]): String = {
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

/** array<string> of distinct word n-gram shingles of a text column. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val all = NativeText.shingleStrings(input.toString, n)
    val seen = mutable.LinkedHashSet.empty[String]
    all.foreach(seen.add)
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** MinHash signature (numHashes 16-hex-char strings) of a text column:
  * min over the distinct gram set of md5("{seed}:{gram}")[0,16) per seed —
  * identical to the column formulation in graft.operators.Dedup. */
case class MinHashSignature(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val grams = mutable.LinkedHashSet.empty[String]
    NativeText.shingleStrings(input.toString, shingleN).foreach(grams.add)
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](numHashes)
    grams.foreach { g =>
      var seed = 0
      while (seed < numHashes) {
        val d = md.digest(s"$seed:$g".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = NativeText.hex16(d)
        if (mins(seed) == null || h < mins(seed)) mins(seed) = h
        seed += 1
      }
    }
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      if (mins(i) != null) out(i) = UTF8String.fromString(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** All ordered (a < b) pairs of a pre-sorted array, as
  * array<struct<id_a,id_b>> — the compiled twin of the nested-transform
  * pair explosion (which allocates an interpreted slice per element). */
case class SortedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", elemType, nullable = false),
    StructField("id_b", elemType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_sorted_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val et = elemType
    val k = arr.numElements()
    val out = new Array[Any](k * (k - 1) / 2)
    var idx = 0
    var i = 0
    while (i < k) {
      val a = arr.get(i, et)
      var j = i + 1
      while (j < k) {
        out(idx) = InternalRow(a, arr.get(j, et))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SortedPairs = copy(child = c)
}

object NativeTextColumns {
  def wordShingles(c: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))
  def minhashSignature(c: Column, numHashes: Int, shingleN: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), numHashes, shingleN))
  def sortedPairs(c: Column): Column =
    GraftBridge.column(SortedPairs(GraftBridge.expression(c)))
}
