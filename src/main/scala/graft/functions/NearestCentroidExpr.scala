package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid id by cosine similarity, as ONE compiled loop over a
  * centroid table carried as a plan REFERENCE OBJECT — the large-nlist
  * form of [[graft.operators.Similarity.IvfIndex.assign]]'s quantizer
  * step.
  *
  * Why it exists: the literal formulation — `least(struct(-cosine(v,
  * array(lit…)), lit(cid)) …)` over nlist struct branches — embeds
  * nlist·dim literals in the expression tree. That is the right plan at
  * catalog nlist (tens: whole-stage codegen, constant-folded norms), but
  * nlist must GROW with the corpus (cells ∝ corpus / targetCell), and a
  * plan tree of 10⁴–10⁵ branches breaks down long before 100 TB:
  * analysis and codegen go superlinear in tree size, the generated
  * method blows the JIT limit and falls back to interpretation, and
  * every task binary re-ships the tree. Here the table is ONE object
  * (ids + vectors + precomputed norms), referenced once per task via
  * `addReferenceObj`, and the per-row work is the same nlist·dim
  * multiply-adds inside a single JIT-compiled method.
  *
  * Bit-compatibility with the literal path (asserted by spec): the
  * per-centroid cosine is the identical sequential left-to-right fold
  * [[VecDot]] computes (norms included — precomputed once here, but the
  * same double either way), and selection minimizes (-cos, cid)
  * lexicographically exactly as `least(struct(negcos, cid))` does:
  * ascending-cid iteration keeping strict improvements — ties keep the
  * smaller cid.
  *
  * NaN rule: a NaN cosine — 0/0 in Java arithmetic, possible only from
  * a zero-NORM centroid in a caller-supplied table or a zero input
  * vector — ranks BELOW every real cosine (it is skipped unless every
  * cosine is NaN, in which case the minimum cid wins). This is a
  * DELIBERATE divergence from both literal modes, which are unusable
  * references on degenerate inputs (measured, DedupSimilaritySpec):
  * under ANSI the literal's SQL Divide THROWS on the 0/0; with ANSI
  * off it yields NULL — not NaN — and a NULL struct field sorts FIRST
  * in `least`, so the literal/non-ANSI form assigns EVERY row to the
  * degenerate centroid (precisely the all-rows flood the salt guard's
  * "train the quantizer" warning exists to catch). Ranking the
  * degenerate centroid last is the only ordering under which real
  * centroids keep winning; on well-formed tables (all norms non-zero,
  * the operator's contract) no NaN arises and the two forms are
  * bit-identical.
  *
  * Scale envelope: the reference object rides the task binary, so this
  * form is right up to centroid tables of ~10⁷ doubles (tens of MB);
  * beyond that the next rung is an explicit broadcast + mapPartitions.
  */
case class NearestCentroid(child: Expression,
                           ids: Array[Int],
                           vecs: Array[Array[Double]]) extends UnaryExpression {
  require(ids.length == vecs.length && ids.nonEmpty,
    s"centroid table: ${ids.length} ids vs ${vecs.length} vectors")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  @transient private lazy val childFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  // sqrt of the same sequential fold the literal path's norm(c) computes
  @transient private lazy val norms: Array[Double] = vecs.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  def nearest(v: ArrayData): Int = {
    val n = v.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) {
      val x = if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vn += x * x
      i += 1
    }
    val vnorm = math.sqrt(vn)
    var bestCos = Double.NaN
    var bestCid = ids(0)
    var k = 0
    while (k < vecs.length) {
      val c = vecs(k)
      val m = math.min(n, c.length)
      var dot = 0.0
      i = 0
      while (i < m) {
        val x = if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * c(i)
        i += 1
      }
      val cos = dot / (vnorm * norms(k))
      // strict improvement only: ties keep the earlier = smaller cid, as
      // least(struct(-cos, cid)) does. A NaN cosine ranks below every
      // real one (SQL NaN-sorts-greatest on the negated cosine): a real
      // cosine displaces a NaN best (second disjunct), a NaN candidate
      // never displaces anything (both disjuncts false), and an all-NaN
      // row keeps the initial minimum cid — matching the literal form
      // for ANY centroid table, zero-norm entries included
      if (cos > bestCos || (java.lang.Double.isNaN(bestCos) &&
            !java.lang.Double.isNaN(cos))) { bestCos = cos; bestCid = ids(k) }
      k += 1
    }
    bestCid
  }

  override def nullSafeEval(v: Any): Any = nearest(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this,
      classOf[NearestCentroid].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.nearest($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def column(vec: Column, centroids: Array[(Int, Array[Double])]): Column = {
    // ascending-cid iteration is what makes "keep strict improvements"
    // equal the literal path's lexicographic min over (negcos, cid) —
    // sort here so the equivalence holds for ANY caller's table order
    val sorted = centroids.sortBy(_._1)
    GraftBridge.column(NearestCentroid(GraftBridge.expression(vec),
      sorted.map(_._1), sorted.map(_._2)))
  }
}

/** The k nearest centroid ids by cosine, ordered by (cos desc, cid asc)
  * — [[NearestCentroid]]'s top-k sibling, for the IVF QUERY side's probe
  * list ([[graft.operators.Similarity.IvfIndex.topK]]). The literal
  * formulation there — `slice(sort_array(array(struct(-cos, cid) …)),
  * 1, nprobe)` — sorts an nlist-element struct array built from
  * nlist·dim plan literals per row: correct at catalog nlist, breaks
  * down past a few hundred centroids exactly like the assignment tree.
  * Here: one referenced table, one compiled loop, an insertion buffer
  * of k slots (k = nprobe, small). Same doubles, same order (equal
  * cosines resolve to the smaller cid because insertion is strict and
  * iteration is ascending-cid). Same NaN rule as [[NearestCentroid]]:
  * a NaN cosine ranks below every real one, so degenerate zero-norm
  * centroids fill trailing probe slots (cid order) only. */
case class TopCentroids(child: Expression,
                        ids: Array[Int],
                        vecs: Array[Array[Double]],
                        k: Int) extends UnaryExpression {
  require(ids.length == vecs.length && ids.nonEmpty && k >= 1,
    s"centroid table: ${ids.length} ids vs ${vecs.length} vectors, k=$k")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_top_centroids"

  @transient private lazy val childFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val norms: Array[Double] = vecs.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  def top(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) {
      val x = if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vn += x * x
      i += 1
    }
    val vnorm = math.sqrt(vn)
    val kk = math.min(k, ids.length)
    val bufCos = new Array[Double](kk)
    val bufCid = new Array[Int](kk)
    var size = 0
    var c = 0
    while (c < vecs.length) {
      val cv = vecs(c)
      val m = math.min(n, cv.length)
      var dot = 0.0
      i = 0
      while (i < m) {
        val x = if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * cv(i)
        i += 1
      }
      val cos = dot / (vnorm * norms(c))
      // first slot whose cosine this STRICTLY beats: equal cosines keep
      // the earlier (smaller-cid) entry ahead. "Beats" ranks NaN below
      // every real cosine (see NearestCentroid's NaN rule): a NaN
      // candidate beats nothing — it fills trailing slots only, after
      // earlier NaNs (cid order among them) — and a real candidate
      // displaces a NaN buffer entry, so a degenerate zero-norm
      // centroid can never occupy a probe slot ahead of a real one
      var pos = 0
      while (pos < size && !(cos > bufCos(pos) ||
               (java.lang.Double.isNaN(bufCos(pos)) &&
                 !java.lang.Double.isNaN(cos)))) pos += 1
      if (pos < kk) {
        val last = math.min(size, kk - 1)
        var j = last
        while (j > pos) { bufCos(j) = bufCos(j - 1); bufCid(j) = bufCid(j - 1); j -= 1 }
        bufCos(pos) = cos
        bufCid(pos) = ids(c)
        if (size < kk) size += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bufCid, size))
  }

  override def nullSafeEval(v: Any): Any = top(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCentroids", this,
      classOf[TopCentroids].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.top($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

object TopCentroids {
  def column(vec: Column, centroids: Array[(Int, Array[Double])], k: Int): Column = {
    val sorted = centroids.sortBy(_._1)
    GraftBridge.column(TopCentroids(GraftBridge.expression(vec),
      sorted.map(_._1), sorted.map(_._2), k))
  }
}
