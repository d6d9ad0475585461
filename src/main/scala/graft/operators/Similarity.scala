package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), for training-data curation (near-dup by embedding,
  * retrieval eval, cluster-balance sampling).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. Query side is broadcast; the
  *    corpus is scanned once, map-side, with a per-partition top-k
  *    (window + rank after a narrow transform). Correct at any scale but
  *    O(|Q|·|C|) work — the baseline and the verifier for the ANN path.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus hashed map-side into
  *    sign-bit buckets, probes only matching buckets (multi-probe via
  *    Hamming-adjacent buckets). Recall/latency tunable with planes/probes.
  *
  * All arithmetic in double (cast once from float) for cross-engine
  * determinism.
  */
object Similarity {

  /** Dot product of two equal-length double arrays (sequential fold —
    * deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Cosine similarity, rounded for stable comparison. */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact top-k neighbors for each query vector. `queries` and `corpus`
    * both carry (idCol, vecCol); self-matches excluded. Query side should
    * be the small one — it is broadcast, so the corpus never shuffles. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight from a
    * fixed-seed hash, in [-1, 1). Generated once on the driver. */
  private def planes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42L)
    Array.fill(numPlanes, dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-bucket key: one bit per hyperplane (sign of the projection). */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int): Column = {
    val ps = planes(numPlanes, dim)
    val vd = asDouble(vec)
    ps.zipWithIndex.map { case (p, i) =>
      val proj = dot(vd, array(p.map(lit): _*))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k: both sides bucketed map-side by hyperplane signs; join on
    * the bucket (and its single-bit-flip probes from the query side), then
    * exact cosine + rank within the candidates. Misses only neighbors
    * landing in non-probed buckets — recall tunable via numPlanes/probes. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int, dim: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), numPlanes, dim).as("bucket"))
    // multi-probe: the exact bucket plus each 1-bit flip
    val probeExprs = lit(0L) +: (0 until numPlanes).map(i => lit(1L << i))
    val q = broadcast(queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        lshBucket(col(vecCol), numPlanes, dim).as("qbucket"))
      .withColumn("bucket", explode(array(probeExprs.map(col("qbucket").bitwiseXOR(_)): _*)))
      .drop("qbucket"))
    val scored = q.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.select("query_id", "neighbor_id", "cos").distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
