package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnoses WHY the capped SemDeDup arm's measured exponent exceeds ~1
  * (SemDedupAB r14: 1.48 per tripling at 200k→600k, 1.53 per doubling at
  * 600k→1.2M despite max_cell ≪ the 8-bit subdivision ceiling).
  *
  * Hypothesis under test: the cellplane hyperplanes pass through the
  * ORIGIN, but a quantizer cell is a natural cluster centered far off
  * origin — the whole cell lies on ONE side of most global hyperplanes,
  * so each "split" bit is near-constant within the cell and the subcell
  * distribution stays as skewed as the cell itself (Σ|subcell|² ≈
  * Σ|cell|² ⇒ the cap buys little and the pair pass stays quadratic in
  * cluster size). The fix candidate: CENTER each plane on the cell it
  * splits — bit p of vector v in cell c is sign((v − centroid_c)·h_p)
  * = sign(v·h_p − centroid_c·h_p), i.e. the same projection minus a
  * per-(cell, plane) constant, which bisects the within-cell
  * distribution.
  *
  * Reports, for both schemes at the operator's per-cell depth rule:
  * Σ|subcell|² (the candidate-pair volume the pair join actually pays),
  * the max subcell, and how many subcells still exceed targetCell.
  *
  * Usage: runMain graft.tools.SubcellProbe <sfDir> [targetCell] [maxBits]
  */
object SubcellProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val target = if (args.length > 1) args(1).toInt else 1000
    val maxBits = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(1, cpus.toInt / 2))
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val centroids = Similarity.IvfIndex.train(emb, "vec_id", "embedding",
      nlist = 64, iters = 2)
    val dim = centroids.head._2.length
    val planeW = Array.tabulate(maxBits, dim)(
      (p, d) => Similarity.md5Weight("cellplane", p, d))

    val vd = Similarity.asDouble(col("embedding"))
    def proj(p: Int): Column = Similarity.dot(vd, array(planeW(p).map(lit): _*))
    val bitsOrigin = Similarity.lshBucket(col("embedding"), maxBits, dim,
      prefix = "cellplane")
    // centered: same projections, per-(cell,plane) offset = centroid·h_p
    // (a tiny broadcast table — nlist rows)
    val offs = centroids.map { case (cid, cv) =>
      (cid, planeW.map(pl => pl.zip(cv).map { case (w, x) => w * x }.sum).toSeq)
    }.toSeq
    val offsDf = broadcast(offs.toDF("centroid", "offs"))
    val bitsCentered = (0 until maxBits).map { p =>
      when(proj(p) >= element_at(col("offs"), p + 1), lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

    val assigned = Similarity.IvfIndex.assign(emb, "embedding", centroids)
      .join(offsDf, Seq("centroid"))
      .select(col("centroid"), bitsOrigin.as("b_origin"), bitsCentered.as("b_centered"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val sizes = assigned.groupBy("centroid").agg(count(lit(1)).as("nc"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val kOf = sizes.map { case (cid, nc) =>
      var k = 0
      while (k < maxBits && (nc >> k) > target) k += 1
      cid -> k
    }
    val masks = broadcast(kOf.toSeq
      .map { case (cid, k) => (cid, (1L << k) - 1) }.toDF("centroid", "mask"))
    val cellPairVolume = sizes.map { case (_, nc) => nc * nc }.sum

    def report(bitsCol: String): (Long, Long, Long) = {
      val sub = assigned.join(masks, Seq("centroid"))
        .groupBy(col("centroid"), col(bitsCol).bitwiseAND(col("mask")).as("sub"))
        .agg(count(lit(1)).as("m"))
      val r = sub.agg(sum(col("m") * col("m")).cast("long"),
        max("m").cast("long"),
        sum(when(col("m") > target, 1L).otherwise(0L)).cast("long")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val (oVol, oMax, oOver) = report("b_origin")
    val (cVol, cMax, cOver) = report("b_centered")
    println(
      s"""{"tool":"SubcellProbe","sf_dir":"$sfDir","n_vecs":$n,"target":$target,"max_bits":$maxBits,"cell_sq":$cellPairVolume,"max_cell":${sizes.map(_._2).max},"origin":{"sub_sq":$oVol,"max_sub":$oMax,"over_target":$oOver},"centered":{"sub_sq":$cVol,"max_sub":$cMax,"over_target":$cOver}}""")
    spark.stop()
  }
}
