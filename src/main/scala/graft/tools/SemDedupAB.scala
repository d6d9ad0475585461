package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock A/B of SemDeDup's uncapped in-cell pair pass vs the
  * capped-cell form (d11b) on a full ScaleGen embeddings table — the
  * companion number to AnnScaleCheck's recall evidence: V3b proves the
  * capped form KEEPS the planted near-dups; this prices what the cap
  * buys. Both arms use the same trained centroids and threshold; the
  * uncapped arm's cost is Σ|cell|² (quadratic on natural clusters, the
  * V5 exposure), the capped arm's is bounded per subcell.
  *
  * Usage: runMain graft.tools.SemDedupAB <sfDir> [threshold] [targetCell] [arms]
  * `arms` is a csv subset of capped,probed,uncapped (default: all three) —
  * skipped arms print -1 so a partial re-run never masquerades as a
  * fresh three-arm measurement.
  */
object SemDedupAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.99
    val target = if (args.length > 2) args(2).toInt else 1000
    val Known = Set("capped", "probed", "uncapped")
    val arms: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else Known
    require(arms.nonEmpty && arms.subsetOf(Known),
      s"unknown arm(s) ${(arms -- Known).mkString(",")}; known: ${Known.mkString(",")}" +
        " — a typo would otherwise emit a measurement log with no measurements")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(1, cpus.toInt / 2))
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val centroids = Similarity.IvfIndex.train(emb, "vec_id", "embedding",
      nlist = 64, iters = 2)

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = f
      ((System.nanoTime() - t0) / 1e9, c)
    }
    def arm(name: String)(f: => Long): (Double, Long) =
      if (arms(name)) timed(f) else (-1.0, -1L)
    val (tCap, nCap) = arm("capped")(Similarity.semanticNearDupPairsCapped(
      emb, "vec_id", "embedding", centroids, threshold, target).count())
    val (tProbe, nProbe) = arm("probed")(Similarity.semanticNearDupPairsCapped(
      emb, "vec_id", "embedding", centroids, threshold, target,
      probeSplitBits = 1).count())
    val (tUncap, nUncap) = arm("uncapped")(Similarity.semanticNearDupPairs(
      emb, "vec_id", "embedding", centroids, threshold).count())
    // skipped arms keep the -1 sentinel for field-shape stability, but the
    // "arms" list states what actually ran so a consumer folding -1 into
    // timing math has an in-band signal to filter on
    val armsJson = Seq("capped", "probed", "uncapped").filter(arms)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"tool":"SemDedupAB","sf_dir":"$sfDir","arms":$armsJson,"n_vecs":$n,"threshold":$threshold,"target_cell":$target,"capped_s":$tCap%.1f,"capped_pairs":$nCap,"probed_s":$tProbe%.1f,"probed_pairs":$nProbe,"uncapped_s":$tUncap%.1f,"uncapped_pairs":$nUncap}""")
    spark.stop()
  }
}
