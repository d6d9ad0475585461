package graft.tools

import graft.operators.{Similarity, SemanticPairGraph}
import org.apache.spark.sql.SparkSession

/** Cross-process consumption measurement for the semantic pair-graph
  * artifact ([[SemanticPairGraph]]) — the companion number to the text
  * pair graph's and the group-stats artifact's consumption rows: run
  * once with a fresh cache dir (build: quantizer-assign + pair pass +
  * parquet write), then again in a NEW JVM with the same dir (consume:
  * manifest check + parquet read). Centroids are trained in BOTH
  * processes (IvfIndex.train's decimal determinism makes the digest
  * identical across JVMs — itself re-asserted here via the cache HIT),
  * so the consume run proves the whole identity chain, not just the
  * I/O.
  *
  * Usage: SPARK_GRAFT_PAIR_CACHE=<dir> runMain graft.tools.SemPairCacheProbe <sfDir> [threshold]
  */
object SemPairCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.99
    require(sys.env.contains("SPARK_GRAFT_PAIR_CACHE"),
      "set SPARK_GRAFT_PAIR_CACHE — an uncached run measures computation, " +
        "which SemDedupAB already does")
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
    val t0 = System.nanoTime()
    val centroids = Similarity.IvfIndex.train(emb, "vec_id", "embedding",
      nlist = 64, iters = 2)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val p = SemanticPairGraph.Params(threshold)
    val t1 = System.nanoTime()
    val nPairs = SemanticPairGraph.pairs(emb, "vec_id", "embedding",
      centroids, s"$sfDir#embeddings", p).count()
    val tPairs = (System.nanoTime() - t1) / 1e9
    println(f"""{"tool":"SemPairCacheProbe","sf_dir":"$sfDir","n_vecs":$n,"threshold":$threshold,"train_s":$tTrain%.1f,"pairs_s":$tPairs%.1f,"pairs":$nPairs,"cache_dir":"${sys.env("SPARK_GRAFT_PAIR_CACHE")}"}""")
    spark.stop()
  }
}
