package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/Bs the two quantizer-assignment plans over a real corpus:
  *  - literal: `least(struct(-cos, cid) …)` with the centroid table as
  *    nlist·dim plan literals (the catalog-nlist form)
  *  - compiled: the [[graft.functions.NearestCentroid]] reference-object
  *    loop (the large-nlist form `assign` routes to past 256 centroids)
  * At each nlist: asserts the assignments are IDENTICAL per row
  * (count of disagreeing ids must be 0 — the spec's bit-equality claim
  * re-checked at corpus scale), then times one counted pass of each.
  * The literal arm is skipped (−1) above `litMax` — the regime it
  * exists to avoid.
  *
  * Usage: runMain graft.tools.AssignProbe <sfDir> [nlists csv] [litMax]
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nlists = (if (args.length > 1) args(1) else "64,256,1024")
      .split(",").map(_.trim.toInt)
    val litMax = if (args.length > 2) args(2).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(1, cpus.toInt / 2))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = f
      ((System.nanoTime() - t0) / 1e9, c)
    }

    val rows = nlists.map { nlist =>
      val cents = Similarity.md5Centroids(nlist, 64)
      val compiled = Similarity.IvfIndex.assign(emb, "embedding", cents)
      if (nlist <= litMax) {
        val literal = Similarity.IvfIndex.assignLiteral(emb, "embedding", cents)
        val diff = literal.select(col("vec_id"), col("centroid").as("cl"))
          .join(compiled.select(col("vec_id"), col("centroid").as("cc")), "vec_id")
          .where(col("cl") =!= col("cc")).count()
        require(diff == 0, s"nlist=$nlist: $diff rows disagree between plans")
        val (tl, _) = timed(literal.groupBy("centroid").count().count())
        val (tc, _) = timed(compiled.groupBy("centroid").count().count())
        f"""{"nlist":$nlist,"literal_s":$tl%.1f,"compiled_s":$tc%.1f,"disagree":0}"""
      } else {
        val (tc, cells) = timed(compiled.groupBy("centroid").count().count())
        f"""{"nlist":$nlist,"literal_s":-1,"compiled_s":$tc%.1f,"cells":$cells}"""
      }
    }
    println(s"""{"tool":"AssignProbe","sf_dir":"$sfDir","n_vecs":$n,"lit_max":$litMax,"rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
