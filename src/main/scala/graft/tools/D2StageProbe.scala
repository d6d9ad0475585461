package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attributes the d2 pair-graph chain's wall clock to its stages, in the
  * EXACT bench session shape (cached+spread tables, AQE, shuffle=cpus/2,
  * 64 MB broadcast ceiling, warmed codegen) so the numbers decompose the
  * catalog entries instead of a differently-configured session
  * (JaccardProfileProbe's first run had shuffle=32/uncached and measured
  * a different plan). Stages are cumulative prefixes of
  * [[Dedup.minhashNearDup]] (fixed-cap arm — the sub-100k-doc plan every
  * oracle scale runs), plus the downstream consumers' own stages:
  *
  *   banded    — native minhash + band explode, forced via noop
  *   cands     — + bucket collect + pair explode + distinct
  *   verify    — the full d2 (cands + 2 shuffle_hash joins + intersect)
  *   cc        — connectedComponents over precomputed pairs (d8's add-on)
  *
  * Warmup pass, then min of `reps` timed passes per stage.
  *
  * Usage: runMain graft.tools.D2StageProbe <sfDir> [reps]
  */
object D2StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    System.setProperty("graft.cacheTables", "true")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(1, cpus.toInt / 2).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(df: => DataFrame): Double = {
      spark.sparkContext.setJobDescription(s"d2probe: $name")
      val d = df
      force(d) // warm (codegen + JIT)
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); force(d); (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      System.err.println(f"[d2probe] $name%-12s $best%6.3f s")
      best
    }

    graft.Queries.prewarmTables(spark, sfDir)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism).persist()
    d.count()
    val docs = d.where(length(graft.functions.TextFunctions.normalizeText(col("text"))) > 0)

    val p = graft.Queries.D2Params
    val banded = Dedup.bandedKeys(docs, "text", "doc_id",
      p.bands, p.rowsPerBand, p.shingleN)
    val tBanded = timed("banded")(banded)
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id",
      p.bands, p.rowsPerBand, p.shingleN, p.maxBucket)
    val tCands = timed("cands")(cands)
    val full = Dedup.minhashNearDup(docs, "text", "doc_id",
      p.bands, p.rowsPerBand, p.threshold, p.shingleN, p.maxBucket)
    val tFull = timed("verify")(full)
    // components over a PRE-materialized pair set (what d8 adds on top)
    val pairs = full.localCheckpoint(true)
    val tCc = timed("cc")(
      Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs))
    println(f"""{"tool":"D2StageProbe","sf_dir":"$sfDir","reps":$reps,"banded_s":$tBanded%.3f,"cands_s":$tCands%.3f,"verify_full_s":$tFull%.3f,"cc_s":$tCc%.3f}""")
    spark.stop()
  }
}
