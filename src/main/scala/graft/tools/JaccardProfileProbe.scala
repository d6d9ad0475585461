package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Breaks the d4/d4b wall-clock into stages so the constant-factor gap
  * vs the DuckDB oracle can be attributed instead of guessed at
  * (VERDICT r16 #7: d4 1.87 vs 1.10 s, d4b 1.81 vs 0.96 s at sf0.1 —
  * the last family where Spark materially trails at meaningful
  * absolute time). Stages are cumulative prefixes of the real plans,
  * timed same-JVM (median of `reps`), so stage N − stage N−1 ≈ the
  * added phase's cost:
  *
  *  d4 (counting, t=0.05):
  *   shingle   — normalize + word-shingle + md5-hash every doc
  *               (NativeTextColumns.gramHashes), sum of set sizes
  *   gramagg   — + explode to (blk, gram) postings and count distinct
  *               posting groups (the index shuffle, no pair explosion)
  *   full      — the catalog query (pairs + intersect counts + two
  *               size joins + threshold)
  *
  *  d4b (prefix, t=0.8): docfreq (df table build), full.
  *
  * Usage: runMain graft.tools.JaccardProfileProbe <sfDir> [reps]
  */
object JaccardProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs(): DataFrame =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "lang", "text")

    def med(f: => Long): (Double, Long) = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val c = f
        ((System.nanoTime() - t0) / 1e9, c)
      }
      (runs.map(_._1).sorted.apply(reps / 2), runs.head._2)
    }

    val nDocs = docs().count()

    // --- d4 stages (counting formulation, t=0.05, n=2) ---
    val (tShingle, nGrams) = med {
      docs().select(Dedup.gramHashSet(col("text"), 2).as("gr"))
        .agg(sum(size(col("gr")))).head().getLong(0)
    }
    val (tGramAgg, nPostings) = med {
      docs().select(col("doc_id"), col("lang").as("blk"),
          explode(Dedup.gramHashSet(col("text"), 2)).as("gram"))
        .groupBy("blk", "gram").count().count()
    }
    val (tD4, nD4) = med {
      Dedup.ngramJaccardPairs(docs(), "text", "doc_id", "lang",
        n = 2, threshold = 0.05).count()
    }

    // --- d4b stages (prefix formulation, t=0.8, n=2) ---
    val (tDocFreq, _) = med {
      docs().select(col("doc_id"), col("lang").as("blk"),
          explode(Dedup.gramHashSet(col("text"), 2)).as("gram"))
        .groupBy("blk", "gram").agg(count(lit(1)).as("df"))
        .where(col("df") <= 500).count()
    }
    val (tD4b, nD4b) = med {
      Dedup.prefixJaccardPairs(docs(), "text", "doc_id", "lang",
        n = 2, threshold = 0.8).count()
    }

    println(f"""{"tool":"JaccardProfileProbe","sf_dir":"$sfDir","reps":$reps,"n_docs":$nDocs,"n_grams":$nGrams,"n_postings":$nPostings,"d4_shingle_s":$tShingle%.2f,"d4_gramagg_s":$tGramAgg%.2f,"d4_full_s":$tD4%.2f,"d4_pairs":$nD4,"d4b_docfreq_s":$tDocFreq%.2f,"d4b_full_s":$tD4b%.2f,"d4b_pairs":$nD4b}""")
    spark.stop()
  }
}
