package graft
import org.apache.spark.sql.SparkSession

/** Throwaway floor probe — NOT part of the library (deleted before commit). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.cacheTables", "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val probes = Seq("s3_sentinel_scrub", "f1_clean_price", "z3_zscore_anomalies",
      "a2_offer_dedup", "a1_merge_products", "p6_multi_source", "j1_stats_join",
      "t4_top_deviation", "k1_salted_agg", "q1_pricing_summary", "a1b_merge_documents",
      "d4_ngram_jaccard")
    // warmup all
    probes.foreach(force)
    probes.foreach { n =>
      val times = (1 to 6).map { _ =>
        val t0 = System.nanoTime(); force(n); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n%-24s " + times.map(t => f"$t%5.2f").mkString(" ") +
        f"  min ${times.min}%5.2f")
    }
    spark.stop()
  }
}
