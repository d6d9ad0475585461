package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B harness for the two exact-jaccard pair formulations at equal
  * thresholds (bench tooling): the counting inverted-index join
  * (`Dedup.ngramJaccardPairs`, d4's plan) vs the All-Pairs/PPJoin prefix
  * filter (`Dedup.prefixJaccardPairs`, d4b's plan). The prefix filter
  * exists for high thresholds at scale — its candidate set shrinks with
  * (1−t) while the counting join pays every gram co-occurrence — but the
  * crossover point is an empirical question this tool measures instead
  * of asserting from asymptotics.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.CrossoverAB [t1,t2,...]
  */
object CrossoverAB {
  def main(args: Array[String]): Unit = {
    val thresholds = if (args.nonEmpty) args(0).split(",").map(_.toDouble).toSeq
                     else Seq(0.5, 0.8)
    System.setProperty("graft.cacheTables", "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()

    def time(df: => DataFrame): (Double, Long) = {
      val rows = df.count() // warm (janino + shuffle files)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      (math.min(t1 - t0, t2 - t1) / 1e9, rows)
    }

    println(f"${"t"}%6s ${"counting_s"}%12s ${"prefix_s"}%12s ${"pairs"}%10s  winner")
    thresholds.foreach { t =>
      val (cs, cRows) = time(graft.operators.Dedup.ngramJaccardPairs(
        docs, "text", "doc_id", "lang", n = 2, threshold = t))
      val (ps, pRows) = time(graft.operators.Dedup.prefixJaccardPairs(
        docs, "text", "doc_id", "lang", n = 2, threshold = t))
      require(cRows == pRows, s"formulations disagree at t=$t: $cRows vs $pRows")
      val winner = if (ps < cs) "prefix" else "counting"
      println(f"$t%6.2f $cs%12.3f $ps%12.3f $cRows%10d  $winner")
    }
    spark.stop()
  }
}
