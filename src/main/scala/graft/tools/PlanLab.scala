package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition harness for plan-cost attribution (not part of
  * the library surface; used to attribute bench time to plan stages). */
object PlanLab {
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
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(df: => DataFrame): Unit = {
      val d = df
      force(d) // warm
      val t0 = System.nanoTime(); force(d); val t1 = System.nanoTime()
      force(d); val t2 = System.nanoTime()
      System.err.println(f"[planlab] $name%-24s ${math.min(t1 - t0, t2 - t1) / 1e9}%6.3f s")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(spark.sparkContext.defaultParallelism).persist()
    timed("scan_count")(li.groupBy().count())
    timed("agg_only")(
      li.groupBy("l_partkey").agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("s1")))
    timed("stats_joinback")(graft.operators.Anomaly.withGroupStats(
      li, Seq("l_partkey"), "l_extendedprice"))
    timed("z3_flagged")(graft.operators.Anomaly.zScoreAnomalies(
      li, Seq("l_partkey"), "l_extendedprice", 2.0, 3))
    timed("z3_catalog")(graft.Queries.z3ZscoreAnomalies(spark, sfDir))
    timed("z5_catalog")(graft.Queries.z5AnomalySummary(spark, sfDir))
    spark.stop()
  }
}
