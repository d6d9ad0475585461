package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporary profiling harness (not part of the library). */
object Scratch {
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
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = {
      val plan = df
      plan.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        plan.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-44s ${runs.min}%.3f s")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").persist(); li.count()
    val part = spark.read.parquet(s"$sfDir/part.parquet").persist(); part.count()

    time("a1: full")(Queries.a1MergeProducts(spark, sfDir))
    time("a1b: full")(Queries.a1bMergeDocuments(spark, sfDir))
    val j = part.join(li, part("p_partkey") === li("l_partkey"))
    time("a1: join+count only")(j.groupBy("p_brand").agg(count(lit(1)).as("n")))
    time("a1: +countDistinct")(j.groupBy("p_brand")
      .agg(countDistinct("l_partkey").as("np"), count(lit(1)).as("n")))
    time("a1: +collect_set")(j.groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        concat_ws(",", sort_array(collect_set(col("l_returnflag")))).as("src")))
    time("a1: +maxByOrd name")(j.groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        graft.functions.MinByOrd.maxBy(
          struct(length(col("p_name")).as("len"), col("p_name").as("name")),
          col("p_name")).getField("p").as("top_name")))
    time("a1: +max(struct) name")(j.groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        max(struct(length(col("p_name")).as("len"), col("p_name").as("name")))
          .getField("name").as("top_name")))
    time("a6: full")(Queries.a6GroupStats(spark, sfDir))
    time("p6: full")(Queries.p6MultiSource(spark, sfDir))
    time("x8: full")(Queries.x8KeywordTerms(spark, sfDir))
    spark.stop()
  }
}
