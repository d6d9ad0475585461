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

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(32).persist(); li.count()

    // ---- a1b decomposition ----
    import graft.operators.ProductMerge
    val seqn = col("l_orderkey") * 10 + col("l_linenumber")
    val src = when(col("l_returnflag") === "A", lit("Avito"))
      .when(col("l_returnflag") === "N", lit("Jumia"))
      .otherwise(lit("Electroplanet"))
    val tstr = lpad(seqn.cast("string"), 12, "0")
    val urlc = concat(lit("u"), (col("l_orderkey") % 3).cast("string"))
    val nameLen = (seqn % 23 + 1).cast("int")
    val name = concat(substr(lit("abcdefghijklmnopqrstuvwxyz"), lit(1), nameLen),
      lit("-"), (col("l_suppkey") % 10).cast("string"))
    val qty = col("l_quantity").cast("long")
    val storage = when(col("l_linenumber") % 2 === 0,
      concat((qty % 512).cast("string"), lit("GB")))
    val ram = when(qty % 3 === 0, (qty % 32).cast("string"))
    val color = when(col("l_suppkey") % 5 === 0,
      concat(lit("C"), (col("l_suppkey") % 9).cast("string")))
    def docsDf = li.select(
      when(col("l_partkey") % 97 === 0, lit(""))
        .otherwise(concat(lit("P "), (col("l_partkey") % 500).cast("string")))
        .as("product_id"),
      concat(lit("B"), (col("l_partkey") % 7).cast("string")).as("brand"),
      concat(lit("M"), (col("l_suppkey") % 5).cast("string")).as("model"),
      name.as("product_name"),
      lit("Smartphone").as("category"),
      map_concat(
        when(storage.isNotNull, map(lit("storage"), storage))
          .otherwise(map().cast("map<string,string>")),
        when(ram.isNotNull, map(lit("ram"), ram))
          .otherwise(map().cast("map<string,string>")),
        when(color.isNotNull, map(lit("color"), color))
          .otherwise(map().cast("map<string,string>"))).as("specifications"),
      array(struct(src.as("source"), col("l_extendedprice").as("price"),
        lit("MAD").as("currency"), urlc.as("url"), tstr.as("scraped_at"))).as("offers"),
      array(src).as("sources"),
      concat(lit("2026-01-"), lpad((col("l_orderkey") % 28 + 1).cast("string"), 2, "0"))
        .as("created_at"),
      concat(lit("2026-03-"), lpad((col("l_orderkey") % 28 + 1).cast("string"), 2, "0"))
        .as("last_updated"))

    time("a1b: synth projection only")(docsDf)
    val exploded = docsDf
      .where(length(ProductMerge.normalizeId(col("product_id"))) > 0)
      .select(ProductMerge.normalizeId(col("product_id")).as("product_id"),
        col("brand"), col("model"), col("product_name"), col("category"),
        col("specifications"), col("sources"), col("created_at"),
        col("last_updated"), explode(col("offers")).as("offer"))
      .withColumn("ord", struct(
        when(col("offer.source") === "Jumia", lit(0))
          .when(col("offer.source") === "Avito", lit(1)).otherwise(lit(2)).as("rank"),
        coalesce(col("offer.scraped_at"), lit("")).as("t"),
        coalesce(col("offer.url"), lit("")).as("u")))
    time("a1b: + explode + ord")(exploded)
    val payload = struct(
      col("ord"), col("brand"), col("model"), col("product_name"),
      col("category"), col("specifications"), col("sources"),
      col("created_at"), col("last_updated"), col("offer"))
    val preDeduped = exploded
      .groupBy(col("product_id"),
        col("offer.source").as("__k_src"), col("offer.url").as("__k_url"))
      .agg(graft.functions.MinByOrd.minBy(col("ord"), payload).as("w"))
    time("a1b: + preDedup MinByOrd agg")(preDeduped)
    time("a1b: full merge")(ProductMerge.merge(docsDf, ProductMerge.PluginOrder,
      dedupPerProduct = true, dedupGlobal = false))
    time("a1b: full query")(Queries.a1bMergeDocuments(spark, sfDir))
    time("a1b: merge preReduce=off")(ProductMerge.merge(docsDf, ProductMerge.PluginOrder,
      dedupPerProduct = true, dedupGlobal = false, preReduce = false))

    // ---- a1 clean re-measure ----
    time("a1: full")(Queries.a1MergeProducts(spark, sfDir))
    // ---- others ----
    time("x8: full")(Queries.x8KeywordTerms(spark, sfDir))
    time("a2: full")(Queries.a2OfferDedup(spark, sfDir))
    time("j1: full")(Queries.j1StatsJoin(spark, sfDir))
    spark.stop()
  }
}
