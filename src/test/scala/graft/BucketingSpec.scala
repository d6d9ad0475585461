package graft

import graft.sinks.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("co-bucketed tables join without a shuffle; partitioned layout prunes") {
    spark.sql("DROP TABLE IF EXISTS b_products")
    spark.sql("DROP TABLE IF EXISTS b_offers")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — remove them directly
    Seq("b_products", "b_offers").foreach { t =>
      val dir = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val products = (1 to 500).map(i => (s"p_$i", s"name $i")).toDF("product_id", "name")
    val offers = (1 to 2000).map(i => (s"p_${i % 500 + 1}", i.toDouble)).toDF("product_id", "price")
    Bucketing.writeBucketed(products, "b_products", "product_id", 8, Some("product_id"))
    Bucketing.writeBucketed(offers, "b_offers", "product_id", 8, Some("product_id"))

    // force a sort-merge join (a broadcast would hide the bucketing) and
    // check no shuffle exchange appears on either side
    val joined = Bucketing.table(spark, "b_offers").hint("merge")
      .join(Bucketing.table(spark, "b_products").hint("merge"), "product_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join:\n$plan")
    assert(plan.contains("SortMergeJoin"))
    assert(joined.count() == 2000)

    // bucketed aggregation also skips its exchange
    val agg = Bucketing.table(spark, "b_offers").groupBy("product_id")
      .agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))

    // partition pruning: only the matching source directory is read
    val dir = tempDir("partitioned")
    val bySource = Seq(("Avito", 1), ("Jumia", 2), ("Avito", 3)).toDF("source", "v")
    Bucketing.writePartitioned(bySource, s"$dir/t", Seq("source"))
    val pruned = spark.read.parquet(s"$dir/t").where(col("source") === "Avito")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() == 2)
    assert(scan.contains("PartitionFilters") && scan.contains("source"))
  }
}
