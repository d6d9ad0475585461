package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed/partitioned table layout for the staged data — the storage-side
  * half of shuffle elimination at 100 TB.
  *
  * - `writePartitioned`: directory partitioning by low-cardinality columns
  *   (source, ingest date). Catalyst prunes partitions from WHERE clauses,
  *   so per-source / per-day stages read only their slice.
  * - `writeBucketed`: hash-bucket by the join/aggregation key
  *   (product_id). Two tables bucketed the same way join with ZERO
  *   exchanges — the daily merge of today's drop against the accumulated
  *   product table becomes a shuffle-free sort-merge join, and
  *   groupBy(product_id) aggregations skip their exchange too.
  *
  * Bucketing requires the table catalog (`saveAsTable`); plain parquet
  * paths cannot carry bucket metadata.
  */
object Bucketing {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
