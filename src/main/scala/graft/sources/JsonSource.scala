package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** S1/S2/S3 — JSON ingestion for scraped marketplace drops.
  *
  * The reference reads a file as one JSON array and falls back to
  * line-delimited JSON, skipping malformed lines with a warning
  * (M/dags/marketeye_etl_dag.py:33-59); source files are discovered by
  * lowercase-substring patterns over a raw directory
  * (M/plugins/marketeye_operators.py:84-100, patterns at
  * M/config/pipeline_config.py:66-72).
  *
  * Scale notes: NDJSON is the 100 TB path (splittable — each 128 MB block
  * parses in parallel); `multiLine=true` JSON arrays force one task per
  * file, so the array fallback exists only for small legacy drops. Explicit
  * schemas keep the scan single-pass (no inference job) and give the
  * reference's missing-column→null semantics.
  */
object JsonSource {

  /** Filename patterns per source (lowercase substring match),
    * ref M/config/pipeline_config.py:66-72. */
  val SourcePatterns: Map[String, Seq[String]] = Map(
    "Avito" -> Seq("avito", "ads"),
    "Jumia" -> Seq("jumia", "android", "product"),
    "Electroplanet" -> Seq("electroplanet", "electro"))

  /** S2 — list files in `dir` whose lowercase name contains any pattern of
    * `source`. Driver-side listing (file counts are small even at scale —
    * the bytes are big, not the file names). */
  def discoverFiles(spark: SparkSession, dir: String, source: String): Seq[String] = {
    val patterns = SourcePatterns.getOrElse(source, Seq(source.toLowerCase))
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isFile)
      .map(_.getPath.toString)
      .filter { f =>
        val name = f.substring(f.lastIndexOf('/') + 1).toLowerCase
        name.endsWith(".json") && patterns.exists(name.contains)
      }
      .sorted
  }

  /** S1 — read a JSON file that is either an array (`[...]`) or NDJSON,
    * with an explicit schema; malformed records are dropped (the
    * reference's skip-with-warning). Array-vs-lines is sniffed from the
    * first byte of the first file. */
  def readJsonAuto(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame = {
    if (paths.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val isArray = {
      val p = new Path(paths.head)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try {
        var c = in.read()
        while (c != -1 && Character.isWhitespace(c)) c = in.read()
        c == '['
      } finally in.close()
    }
    spark.read
      .option("multiLine", isArray.toString)
      .option("mode", "DROPMALFORMED")
      .schema(schema)
      .json(paths: _*)
  }

  /** S3 — scrub float-NaN and the literal strings "nan"/"none"/"null"
    * (case-insensitive) to real nulls across every string column
    * (ref M/data/raw/clean_avito_data.py:11-25). */
  def scrubNaNStrings(df: DataFrame): DataFrame = {
    val cleaned = df.schema.fields.map {
      case f if f.dataType == StringType =>
        when(lower(trim(col(f.name))).isin("nan", "none", "null"), lit(null))
          .otherwise(col(f.name)).as(f.name)
      case f => col(f.name)
    }
    df.select(cleaned.toIndexedSeq: _*)
  }

  /** Convenience: discover + read + scrub one source. */
  def loadSource(spark: SparkSession, dir: String, source: String,
                 schema: StructType): DataFrame =
    scrubNaNStrings(readJsonAuto(spark, schema, discoverFiles(spark, dir, source)))
}
