package graft.schema

import org.apache.spark.sql.types._

/** Schemas of the marketeye data model.
  *
  * Raw source schemas are declared explicitly (schema-on-read): inference is
  * nondeterministic at scale and the reference's defensive `dict.get`
  * semantics are exactly "missing column → null". Shapes reconstructed from
  * the reference's extractors and committed samples (FIXTURES.md; master
  * template at M/scripts/data_processors/base_extractor.py:17-30).
  */
object Schemas {

  /** One offer inside a unified product document
    * (ref: base_extractor.py:24, avito_extractor.py:47-60). */
  val offerStruct: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("price", DoubleType),
    StructField("original_price", DoubleType),
    StructField("currency", StringType),
    StructField("condition", StringType),
    StructField("seller_type", StringType),
    StructField("city", StringType),
    StructField("area", StringType),
    StructField("rating", StringType),        // heterogeneous: float or raw string
    StructField("reviews_count", StringType), // unparsed on purpose
    StructField("url", StringType),
    StructField("seller_name", StringType),
    StructField("scraped_at", StringType)     // ISO string, heterogeneous formats
  ))

  /** Unified "master product" document
    * (ref: base_extractor.py:17-30). */
  val productStruct: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("brand", StringType),
    StructField("model", StringType),
    StructField("product_name", StringType),
    StructField("category", StringType),
    StructField("specifications", MapType(StringType, StringType)),
    StructField("offers", ArrayType(offerStruct)),
    StructField("sources", ArrayType(StringType)),
    StructField("created_at", StringType),
    StructField("last_updated", StringType)
  ))

  /** Raw Avito classified record (FIXTURES.md §1; fields read at
    * avito_extractor.py:19-84). */
  val avitoSchema: StructType = StructType(Seq(
    StructField("ad_id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("price", StringType),
    StructField("city", StringType),
    StructField("area", StringType),
    StructField("seller_type", StringType),
    StructField("seller_name", StringType),
    StructField("category", StringType),
    StructField("url", StringType),
    StructField("list_time", StringType),
    StructField("brand", StringType),
    StructField("model", StringType),
    StructField("storage", StringType),
    StructField("ram", StringType),
    StructField("battery_health", StringType),
    StructField("color", StringType),
    StructField("condition", StringType)
  ))

  /** Raw Jumia product record (FIXTURES.md §2; jumia_extractor.py:15-111). */
  val jumiaSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("brand", StringType),
    StructField("price", StringType),
    StructField("old_price", StringType),
    StructField("rating", StringType),
    StructField("reviews_count_text", StringType),
    StructField("product_url", StringType),
    StructField("scraped_at", StringType),
    StructField("description", StringType),
    StructField("specs", MapType(StringType, StringType))
  ))

  /** Raw Electroplanet record (FIXTURES.md §3; committed sample
    * M/data/raw/electroplanet_data.json). */
  val electroplanetSchema: StructType = StructType(Seq(
    StructField("product_url", StringType),
    StructField("name", StringType),
    StructField("brand", StringType),
    StructField("price", StringType),
    StructField("old_price", StringType),
    StructField("is_promotion", BooleanType),
    StructField("category", StringType),
    StructField("store", StringType),
    StructField("scraped_at", StringType),
    StructField("detailed_scraped_at", StringType),
    StructField("description", StringType),
    StructField("specifications", MapType(StringType, StringType)),
    StructField("reviews_summary", StructType(Seq(
      StructField("average_rating", StringType),
      StructField("total_reviews", IntegerType)))),
    StructField("availability", StringType),
    StructField("view_count", IntegerType),
    StructField("sku", StringType)
  ))
}
