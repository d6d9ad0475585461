package graft

import graft.pipeline.StageRunner
import java.nio.file.{Files, Paths}

/** Drives the per-stage CLI exactly as the Airflow DAG would: one
  * StageRunner.main invocation per task, handoff through stage dirs. */
class StageRunnerSpec extends SparkSuite {

  test("staged pipeline: extract x3 -> merge -> stats -> anomalies -> load") {
    // ensure the shared test session exists first (StageRunner getOrCreate
    // reuses it instead of building a default-config one)
    spark.sparkContext
    val raw = tempDir("stage_raw")
    val stageDir = tempDir("stage_mid")
    val out = tempDir("stage_out")
    Files.write(Paths.get(raw, "avito_ads.json"),
      """[{"ad_id":"1","title":"Samsung Galaxy S24 Ultra","price":"8500 DH","brand":"SAMSUNG","model":"S24 ULTRA","condition":"NEUF","list_time":"t","url":"https://www.avito.ma/vi/1.htm"}]""".getBytes("UTF-8"))
    Files.write(Paths.get(raw, "jumia_products.json"),
      """{"title":"Samsung Galaxy S24 Ultra","brand":"Samsung","price":"9,000 MAD","product_url":"https://www.jumia.ma/s24.html","scraped_at":"t"}""".getBytes("UTF-8"))
    Files.write(Paths.get(raw, "electro_list.json"),
      """[{"product_url":"https://www.electroplanet.ma/p1.html","name":"XIAOMI REDMI NOTE 12","brand":"Xiaomi","price":"2 199 DH","store":"Electroplanet","scraped_at":"t","specifications":{"Modèle":"REDMI NOTE 12"},"reviews_summary":{"average_rating":"20","total_reviews":1}}]""".getBytes("UTF-8"))

    StageRunner.main(Array("extract_avito", raw, stageDir, "20260101_000000"))
    StageRunner.main(Array("extract_jumia", raw, stageDir, "20260101_000000"))
    StageRunner.main(Array("extract_electroplanet", raw, stageDir, "20260101_000000"))
    StageRunner.main(Array("merge", stageDir))
    StageRunner.main(Array("stats", stageDir))
    StageRunner.main(Array("anomalies", stageDir))
    StageRunner.main(Array("load", stageDir, out, "20260101_000000"))

    val merged = spark.read.parquet(s"$stageDir/merged").collect()
    assert(merged.length == 2) // s24 merged across avito+jumia, redmi from electro
    val s24 = merged.find(_.getAs[String]("product_id") == "samsung_s24ultra").get
    assert(s24.getSeq[String](s24.fieldIndex("sources")).toSet == Set("Avito", "Jumia"))
    val statsJson = spark.read.json(s"$stageDir/statistics").collect()(0)
    assert(statsJson.getAs[Long]("total_products") == 2)
    assert(statsJson.getAs[Long]("total_offers") == 3)
    assert(Files.list(Paths.get(out, "marketeye_final")).count() > 0)
    assert(Files.list(Paths.get(out, "relational", "offers")).count() > 0)
  }
}
