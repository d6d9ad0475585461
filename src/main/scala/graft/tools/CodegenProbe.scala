package graft.tools

import graft.pipeline.MarketEyePipeline
import graft.operators.ProductMerge
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe: which EP1 stage's whole-stage-codegen exceeds the JVM
  * 64 KB method limit? Runs each pipeline stage with
  * spark.sql.codegen.fallback=false so an oversized generated method
  * THROWS (instead of Spark silently de-optimizing that stage to
  * interpreted mode, which is what the ERROR CodeGenerator lines in the
  * test log are). Not part of the library surface. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.hugeMethodLimit", "65535")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = Files.createTempDirectory("cgprobe_raw").toString
    def write(name: String, content: String): Unit =
      Files.write(Paths.get(raw, name), content.getBytes(StandardCharsets.UTF_8))
    // the PipelineSpec EP1 miniature fixtures
    write("avito_ads.json",
      """[
        |{"ad_id":"1","title":"Samsung Galaxy S24 Ultra 512GB","price":"8.500,00","city":"Casablanca","area":"Maarif","seller_type":"STORE","seller_name":"Store1","url":"https://www.avito.ma/vi/1.htm","list_time":"2026-01-01T10:00:00","brand":"SAMSUNG","model":"S24 ULTRA","storage":"512GB","ram":"12GB","condition":"NEUF"},
        |{"ad_id":"2","title":"iPhone 13 occasion","price":"4500 DH","city":"Rabat","brand":"NULL","model":"NULL","condition":"bon état"},
        |{"ad_id":"3","title":"Telephone pas cher","price":"NULL","brand":null,"model":null}
        |]""".stripMargin)
    write("jumia_products.json",
      """{"title":"Samsung Galaxy S24 Ultra","brand":"Samsung","price":"13,875 MAD","old_price":"15,000 MAD","rating":"4.5 out of 5","reviews_count_text":"(2 avis)","product_url":"https://www.jumia.ma/s24.html","scraped_at":"2026-01-01 09:00:00","description":"256 Go 12 Go RAM","specs":{"Stockage":"512 Go"}}
        |{"title":"Xiaomi Redmi Note 12","brand":"Xiaomi","price":"2,199 MAD","product_url":"https://www.jumia.ma/rn12.html","scraped_at":"2026-01-01 09:00:00","description":"128 Go"}""".stripMargin)
    write("electroplanet_data.json",
      """[
        |{"product_url":"https://www.electroplanet.ma/p1.html","name":"SAMSUNG GALAXY S24 ULTRA 12GB","brand":"Samsung","price":"9 490 DH","old_price":"9 990 DH","is_promotion":true,"category":"android","store":"Electroplanet","scraped_at":"2026-01-01 02:21:12","detailed_scraped_at":"2026-01-01 02:22:20","specifications":{"Marque":"SAMSUNG","Modèle":"S24 ULTRA","Capacité de stockage interne":"512 Go","Capacité de la RAM":"12 Go"},"reviews_summary":{"average_rating":"20","total_reviews":1},"view_count":4}
        |]""".stripMargin)

    val cfg = MarketEyePipeline.Config(rawDir = raw, outDir = raw + "/out",
      runTs = "20260101_120000")

    def probe(name: String)(df: => DataFrame): Unit =
      try {
        val d = df
        d.write.format("noop").mode("overwrite").save()
        System.err.println(s"[cgprobe] $name: OK (${d.queryExecution.executedPlan.getClass.getSimpleName})")
      } catch {
        case e: Throwable =>
          var c = e; while (c.getCause != null && !c.getMessage.contains("64 KB")) c = c.getCause
          System.err.println(s"[cgprobe] $name: FAIL ${c.getClass.getSimpleName}: ${String.valueOf(c.getMessage).take(200)}")
      }

    val srcs = cfg.sourceOrder.map(s => s -> MarketEyePipeline.extract(spark, cfg, s)).toMap
    srcs.foreach { case (n, df) => probe(s"extract_$n")(df) }
    // name every CodegenFallback expression per source (what kicks a
    // projection out of whole-stage codegen)
    srcs.foreach { case (n, df) =>
      val fb = df.queryExecution.executedPlan.flatMap(_.expressions.flatMap(_.collect {
        case e: org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback => e
      })).map(e => e.getClass.getSimpleName).groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
      System.err.println(s"[cgprobe] fallback_$n: ${fb.mkString(", ")}")
    }
    System.err.println("[cgprobe] jumia plan:\n" +
      srcs("Jumia").queryExecution.executedPlan.treeString.linesIterator
        .map(_.take(110)).mkString("\n"))
    val unified = srcs.values.reduce(_ unionByName _)
    probe("unified")(unified)
    probe("merged")(ProductMerge.merge(unified, cfg.sourceOrder, true, true));
    { val m = ProductMerge.merge(unified, cfg.sourceOrder, true, true)
      val opt = m.queryExecution.optimizedPlan
      opt.collect { case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        System.err.println(s"[cgprobe] Filter cond size=${f.condition.toString.length} refs=${f.condition.references.map(_.name).mkString(",").take(200)}")
      }
      System.err.println("[cgprobe] plan nodes: " + opt.collect{case n => n.nodeName}.mkString(" / "))
    }
    spark.stop()
  }
}
