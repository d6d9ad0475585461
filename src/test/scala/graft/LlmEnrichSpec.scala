package graft

import graft.operators.LlmEnrich

class LlmEnrichSpec extends SparkSuite {
  import spark.implicits._

  test("Z7: enrichment appends analysis column via per-partition client") {
    val df = Seq(("p1", 100.0), ("p2", 200.0)).toDF("product_id", "price")
    val out = LlmEnrich.enrich(df, "ollama_analysis",
      r => s"Analyse ${r.getString(0)} à ${r.getDouble(1)} MAD",
      maxPerSecond = 0) // no throttle in tests
    val rows = out.collect().sortBy(_.getString(0))
    assert(rows.length == 2)
    assert(rows(0).schema.fieldNames.contains("ollama_analysis"))
    assert(rows(0).getString(2).startsWith("[stub-analysis"))
    // deterministic per prompt
    val again = LlmEnrich.enrich(df, "ollama_analysis",
      r => s"Analyse ${r.getString(0)} à ${r.getDouble(1)} MAD",
      maxPerSecond = 0).collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(2)).toSeq == again.map(_.getString(2)).toSeq)
  }

  test("Z7: transport failure degrades to error string, not task failure") {
    val df = Seq(("p1", 1.0)).toDF("product_id", "price")
    val failing = new LlmEnrich.Transport {
      override def complete(p: String): String =
        throw new java.net.SocketTimeoutException("Read timed out")
    }
    val out = LlmEnrich.enrich(df, "a", _ => "x", failing, maxPerSecond = 0).collect()
    assert(out(0).getString(2) == "Erreur: SocketTimeoutException: Read timed out")
  }
}
