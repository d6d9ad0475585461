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

  // ---- real HTTP transport, end-to-end against an in-process Ollama stub ----

  /** Starts a com.sun.net.httpserver on an ephemeral port serving `handler`
    * at /api/generate; returns (endpoint, stop). */
  private def withServer(handler: com.sun.net.httpserver.HttpExchange => Unit)(
      body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/generate", (ex: com.sun.net.httpserver.HttpExchange) =>
      try handler(ex) finally ex.close())
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/api/generate")
    finally server.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  test("Z7: OllamaTransport round-trips /api/generate JSON through enrich") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val seenPrompts = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    withServer { ex =>
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      // contract: model + prompt + stream:false, exactly the Ollama shape
      assert(req.get("model").asText() == "llama3")
      assert(!req.get("stream").asBoolean())
      seenPrompts.add(req.get("prompt").asText())
      respond(ex, 200,
        mapper.createObjectNode()
          .put("response", s"ANALYSE[${req.get("prompt").asText()}]")
          .put("done", true).toString)
    } { endpoint =>
      val df = Seq(("p1", 100.0), ("p2", 200.0)).toDF("product_id", "price")
      val out = LlmEnrich.enrich(df, "ollama_analysis",
        r => s"Analyse ${r.getString(0)}",
        new LlmEnrich.OllamaTransport(endpoint, "llama3", 5000),
        maxPerSecond = 0).collect().sortBy(_.getString(0))
      assert(out.map(_.getString(2)).toSeq ==
        Seq("ANALYSE[Analyse p1]", "ANALYSE[Analyse p2]"))
      assert(seenPrompts.size == 2)
    }
  }

  test("Z7: OllamaTransport timeout degrades to the reference's error-string row") {
    withServer { ex =>
      Thread.sleep(2000) // longer than the client timeout below
      respond(ex, 200, """{"response":"too late"}""")
    } { endpoint =>
      val df = Seq(("p1", 1.0)).toDF("product_id", "price")
      val out = LlmEnrich.enrich(df, "a", _ => "x",
        new LlmEnrich.OllamaTransport(endpoint, "llama3", timeoutMillis = 200),
        maxPerSecond = 0).collect()
      // java.net.http throws HttpTimeoutException("request timed out")
      assert(out(0).getString(2).startsWith("Erreur: HttpTimeoutException"))
    }
  }

  test("Z7: OllamaTransport malformed / non-2xx responses degrade per-row") {
    val cases = Seq(
      (200, """{"done": true}""", "missing text 'response' field"),
      (200, """not json at all""", "unparsable Ollama response"),
      (500, """{"error":"boom"}""", "HTTP 500"))
    for ((code, body, expectSubstr) <- cases) {
      withServer { ex => respond(ex, code, body) } { endpoint =>
        val df = Seq(("p1", 1.0)).toDF("product_id", "price")
        val out = LlmEnrich.enrich(df, "a", _ => "x",
          new LlmEnrich.OllamaTransport(endpoint, "llama3", 5000),
          maxPerSecond = 0).collect()
        val v = out(0).getString(2)
        assert(v.startsWith("Erreur: IOException"), s"got: $v")
        assert(v.contains(expectSubstr), s"got: $v")
      }
    }
  }

  test("Z7: OllamaTransport survives serialization (executor-side lazy client)") {
    val t = new LlmEnrich.OllamaTransport("http://127.0.0.1:1/api/generate")
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(t)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
    assert(back.isInstanceOf[LlmEnrich.OllamaTransport])
  }
}
