package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Z7 — per-row LLM enrichment, generalizing the reference's Ollama call
  * (localhost:11434, 30 s timeout; every committed artifact row carries the
  * timeout error string — top_anomalies_ollama_20260102_201927.csv).
  *
  * Engine shape, designed for scale:
  *   - `mapPartitions`, NOT a UDF: one client per partition (connection
  *     reuse), explicit per-partition rate limiting, and the analysis
  *     column appended without breaking columnar lineage upstream.
  *   - Failures degrade to an error string in the column (the reference's
  *     observed behavior), never a task failure — a flaky enrichment
  *     service cannot kill a 100 TB job.
  *   - Intended use is on a top-K frame (T5): enrich AFTER ranking and
  *     limiting, so the expensive service sees K rows, not the corpus.
  *
  * The transport is pluggable; the default [[StubTransport]] is
  * deterministic and offline (this environment has no model server). A
  * real transport implements one method; the operator's plan shape does
  * not change.
  */
object LlmEnrich {

  /** One enrichment call: prompt in, analysis out (or throw). Must be
    * Serializable — instantiated per partition on executors. */
  trait Transport extends Serializable {
    def complete(prompt: String): String
  }

  /** Deterministic offline stand-in: echoes a digest of the prompt.
    * Mirrors the artifact shape where every row got a fixed string. */
  class StubTransport extends Transport {
    override def complete(prompt: String): String =
      s"[stub-analysis ${java.util.UUID.nameUUIDFromBytes(prompt.getBytes("UTF-8"))}]"
  }

  /** The reference's observed failure value (timeout after 30 s). */
  def errorString(e: Throwable): String =
    s"Erreur: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"

  /** Real HTTP transport speaking the Ollama `/api/generate` contract the
    * reference pipeline used (localhost:11434, 30 s read timeout — every row
    * of `top_anomalies_ollama_20260102_201927.csv` carries the resulting
    * timeout error string, which is how we know the exact endpoint/timeout).
    *
    * Request:  `POST {"model": m, "prompt": p, "stream": false}`
    * Response: `{"response": "<analysis>", ...}` — anything else (non-2xx,
    * missing/non-text `response` field, unparsable body) throws, and
    * [[enrich]] degrades the row to [[errorString]] exactly like the
    * reference run did.
    *
    * Serializable-by-construction: the `HttpClient` is `@transient lazy`,
    * so each executor builds its own client on first use and reuses it for
    * every row in the partition (connection pooling lives in the client).
    */
  class OllamaTransport(endpoint: String = "http://localhost:11434/api/generate",
                        model: String = "llama3",
                        timeoutMillis: Long = 30000L) extends Transport {
    @transient private lazy val timeout = java.time.Duration.ofMillis(timeoutMillis)
    @transient private lazy val client =
      java.net.http.HttpClient.newBuilder().connectTimeout(timeout).build()
    @transient private lazy val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()

    override def complete(prompt: String): String = {
      val body = mapper.createObjectNode()
      body.put("model", model)
      body.put("prompt", prompt)
      body.put("stream", false)
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
        .timeout(timeout)
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          mapper.writeValueAsString(body), java.nio.charset.StandardCharsets.UTF_8))
        .build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $endpoint")
      val node =
        try mapper.readTree(resp.body())
        catch { case e: com.fasterxml.jackson.core.JacksonException =>
          throw new java.io.IOException(s"unparsable Ollama response: ${e.getMessage}") }
      val r = node.get("response")
      if (r == null || !r.isTextual)
        throw new java.io.IOException("malformed Ollama response: missing text 'response' field")
      r.asText()
    }
  }

  /** Transport selection from the environment — how a deployment turns on
    * the real service without a code change: `GRAFT_OLLAMA_URL` set → the
    * real [[OllamaTransport]] (model from `GRAFT_OLLAMA_MODEL`, default
    * llama3; reference timeout); unset → the deterministic offline stub.
    * Injectable env map for tests. */
  def transportFromEnv(env: Map[String, String] = sys.env): Transport =
    env.get("GRAFT_OLLAMA_URL") match {
      case Some(url) =>
        new OllamaTransport(url, env.getOrElse("GRAFT_OLLAMA_MODEL", "llama3"))
      case None => new StubTransport
    }

  /** Append `outputCol` by calling the transport once per row, rate-limited
    * to `maxPerSecond` calls per partition. `promptFor` renders the prompt
    * from the full row (driver-side closure, serialized to executors). */
  def enrich(df: DataFrame, outputCol: String,
             promptFor: Row => String,
             transport: Transport = new StubTransport,
             maxPerSecond: Double = 2.0): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outputCol, StringType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val minIntervalNanos = if (maxPerSecond <= 0) 0L else (1e9 / maxPerSecond).toLong
    df.mapPartitions { rows =>
      var lastCall = 0L
      rows.map { row =>
        if (minIntervalNanos > 0) {
          val now = System.nanoTime()
          val wait = lastCall + minIntervalNanos - now
          if (wait > 0) Thread.sleep(wait / 1000000L, (wait % 1000000L).toInt)
          lastCall = System.nanoTime()
        }
        // NonFatal only: OutOfMemoryError / task-kill interrupts must
        // propagate, or they'd block cancellation disguised as data values
        val analysis =
          try transport.complete(promptFor(row))
          catch { case scala.util.control.NonFatal(e) => errorString(e) }
        Row.fromSeq(row.toSeq :+ analysis)
      }
    }(enc)
  }
}
