package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride through the engine
  * as opaque `binary` columns with typed metadata extracted by
  * partition-level decoders.
  *
  * The Spark-side plumbing is real — schema, batched per-partition
  * processing, deterministic output — while the actual codec call is a
  * clearly-marked STUB (no image/audio libraries in this environment): it
  * derives fake-but-deterministic dimensions from the payload bytes.
  * Swapping `stubDecode` for a real decoder (JNI/ONNX/javacv) changes no
  * plan shape: decode stays a narrow mapPartitions over the scan, so at
  * 100 TB it parallelizes per input split with zero shuffle.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       frames: Int, format: String)

  /** STUB decoder — deterministic fake metadata from payload bytes.
    * Replace with a real codec; the signature (bytes → meta) is the
    * integration point. */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def u(i: Int): Int = md(i) & 0xff
    MediaMeta(id, bytes.length,
      width = 64 + u(0) % 192,
      height = 64 + u(1) % 192,
      frames = 1 + u(2) % 30,
      format = if (u(3) % 2 == 0) "png" else "jpeg")
  }

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of a
    * text column standing in for real media bytes). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8").cast("binary"))

  /** Decode payloads per partition in batches. One narrow stage: the
    * decoder sees an iterator per input split, so codec init cost is paid
    * once per partition, not per row (the mapInPandas batch-shape
    * equivalent for a JVM decoder). */
  def decodeMeta(df: DataFrame, idCol: String = "doc_id",
                 payloadCol: String = "payload"): Dataset[MediaMeta] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => stubDecode(id, bytes) } }
  }

  /** Column-expression twin of the stub decode (codegen'd; used by the
    * oracle-verified m1_multimodal_meta query). */
  def metaColumns(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    val hv = (i: Int) => conv(substring(h, i, 2), 16, 10).cast("long")
    df.select(col(idCol), octet_length(col(textCol)).as("n_bytes"),
      (hv(1) % 192 + 64).as("width"), (hv(3) % 192 + 64).as("height"),
      (hv(5) % 30 + 1).as("frames"))
  }
}
