package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride through the engine
  * as opaque `binary` columns with typed metadata extracted by
  * partition-level decoders.
  *
  * Image payloads (PNG/JPEG/GIF/BMP — anything `javax.imageio` has a
  * reader for) are decoded for REAL via [[imageDecode]]: format from the
  * container's magic bytes, width/height from the codec header without
  * materializing pixel rasters. Non-image payloads (audio/video codecs
  * absent from the JDK) fall back to [[stubDecode]], a clearly-marked
  * deterministic stand-in. Either way decode stays a narrow mapPartitions
  * over the scan, so at 100 TB it parallelizes per input split with zero
  * shuffle, and codec init is paid once per partition.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       frames: Int, format: String)

  /** STUB decoder — deterministic fake metadata from payload bytes, used
    * only when no real codec recognizes the payload (this environment has
    * no audio/video libraries). Replace with a real codec; the signature
    * (bytes → meta) is the integration point. */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    def u(i: Int): Int = md(i) & 0xff
    MediaMeta(id, bytes.length,
      width = 64 + u(0) % 192,
      height = 64 + u(1) % 192,
      frames = 1 + u(2) % 30,
      format = if (u(3) % 2 == 0) "png" else "jpeg")
  }

  /** REAL image decoder over `javax.imageio` (public JDK API, no external
    * jars). Reads only the codec header: `ImageReader.getWidth/getHeight`
    * parse dimensions without decoding the raster, so a 50 MB JPEG costs a
    * few KB of I/O — the property that matters when the decode runs inside
    * a 100 TB scan. Returns None when no installed reader claims the bytes
    * (caller falls back to [[stubDecode]]). Frame count comes from
    * `getNumImages` (animated GIF > 1; allowSearch=false keeps it header-only,
    * −1 → report 1). */
  def imageDecode(id: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream: the
    // factory honors ImageIO.getUseCache (default true) and backs every
    // stream with a TEMP FILE on disk (FileCacheImageInputStream) — one
    // create+delete per payload. Measured at sf1 (50k images, 32 threads)
    // that file churn made decode scale at ~1.2 superlinear; the payload
    // is already in memory, so the memory-cached stream is strictly right.
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
          val frames = reader.getNumImages(/*allowSearch=*/ false) match {
            case n if n > 0 => n
            case _          => 1
          }
          Some(MediaMeta(id, bytes.length,
            width = reader.getWidth(0), height = reader.getHeight(0),
            frames = frames,
            format = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } finally reader.dispose()
      }
    } catch {
      // Plugin readers throw RuntimeExceptions (IAE, AIOOBE, NegativeArraySize)
      // on fuzzed/malformed headers, not just IOException — a hostile payload
      // must degrade to the stub, never fail the task.
      case scala.util.control.NonFatal(_) => None
    } finally iis.close()
  }

  /** Decode one payload: real codec first, deterministic stub otherwise. */
  def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta =
    imageDecode(id, bytes).getOrElse(stubDecode(id, bytes))

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
      .mapPartitions { it => it.map { case (id, bytes) => decodeOne(id, bytes) } }
  }

  case class ResizedFeature(doc_id: Long, w: Int, h: Int, px_sum: Long)

  /** Full-raster decode + nearest-neighbor resize + feature hash — the
    * image-preprocessing step of a multimodal training pipeline (resize
    * to model resolution, then embed/checksum). Decodes the ENTIRE
    * raster (unlike [[imageDecode]]'s header-only path), samples a
    * `tw`×`th` nearest-neighbor grid (target pixel (tx,ty) reads source
    * pixel (⌊tx·w/tw⌋, ⌊ty·h/th⌋) — the standard NN convention), and
    * reduces it to a deterministic 24-bit-RGB checksum standing in for
    * the embed step. Narrow mapPartitions over the scan: per-image flat
    * cost, zero shuffle, exactly the m2 decode shape with raster work.
    * Undecodable payloads yield a (-1,-1,-1) row rather than failing the
    * task. Lossless formats only for exactness (JPEG rasters are
    * codec-approximate; PNG/BMP/GIF round-trip bit-exact). */
  def resizeFeature(df: DataFrame, idCol: String = "doc_id",
                    payloadCol: String = "payload",
                    tw: Int = 8, th: Int = 8): Dataset[ResizedFeature] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val img = javax.imageio.ImageIO.read(iis)
            if (img == null) ResizedFeature(id, -1, -1, -1L)
            else {
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0L
              var ty = 0
              while (ty < th) {
                val sy = ty * h / th
                var tx = 0
                while (tx < tw) {
                  sum += (img.getRGB(tx * w / tw, sy) & 0xffffff).toLong
                  tx += 1
                }
                ty += 1
              }
              ResizedFeature(id, w, h, sum)
            }
          } catch {
            case scala.util.control.NonFatal(_) => ResizedFeature(id, -1, -1, -1L)
          } finally {
            // ImageIO.read(ImageInputStream) closes the stream itself on
            // success; only the failure paths leave it open
            try iis.close() catch { case _: java.io.IOException => () }
          }
        }
      }
  }

  case class FrameSample(doc_id: Long, n_frames: Int, n_sampled: Int, px_sum: Long)

  /** Video-style frame sampling: a multi-frame payload → every k-th
    * frame decoded and reduced to a feature checksum. The JDK ships no
    * video codecs (brief-sanctioned stub point), so the CONTAINER is a
    * minimal length-prefixed concatenation of per-frame images — but
    * each sampled frame goes through the REAL ImageIO decode + NN-sample
    * path ([[resizeFeature]]'s core), so the expensive part of the
    * pipeline (raster decode of sampled frames only; skipped frames cost
    * zero decode) is exercised for real. Container format: repeated
    * [4-byte big-endian length][image bytes]. Narrow mapPartitions,
    * zero shuffle, cost ∝ sampled frames. Malformed containers/frames
    * yield sentinel rows, never task failures. */
  def frameSample(df: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload",
                  every: Int = 2, tw: Int = 4, th: Int = 4): Dataset[FrameSample] = {
    import df.sparkSession.implicits._
    require(every > 0, "every must be positive")
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val bb = java.nio.ByteBuffer.wrap(bytes)
            var frames = List.empty[Array[Byte]]
            while (bb.remaining() >= 4) {
              val len = bb.getInt
              if (len < 0 || len > bb.remaining()) throw new java.io.IOException("bad frame length")
              val f = new Array[Byte](len)
              bb.get(f)
              frames ::= f
            }
            if (bb.remaining() != 0) throw new java.io.IOException("trailing bytes")
            val all = frames.reverse.toArray
            var sum = 0L
            var sampled = 0
            var i = 0
            while (i < all.length) {
              val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
                new java.io.ByteArrayInputStream(all(i)))
              try {
                val img = javax.imageio.ImageIO.read(iis)
                if (img == null) throw new java.io.IOException("undecodable frame")
                val (w, h) = (img.getWidth, img.getHeight)
                var ty = 0
                while (ty < th) {
                  val sy = ty * h / th
                  var tx = 0
                  while (tx < tw) { sum += (img.getRGB(tx * w / tw, sy) & 0xffffff).toLong; tx += 1 }
                  ty += 1
                }
              } finally { try iis.close() catch { case _: java.io.IOException => () } }
              sampled += 1
              i += every
            }
            FrameSample(id, all.length, sampled, sum)
          } catch {
            case scala.util.control.NonFatal(_) => FrameSample(id, -1, -1, -1L)
          }
        }
      }
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
