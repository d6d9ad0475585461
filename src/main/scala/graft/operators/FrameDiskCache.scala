package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-process artifact persistence shared by [[PairGraph]] (near-dup
  * pairs) and [[GroupStats]] (the anomaly family's stats table): an
  * artifact directory `<root>/<md5(key)>/` holding the parquet data and
  * a JSON manifest recording the full cache key and the corpus row count
  * it was computed from. On a cluster this would be a table in the
  * lakehouse keyed by corpus snapshot id; here it is a directory.
  *
  * Staleness: the manifest's `corpus_rows` is re-validated on load — a
  * cheap one-column scan (the caller supplies the count) that catches
  * the common case of data regenerated in place at a different size,
  * without paying a content hash of 100 TB. A corpus EDITED at constant
  * row count under an unchanged key is the caller's contract violation:
  * clear the cache dir when the snapshot changes.
  *
  * Concurrency: SINGLE WRITER per key (a pipeline materializes each
  * corpus snapshot's artifact once); concurrent readers are safe — the
  * manifest is written via temp-file + atomic rename AFTER the parquet
  * commit, so a reader either sees the complete artifact or no manifest
  * at all. An md5 collision or key mismatch recomputes rather than
  * serving the wrong artifact.
  */
private[graft] object FrameDiskCache {

  /** Load-only: the artifact for `key` if a committed, key- and
    * row-count-matching manifest exists; None otherwise (never computes).
    * Lets a DERIVED tier serve itself as a projection of a richer
    * persisted artifact — e.g. the moments tier off a full stats table
    * another process materialized — without adopting the richer tier's
    * compute obligation on a miss. */
  def load(sess: SparkSession, root: String, key: String,
           corpusRows: Long, dataName: String): Option[DataFrame] = {
    val dir = new Path(root, md5(key))
    val fs = dir.getFileSystem(sess.sparkContext.hadoopConfiguration)
    val manifestPath = new Path(dir, "manifest.json")
    val dataPath = new Path(dir, dataName)
    if (fs.exists(manifestPath) && fs.exists(dataPath)) {
      val in = fs.open(manifestPath)
      val manifest = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val keyOk = manifest.contains("\"key\":" + quote(key))
      val countOk = manifest.contains(s""""corpus_rows":$corpusRows,""")
      if (keyOk && countOk) Some(sess.read.parquet(dataPath.toString))
      else None // md5 collision or stale snapshot
    } else None
  }

  /** Load the artifact for `key` from `root` if its manifest matches
    * (key + corpusRows); otherwise run `compute`, persist, commit the
    * manifest, and return the read-back frame (so the caller's lineage
    * is the parquet scan either way). */
  def loadOrCompute(sess: SparkSession, root: String, key: String,
                    corpusRows: Long, dataName: String)
                   (compute: => DataFrame): DataFrame = {
    val dir = new Path(root, md5(key))
    val fs = dir.getFileSystem(sess.sparkContext.hadoopConfiguration)
    val manifestPath = new Path(dir, "manifest.json")
    val dataPath = new Path(dir, dataName)
    load(sess, root, key, corpusRows, dataName).getOrElse {
      compute.write.mode("overwrite").parquet(dataPath.toString)
      // manifest LAST and atomically (temp + rename): its presence is the
      // commit marker a concurrent reader keys on — never visible over a
      // half-written artifact, never itself readable half-written
      val tmpPath = new Path(dir, s".manifest.json.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmpPath, true)
      try out.write(
        (s"""{"key":${quote(key)},"corpus_rows":$corpusRows,""" +
          s""""created_ms":${System.currentTimeMillis()}}""").getBytes("UTF-8"))
      finally out.close()
      fs.delete(manifestPath, false)
      if (!fs.rename(tmpPath, manifestPath))
        throw new java.io.IOException(
          s"artifact-cache manifest rename failed: $tmpPath -> $manifestPath")
      sess.read.parquet(dataPath.toString)
    }
  }

  private def md5(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
