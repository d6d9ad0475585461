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
  * without paying a content hash of 100 TB. Optionally (set
  * `SPARK_GRAFT_PAIR_DIGEST=1`) the manifest also records an
  * order-insensitive ID-SET DIGEST — bit_xor of xxhash64(id), computed
  * in the SAME pruned scan as the count ([[countAndDigest]]) — which
  * additionally catches a corpus edited in place at CONSTANT row count
  * whenever the edit churns the id set (regenerated snapshots, appended
  * + trimmed corpora). The digest is a staleness tripwire, not a
  * content hash: an edit that only rewrites payloads under unchanged
  * ids, or that swaps PAIRS of duplicate ids (xor cancellation), still
  * passes — for those, clearing the cache dir when the snapshot changes
  * remains the caller's contract. Off by default because it forces the
  * id column to actually be read (a bare count over parquet does not).
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
           corpusRows: Long, dataName: String,
           idDigest: Option[Long] = None): Option[DataFrame] = {
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
      // a digest-carrying caller refuses BOTH a mismatching digest and a
      // manifest written without one (the old artifact's id set was
      // never attested — recompute rather than trust it); a caller
      // without a digest ignores the field, so digest-on and digest-off
      // processes interoperate in the safe direction only
      val digestOk = idDigest.forall(d =>
        manifest.contains(s""""id_digest":$d,"""))
      if (keyOk && countOk && digestOk) Some(sess.read.parquet(dataPath.toString))
      else None // md5 collision, stale snapshot, or id-set churn
    } else None
  }

  /** Load the artifact for `key` from `root` if its manifest matches
    * (key + corpusRows); otherwise run `compute`, persist, commit the
    * manifest, and return the read-back frame (so the caller's lineage
    * is the parquet scan either way). */
  def loadOrCompute(sess: SparkSession, root: String, key: String,
                    corpusRows: Long, dataName: String,
                    idDigest: Option[Long] = None)
                   (compute: => DataFrame): DataFrame = {
    val dir = new Path(root, md5(key))
    val fs = dir.getFileSystem(sess.sparkContext.hadoopConfiguration)
    val manifestPath = new Path(dir, "manifest.json")
    val dataPath = new Path(dir, dataName)
    load(sess, root, key, corpusRows, dataName, idDigest).getOrElse {
      compute.write.mode("overwrite").parquet(dataPath.toString)
      // manifest LAST and atomically (temp + rename): its presence is the
      // commit marker a concurrent reader keys on — never visible over a
      // half-written artifact, never itself readable half-written
      val tmpPath = new Path(dir, s".manifest.json.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmpPath, true)
      val digestField = idDigest.map(d => s""""id_digest":$d,""").getOrElse("")
      try out.write(
        (s"""{"key":${quote(key)},"corpus_rows":$corpusRows,$digestField""" +
          s""""created_ms":${System.currentTimeMillis()}}""").getBytes("UTF-8"))
      finally out.close()
      fs.delete(manifestPath, false)
      if (!fs.rename(tmpPath, manifestPath))
        throw new java.io.IOException(
          s"artifact-cache manifest rename failed: $tmpPath -> $manifestPath")
      sess.read.parquet(dataPath.toString)
    }
  }

  /** Whether callers should attest the id set (env SPARK_GRAFT_PAIR_DIGEST
    * or -Dgraft.pair.digest; "1"/"on"). One switch for every artifact
    * family so a pipeline can't half-enable it. */
  def idDigestEnabled: Boolean =
    sys.props.get("graft.pair.digest")
      .orElse(sys.env.get("SPARK_GRAFT_PAIR_DIGEST"))
      .exists(v => v == "1" || v == "on")

  /** Corpus row count + (when [[idDigestEnabled]]) the order-insensitive
    * id-set digest, in ONE column-pruned scan — callers were already
    * paying the count scan; the digest rides the same aggregate. bit_xor
    * of xxhash64(id) is partition-order-independent (xor commutes), so
    * the digest is a pure function of the id multiset's odd-count
    * elements regardless of layout. */
  def countAndDigest(df: DataFrame, idCol: String): (Long, Option[Long]) = {
    import org.apache.spark.sql.functions._
    if (!idDigestEnabled) (df.select(idCol).count(), None)
    else {
      val r = df.select(col(idCol))
        .agg(count(lit(1)), bit_xor(xxhash64(col(idCol)))).head()
      (r.getLong(0), Some(if (r.isNullAt(1)) 0L else r.getLong(1)))
    }
  }

  private def md5(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
