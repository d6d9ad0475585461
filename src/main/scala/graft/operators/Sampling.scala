package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * rand()-based sampling is non-reproducible across runs, partitionings,
  * and engines; these operators derive the keep/drop decision from a
  * portable hash of the row id, so the SAME rows are sampled on every
  * run, on any cluster, and in any engine that has md5 — which is what
  * makes a downsampled corpus auditable and a sampling step
  * oracle-verifiable.
  */
object Sampling {

  /** Deterministic bucket in [0, 100): value of the first 4 hex chars of
    * md5(id) mod 100. Portable (the d3/m1 hex-math pattern recomputes it
    * in SQL engines without conv()). */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** Uniform p-percent sample: keep rows whose bucket < p. */
  def uniform(df: DataFrame, idCol: String, percent: Int): DataFrame =
    df.where(hashBucket(col(idCol)) < percent)

  /** Stratified downsampling at per-stratum percentage rates (e.g.
    * rebalancing languages or sources in a training mix). A pure filter:
    * no shuffle, no rand(), runs inside the scan stage at any scale. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Int], defaultRate: Int): DataFrame = {
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((k, v), fb) =>
      when(col(strataCol) === k, lit(v)).otherwise(fb)
    }
    df.where(hashBucket(col(idCol)) < rate)
  }

  /** Per-key cap (domain balancing): keep at most `cap` rows per key,
    * chosen by a deterministic md5 order over the row id (salted so the
    * order is independent of [[hashBucket]]'s buckets — capping and
    * sampling must not correlate). Keeps the assigned rank `rn` so the
    * selection is auditable. One shuffle on the key; rows of one key sort
    * on a single task, so pre-reduce pathological heavy hitters with
    * [[uniform]] before capping (see the x12 catalog note). */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(concat(lit("cap:"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= cap)
  }
}
