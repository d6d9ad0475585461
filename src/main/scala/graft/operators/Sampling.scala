package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
