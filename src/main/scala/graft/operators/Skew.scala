package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the failure mode that appears only at
  * scale (one marketplace brand with 10⁹ offers melts a single reducer).
  * AQE's skew-join splitting covers sort-merge joins at runtime; these
  * helpers cover the aggregation side and broadcast-replicated joins, and
  * work on any Spark version/plan.
  *
  * Salts derive from xxhash64 of payload columns, never rand(): plans stay
  * deterministic and re-runnable (speculative re-execution of a task must
  * produce identical rows).
  */
object Skew {

  /** Deterministic salt in [0, buckets) from the given columns. */
  def saltFrom(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase salted aggregation for algebraic aggregates: phase 1
    * pre-aggregates per (keys, salt) — spreading each hot key over
    * `buckets` reducers — phase 2 combines per keys.
    *
    * `partial` defines the per-salt aggregates; `merge` combines the
    * partial columns (e.g. partial count → sum of counts). Both phases are
    * plain hash aggregations with map-side combine.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltSource: Seq[String],
                      buckets: Int,
                      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      saltFrom(buckets, saltSource.map(col): _*))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for a skewed fact side against a small-ish build
    * side: the fact side gets a deterministic salt; the build side is
    * replicated `buckets`× with an exploded salt column, so one hot key
    * spreads over `buckets` reducers. For genuinely small build sides
    * prefer plain `broadcast()`; this is for the middle ground where the
    * build side exceeds the broadcast threshold but a hot fact key would
    * otherwise serialize. */
  def saltedJoin(fact: DataFrame, build: DataFrame, keys: Seq[String],
                 buckets: Int, saltSource: Seq[String]): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      saltFrom(buckets, saltSource.map(col): _*))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFact.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
