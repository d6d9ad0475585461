package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group price-anomaly detection, re-engineered from the reference's
  * committed artifacts (SURVEY.md §2.8, Z1–Z6):
  *
  *   - group offers by a product key, require a minimum group size (Z6);
  *   - per group: mean / sample-std / median / count / min / max (Z2);
  *   - per offer: deviation_percent = |p−μ|/μ·100, z_score = |p−μ|/σ (Z3);
  *   - classify trop_haut / trop_bas (Z4); two pluggable flagging rules:
  *     z-score (k·σ, the 18:42 reference run) and IQR fences (the 20:19
  *     run's distribution-shaped rule).
  *
  * Scale notes: group stats are a hash AGGREGATION joined back to the
  * offers, not a window. A whole-partition window must hash-partition AND
  * fully sort every offer row by the group key before emitting anything;
  * the aggregation combines map-side (the shuffle carries one partial per
  * group per task, not every row), and AQE picks broadcast vs shuffle for
  * the join-back from the stats table's actual size (unbounded at corpus
  * scale — never force broadcast). Sums run in decimal (exact,
  * order-insensitive) then cast to double, so results are deterministic
  * under any partitioning — required both for the DuckDB oracle
  * hash-match and for reproducible runs on a 1000-executor cluster.
  */
object Anomaly {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Join per-group aggregates back onto the rows NULL-SAFELY: groupBy
    * forms a group for null keys (and the window formulation these
    * join-backs replaced computed stats over null key partitions too), so
    * the join must not silently drop null-keyed rows the way
    * `join(stats, keys)`'s null-unsafe equality would — a null brand/model
    * is ordinary scrape data, not an error.
    *
    * Implementation splits by null pattern rather than using one
    * EqualNullSafe join: `<=>` keys compile to `coalesce(k,0)/isnull(k)`
    * composite join keys on BOTH sides, which skewed the planner into
    * broadcasting the O(corpus) offers side at sf0.1 (BuildLeft over
    * 600k rows) — exactly the side that must never be broadcast at scale.
    * The all-keys-non-null rows (the overwhelming majority) take a plain
    * equi-join whose small aggregated build side broadcasts naturally;
    * rows with any null key null-safe-join the few null-pattern groups.
    * The union is row-for-row the EqualNullSafe result: a non-null-keyed
    * row can't match a null-pattern group under `<=>` and vice versa. */
  private[graft] def joinBackNullSafe(rows: DataFrame, stats: DataFrame,
                                      keys: Seq[String]): DataFrame = {
    val renamed = keys.foldLeft(stats)((d, k) => d.withColumnRenamed(k, "__g_" + k))
    val gCols = keys.map(k => col("__g_" + k))
    val eqCond = keys.map(k => col(k) === col("__g_" + k)).reduce(_ && _)
    val nsCond = keys.map(k => col(k) <=> col("__g_" + k)).reduce(_ && _)
    val anyNullRow = keys.map(col(_).isNull).reduce(_ || _)
    val anyNullGroup = gCols.map(_.isNull).reduce(_ || _)
    val main = rows.join(renamed.where(!anyNullGroup), eqCond)
    val nullKeyed = rows.where(anyNullRow).join(renamed.where(anyNullGroup), nsCond)
    main.unionByName(nullKeyed).drop(keys.map("__g_" + _): _*)
  }

  /** The family's MOMENT aggregate alone (n, exact decimal sums of p and
    * p²) — one hash-agg pass, map-side combinable. */
  def momentStats(df: DataFrame, keys: Seq[String], priceCol: String): DataFrame = {
    val p = col(priceCol)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_offers"),
        sum(dec(p)).cast("double").as("s1x"),
        sum(dec(p) * dec(p)).cast("double").as("s2x"))
  }

  /** The FUSED per-group stats table the whole anomaly family consumes —
    * moments (n, Σp, Σp² as exact decimals), extrema, and exact quartiles
    * (q1/median/q3) in ONE aggregation pass over the offers. The
    * reference's two committed anomaly runs (the 18:42 z-score and 20:19
    * IQR artifacts) consumed one shared stats table; at 100 TB the
    * corpus-wide group aggregation is the family's whole cost, so it must
    * be paid once, not once per rule (z-score, IQR, group report, top-K
    * deviation all diverge only AFTER this table). Quartiles are exact
    * (per-group value buffers — what the IQR rule pays anyway); the
    * moments ride along at negligible cost. Values are identical to the
    * per-consumer aggregates this fuses: same aggregate functions, same
    * decimal casts, order-insensitive. */
  def fullStats(df: DataFrame, keys: Seq[String], priceCol: String): DataFrame = {
    val p = col(priceCol)
    // ONE percentile buffer for all three quartiles: percentile(p, array)
    // shares a single per-group value buffer where three scalar
    // percentile aggregates would each collect (and sort) the group's
    // values independently — measured at sf10 (60M rows, 2M groups) the
    // three-buffer form cost 67 s vs 36 s fused. median(p) is exactly
    // percentile(p, 0.5) (same exact-interpolation aggregate).
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_offers"),
        sum(dec(p)).cast("double").as("s1x"),
        sum(dec(p) * dec(p)).cast("double").as("s2x"),
        min(p).as("min_p"),
        max(p).as("max_p"),
        percentile(p, array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
      .withColumn("q1", element_at(col("qs"), 1))
      .withColumn("med", element_at(col("qs"), 2))
      .withColumn("q3", element_at(col("qs"), 3))
      .drop("qs")
  }

  /** The mega-group escape hatch for [[fullStats]]: same schema, but
    * quartiles via `approx_percentile` (Greenwald–Khanna summaries,
    * bounded per-group state ≈ O(accuracy·log n) vs the exact
    * aggregate's O(group) value buffer). Exact quartiles are the oracle
    * contract for the reference-shaped corpus (max group: 1,032 offers);
    * at open-corpus scale a single key can hold 10⁷+ rows and the exact
    * buffer concentrates the whole group's values in one task. Trade-offs
    * measured on a planted 10M-row mega-group at sf10 (see BENCH_NOTES
    * round 14): the exact form survives but its buffer dominates the
    * task; this form holds state bounded regardless of skew. q1/med/q3
    * are approximate (rank error ≤ n/accuracy) and DISCRETE (an element
    * of the group, not interpolated), so consumers gating on exact
    * artifact parity must keep [[fullStats]]. */
  def fullStatsApprox(df: DataFrame, keys: Seq[String], priceCol: String,
                      accuracy: Int = 10000): DataFrame = {
    val p = col(priceCol)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_offers"),
        sum(dec(p)).cast("double").as("s1x"),
        sum(dec(p) * dec(p)).cast("double").as("s2x"),
        min(p).as("min_p"),
        max(p).as("max_p"),
        approx_percentile(p, array(lit(0.25), lit(0.5), lit(0.75)),
          lit(accuracy)).as("qs"))
      .withColumn("q1", element_at(col("qs"), 1))
      .withColumn("med", element_at(col("qs"), 2))
      .withColumn("q3", element_at(col("qs"), 3))
      .drop("qs")
  }

  /** Join a moments-bearing stats frame (n_offers/s1x/s2x over `keys`,
    * e.g. [[momentStats]] or a [[fullStats]] projection) back onto the
    * rows and derive mean / sample-std (ddof=1) — matches pandas .std()
    * per the reference artifacts (SURVEY.md §2.8 Z2). */
  def withStatsFrom(df: DataFrame, stats: DataFrame, keys: Seq[String]): DataFrame =
    joinBackNullSafe(df, stats, keys)
      .withColumn("market_mean", col("s1x") / col("n_offers"))
      .withColumn("market_std",
        when(col("n_offers") > 1,
          sqrt((col("s2x") - col("s1x") * col("s1x") / col("n_offers")) / (col("n_offers") - 1)))
          .otherwise(lit(null).cast("double")))
      .drop("s1x", "s2x")

  /** Adds deterministic per-group stats columns (n, mean, std) over the
    * given keys. Formulated as groupBy + join-back rather than a window:
    * identical values (the sums are order-insensitive), but the agg
    * partially aggregates map-side instead of sorting every offer row
    * within its hash partition. Standalone form — family pipelines that
    * run more than one rule should compute [[fullStats]] once and use
    * [[withStatsFrom]]. */
  def withGroupStats(df: DataFrame, keys: Seq[String], priceCol: String): DataFrame =
    withStatsFrom(df, momentStats(df, keys, priceCol), keys)

  /** Per-offer anomaly metrics given group stats columns present. */
  def withMetrics(df: DataFrame, priceCol: String): DataFrame = {
    val p = col(priceCol)
    df.withColumn("deviation_percent",
        abs(p - col("market_mean")) / col("market_mean") * 100.0)
      .withColumn("z_score",
        when(col("market_std") > 0, abs(p - col("market_mean")) / col("market_std")))
      .withColumn("anomaly_type",
        when(p > col("market_mean"), lit("trop_haut")).otherwise(lit("trop_bas")))
  }

  /** Z-score rule (the 18:42 reference run) from a precomputed stats
    * frame (a [[fullStats]]/[[momentStats]] table — the shared family
    * artifact): flag |p−μ| > k·σ within groups of at least minGroupSize.
    * Only the moment columns are joined back, so the flagged frame's
    * schema does not depend on which stats form fed it. */
  def zScoreAnomaliesFrom(offers: DataFrame, stats: DataFrame,
                          keys: Seq[String], priceCol: String,
                          k: Double, minGroupSize: Int): DataFrame = {
    val moments = stats.select((keys ++ Seq("n_offers", "s1x", "s2x")).map(col): _*)
    withMetrics(withStatsFrom(offers, moments, keys), priceCol)
      .where(col("n_offers") >= minGroupSize && col("z_score") > k)
  }

  /** Z-score rule, standalone form (computes its own moment aggregate). */
  def zScoreAnomalies(offers: DataFrame, keys: Seq[String], priceCol: String,
                      k: Double = 2.0, minGroupSize: Int = 3): DataFrame =
    zScoreAnomaliesFrom(offers, momentStats(offers, keys, priceCol),
      keys, priceCol, k, minGroupSize)

  /** IQR-fence rule (box-plot criterion consistent with the 20:19 run)
    * from a precomputed quantile-bearing stats frame ([[fullStats]]):
    * flag p outside [q1 − k·iqr, q3 + k·iqr]. Group-size filter and fence
    * arithmetic run on the small stats side BEFORE the join-back. The
    * join strategy is left to AQE: group cardinality is unbounded at
    * scale (brand×model grows with the corpus), so a forced broadcast
    * would OOM where a runtime-chosen shuffle join degrades gracefully. */
  def iqrAnomaliesFrom(offers: DataFrame, stats: DataFrame,
                       keys: Seq[String], priceCol: String,
                       k: Double, minGroupSize: Int): DataFrame = {
    val p = col(priceCol)
    val q = stats.select((keys ++ Seq("n_offers", "q1", "q3")).map(col): _*)
      .where(col("n_offers") >= minGroupSize)
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("lo", col("q1") - lit(k) * col("iqr"))
      .withColumn("hi", col("q3") + lit(k) * col("iqr"))
    joinBackNullSafe(offers, q, keys)
      .where(p < col("lo") || p > col("hi"))
  }

  /** IQR-fence rule, standalone form (computes its own quartile agg). */
  def iqrAnomalies(offers: DataFrame, keys: Seq[String], priceCol: String,
                   k: Double = 1.5, minGroupSize: Int = 3): DataFrame = {
    val p = col(priceCol)
    val q = offers.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_offers"),
        percentile(p, lit(0.25)).as("q1"),
        percentile(p, lit(0.75)).as("q3"))
    iqrAnomaliesFrom(offers, q, keys, priceCol, k, minGroupSize)
  }

  /** Z5 — run-level summary of a flagged-anomaly frame (one row).
    * mean deviation is reported as an exact integer of centi-percent
    * (floor(dev·100) summed) so it is order-insensitive. */
  def summary(flagged: DataFrame, keys: Seq[String]): DataFrame =
    flagged.agg(
      count(lit(1)).as("total_anomalies"),
      countDistinct(col(keys.head), keys.tail.map(col): _*).as("groups_with_anomalies"),
      coalesce(sum(when(col("anomaly_type") === "trop_haut", 1L).otherwise(0L)), lit(0L))
        .as("n_trop_haut"),
      coalesce(sum(when(col("anomaly_type") === "trop_bas", 1L).otherwise(0L)), lit(0L))
        .as("n_trop_bas"),
      coalesce(sum(floor(col("deviation_percent") * 100.0)).cast("long"), lit(0L))
        .as("sum_dev_centi"))
}
