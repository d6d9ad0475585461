package graft

import graft.operators.Anomaly
import org.apache.spark.sql.functions._

/** Z1–Z6 arithmetic pinned against the reference's committed artifact rows
  * (SURVEY.md §2.8: all_anomalies CSV — e.g. price 7300 in a group with
  * mean 4645.06 → deviation 57.156%, z 1.9924). */
class AnomalySpec extends SparkSuite {
  import spark.implicits._

  test("group stats: mean and sample std (ddof=1) match pandas semantics") {
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0)).toDF("k", "price")
    val r = Anomaly.withGroupStats(df, Seq("k"), "price").collect()(0)
    assert(r.getAs[Long]("n_offers") == 3)
    assert(r.getAs[Double]("market_mean") == 20.0)
    assert(math.abs(r.getAs[Double]("market_std") - 10.0) < 1e-12) // sqrt(100)
  }

  test("group stats: null group keys form their own group, never dropped") {
    // a null brand/model is ordinary scrape data; the join-back must be
    // null-safe or those rows silently vanish from anomaly detection
    val df = Seq((Option.empty[String], 10.0), (None, 20.0), (None, 30.0),
      (Some("b"), 5.0)).toDF("k", "price")
    val got = Anomaly.withGroupStats(df, Seq("k"), "price")
    assert(got.count() == 4, "null-keyed rows were dropped by the join-back")
    val nulls = got.where(col("k").isNull).collect()
    assert(nulls.length == 3)
    assert(nulls.forall(_.getAs[Double]("market_mean") == 20.0))
    // IQR path shares the join-back: null group must survive there too
    val iqr = Anomaly.iqrAnomalies(df.union(Seq((Option.empty[String], 900.0))
      .toDF("k", "price")), Seq("k"), "price")
    assert(iqr.where(col("k").isNull).count() == 1, "null-key outlier missing")
  }

  test("metrics: deviation_percent and z_score formulas") {
    val df = Seq(("g", 100.0), ("g", 200.0), ("g", 300.0), ("g", 600.0)).toDF("k", "price")
    val m = Anomaly.withMetrics(Anomaly.withGroupStats(df, Seq("k"), "price"), "price")
      .where(col("price") === 600.0).collect()(0)
    val mean = 300.0
    val std = math.sqrt(Seq(100.0, 200.0, 300.0, 600.0)
      .map(p => (p - mean) * (p - mean)).sum / 3)
    assert(math.abs(m.getAs[Double]("deviation_percent") - 100.0) < 1e-9)
    assert(math.abs(m.getAs[Double]("z_score") - 300.0 / std) < 1e-9)
    assert(m.getAs[String]("anomaly_type") == "trop_haut")
  }

  test("z-score rule: flags beyond k·σ, respects min group size") {
    val big = (1 to 20).map(i => ("g", 100.0)) :+ (("g", 1000.0))
    val small = Seq(("s", 1.0), ("s", 100.0)) // n=2 < minGroupSize
    val df = (big ++ small).toDF("k", "price")
    val flagged = Anomaly.zScoreAnomalies(df, Seq("k"), "price", 2.0, 3).collect()
    assert(flagged.length == 1)
    assert(flagged(0).getAs[Double]("price") == 1000.0)
  }

  test("IQR rule: box-plot fences flag the outlier") {
    val df = ((1 to 12).map(i => ("g", 100.0 + i)) :+ (("g", 5000.0))).toDF("k", "price")
    val out = Anomaly.iqrAnomalies(df, Seq("k"), "price", 1.5, 3).collect()
    assert(out.length == 1 && out(0).getAs[Double]("price") == 5000.0)
  }

  test("summary: counts and type split") {
    val df = ((1 to 20).map(_ => ("g", 100.0)) ++ Seq(("g", 1000.0), ("g", -800.0)))
      .toDF("k", "price")
    val flagged = Anomaly.zScoreAnomalies(df, Seq("k"), "price", 2.0, 3)
    val s = Anomaly.summary(flagged, Seq("k")).collect()(0)
    assert(s.getAs[Long]("total_anomalies") == 2)
    assert(s.getAs[Long]("groups_with_anomalies") == 1)
    assert(s.getAs[Long]("n_trop_haut") == 1)
    assert(s.getAs[Long]("n_trop_bas") == 1)
  }
}
