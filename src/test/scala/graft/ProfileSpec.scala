package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

/** Column profiling and histogram fixtures (hand-computed, incl. the
  * null handling the all-dense parquet fixtures cannot exercise). */
class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("column stats: null-aware counts, exact distincts, typed min/max") {
    val d = Seq(
      (Some(1.0), Some("a")), (Some(2.0), Some("b")),
      (Some(2.0), None), (None, Some("a"))
    ).toDF("x", "s")
    val r = Profile.columnStats(d, Seq("x", "s")).collect()(0)
    assert(r.getAs[Long]("n_rows") == 4)
    assert(r.getAs[Long]("x_n") == 3)          // nulls excluded from count(col)
    assert(r.getAs[Long]("x_distinct") == 2)   // exact, null not a value
    assert(r.getAs[Double]("x_min") == 1.0 && r.getAs[Double]("x_max") == 2.0)
    assert(r.getAs[Long]("s_n") == 3 && r.getAs[Long]("s_distinct") == 2)
    assert(r.getAs[String]("s_max") == "b")    // min/max keep the column type
  }

  test("histogram: exact bin counts, out-of-range rows clamp to edge bins") {
    val d = Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.9, 100.0, 140.0).toDF("v")
    val got = Profile.histogram(d, "v", lo = 0.0, hi = 100.0, bins = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -5 clamps into bin 0; 100 and 140 clamp into bin 9
    assert(got == Map(0L -> 3L, 1L -> 1L, 2L -> 1L, 9L -> 3L))
    assert(got.values.sum == 8)                // every row counted somewhere
  }
}
