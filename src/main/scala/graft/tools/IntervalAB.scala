package graft.tools

import graft.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the two batch interval-join formulations (bench
  * tooling): the time-bucketed equi-join (`TemporalJoin.intervalBucketed`)
  * vs the naive θ-join `l.key = r.key AND r.ts BETWEEN l.ts+lo AND
  * l.ts+hi` (`TemporalJoin.intervalNaive`); `TemporalJoin.interval`
  * auto-picks between them from a key-histogram sample and its choice is
  * printed per shape. The naive form is NOT a cartesian here — Catalyst plans the
  * equality as a sort-merge join and applies the range as a post-join
  * filter — so its cost is Σ per-key |L_k|·|R_k|: fine while keys are
  * uniform, quadratic on a hot key. The bucketed plan's cost follows
  * matches + same-bucket near-misses instead. This measures both on the
  * real event table AND on a planted hot-key skew (one user owning `skew`
  * fraction of both sides) — the regime the bucketed plan exists for.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.IntervalAB [skewFraction]
  */
object IntervalAB {
  def main(args: Array[String]): Unit = {
    val skew = if (args.nonEmpty) args(0).toDouble else 0.3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val sec = Queries.tsEpochSec(ev.schema).cast("long")

    def sides(skewed: Boolean): (DataFrame, DataFrame) = {
      // planted skew: fold `skew` of all users onto user 0 on both sides
      val uid = if (skewed)
        when(pmod(col("user_id"), lit(1000)) < lit((skew * 1000).toInt), lit(0L))
          .otherwise(col("user_id"))
      else col("user_id")
      val c = ev.where(col("event_type") === "click")
        .select(uid.as("user_id"), col("event_id").as("c_id"), sec.as("c_sec")).cache()
      val p = ev.where(col("event_type") === "purchase")
        .select(uid.as("user_id"), col("event_id").as("p_id"), sec.as("p_sec")).cache()
      c.count(); p.count()
      (c, p)
    }

    def time(df: => DataFrame): (Double, Long) = {
      val rows = df.count() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      (math.min(t1 - t0, t2 - t1) / 1e9, rows)
    }

    println(f"${"shape"}%10s ${"bucketed_s"}%11s ${"naive_s"}%9s ${"pairs"}%10s")
    for (skewed <- Seq(false, true)) {
      val (c, p) = sides(skewed)
      val (bs, bRows) = time(graft.operators.TemporalJoin.intervalBucketed(
        c, p, "user_id", "c_sec", "p_sec", 0L, 1800L, 1800L))
      val (ns, nRows) = time(graft.operators.TemporalJoin.intervalNaive(
        c, p, "user_id", "c_sec", "p_sec", 0L, 1800L))
      require(bRows == nRows, s"formulations disagree: $bRows vs $nRows")
      // which arm would the auto entry point take here? (prints alongside
      // the measured truth so the switch can be audited against it)
      val autoPlan = graft.operators.TemporalJoin.interval(
        c, p, "user_id", "c_sec", "p_sec", 0L, 1800L, 1800L)
        .queryExecution.logical.toString
      val chose = if (autoPlan.contains("explode")) "bucketed" else "naive"
      val label = if (skewed) f"skew=$skew%.1f" else "uniform"
      println(f"$label%10s $bs%11.2f $ns%9.2f $bRows%10d  auto=$chose")
      c.unpersist(); p.unpersist()
    }
    spark.stop()
  }
}
