package graft.tools

import graft.operators.Anomaly
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mega-group stress for the anomaly family's exact per-group quantile
  * buffers (r13 verdict item 3). [[Anomaly.fullStats]] buffers every
  * group's values inside one aggregation task to get exact quartiles;
  * group sizes are unbounded at open-corpus scale (the reference's max
  * group was 1,032 offers — a 100 TB corpus can hold a 10⁷-row key).
  * This probe runs the exact form and the [[Anomaly.fullStatsApprox]]
  * escape hatch against a ScaleGen corpus (plant the mega-group with
  * SPARK_GRAFT_LINEITEM_SKEW at generation time) and reports:
  *
  *  - the corpus's max group size (the stress actually present),
  *  - wall-clock and survival of each tier (an exact-buffer OOM/spill
  *    death shows up here, not in theory),
  *  - the approx tier's quartile error ON the mega-group — rank-bounded
  *    by accuracy, measured in value space where the fences live.
  *
  * Usage: runMain graft.tools.SkewStatsProbe <sfDir> [accuracy]
  */
object SkewStatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val accuracy = if (args.length > 1) args(1).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val nRows = li.count()
    val top = li.groupBy("l_partkey").count()
      .orderBy(desc("count")).limit(3).collect()
    val maxGroup = if (top.nonEmpty) top(0).getLong(1) else 0L

    def timed[A](f: => A): (Double, Either[String, A]) = {
      val t0 = System.nanoTime()
      val r = try Right(f) catch { case t: Throwable => Left(t.getClass.getSimpleName + ": " + String.valueOf(t.getMessage).take(120)) }
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // force each tier by checksumming EVERY stat column — a bare count()
    // over the aggregated frame lets Catalyst prune the quantile
    // aggregate expressions (unused columns), timing an aggregation that
    // never built the buffers under test
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      val cols = df.columns.map(col)
      df.select(xxhash64(cols: _*).as("h"))
        .agg(count(lit(1)), sum(col("h").cast("decimal(38,0)")))
        .collect()(0).getLong(0)
    }
    val (tExact, rExact) = timed(
      force(Anomaly.fullStats(li, Seq("l_partkey"), "l_extendedprice")))
    val (tApprox, rApprox) = timed(
      force(Anomaly.fullStatsApprox(li, Seq("l_partkey"), "l_extendedprice", accuracy)))
    val (tMoments, _) = timed(
      force(Anomaly.momentStats(li, Seq("l_partkey"), "l_extendedprice")))

    // quartile error on the mega-group (key 0), exact vs approx, if both
    // tiers survived — relative error in value space, where the IQR
    // fences are computed
    val errs: String =
      if (rExact.isRight && rApprox.isRight) {
        val e = Anomaly.fullStats(li.where(col("l_partkey") === 0L),
          Seq("l_partkey"), "l_extendedprice")
          .select("q1", "med", "q3").collect()
        val a = Anomaly.fullStatsApprox(li.where(col("l_partkey") === 0L),
          Seq("l_partkey"), "l_extendedprice", accuracy)
          .select("q1", "med", "q3").collect()
        if (e.nonEmpty && a.nonEmpty) {
          val ds = (0 to 2).map { i =>
            val ev = e(0).getDouble(i); val av = a(0).getDouble(i)
            f"${math.abs(av - ev) / math.max(math.abs(ev), 1e-12)}%.2e"
          }
          s"""{"q1":${ds(0)},"med":${ds(1)},"q3":${ds(2)}}"""
        } else "null"
      } else "null"

    def res(r: Either[String, Long]): String =
      r.fold(e => s""""$e"""", n => n.toString)
    println(
      f"""{"tool":"SkewStatsProbe","sf_dir":"$sfDir","n_rows":$nRows,"max_group":$maxGroup,"accuracy":$accuracy,"exact_s":$tExact%.1f,"exact_groups":${res(rExact)},"approx_s":$tApprox%.1f,"approx_groups":${res(rApprox)},"moments_s":$tMoments%.1f,"mega_rel_err":$errs}""")
    spark.stop()
  }
}
