package graft

import graft.operators.TemporalJoin
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSuite {
  import spark.implicits._

  // (key, ts, seq) left clicks; (key, ts, seq, payload) right purchases
  private def clicks(rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "sec", "event_id")
      .select(col("event_id"), col("user_id"), col("sec"))
  private def purchases(rows: (Long, Long, Long, Long)*) =
    rows.toDF("user_id", "sec", "event_id", "p_cents")
      .select(col("user_id"), col("sec"), col("event_id"),
        col("event_id").as("p_id"), col("sec").as("p_sec"), col("p_cents"))

  private def asOf(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    TemporalJoin.asOf(l, r, "user_id", "sec", "event_id",
      Seq("p_id", "p_sec", "p_cents"))

  test("asOf: picks most recent at-or-before, null when none precedes") {
    val out = asOf(
      clicks((1L, 100L, 10L), (1L, 50L, 11L), (2L, 100L, 12L)),
      purchases((1L, 60L, 20L, 600L), (1L, 90L, 21L, 900L), (3L, 10L, 22L, 100L)))
      .orderBy("event_id").collect()
    // click@100 sees purchase@90; click@50 precedes all purchases → null
    assert(out(0).getLong(0) == 10L && out(0).getLong(3) == 21L)
    assert(out(1).getLong(0) == 11L && out(1).isNullAt(3))
    // user 2 has no purchases at all
    assert(out(2).getLong(0) == 12L && out(2).isNullAt(3))
  }

  test("asOf: a purchase at exactly the click's ts is visible (>= semantics)") {
    val out = asOf(
      clicks((1L, 100L, 10L)),
      purchases((1L, 100L, 20L, 500L)))
      .collect()
    assert(out(0).getLong(3) == 20L)
  }

  test("asOf: simultaneous purchases resolve to the larger seq under any partitioning") {
    val r = purchases((1L, 80L, 20L, 1L), (1L, 80L, 25L, 2L), (1L, 80L, 22L, 3L))
    for (parts <- Seq(1, 7)) {
      val out = asOf(clicks((1L, 100L, 10L)), r.repartition(parts)).collect()
      assert(out(0).getLong(3) == 25L, s"parts=$parts")
    }
  }

  test("asOf: all payload fields come from the SAME right row (null field stays null)") {
    // Newest right row has p_cents = null; an older row has p_cents = 900.
    // Per-column carry would resurrect 900 next to the newest row's p_id —
    // the struct carry must keep the newest row's null.
    val r = Seq(
        (1L, 60L, 20L, Some(900L)),
        (1L, 90L, 21L, None: Option[Long]))
      .toDF("user_id", "sec", "event_id", "p_cents")
      .select(col("user_id"), col("sec"), col("event_id"),
        col("event_id").as("p_id"), col("sec").as("p_sec"), col("p_cents"))
    val out = asOf(clicks((1L, 100L, 10L)), r).collect()
    assert(out(0).getLong(3) == 21L)       // matched the newest row...
    assert(out(0).isNullAt(5), out(0))     // ...and its p_cents is null
  }

  test("asOf plan: one shuffle (window on key), no join operator at all") {
    val plan = asOf(clicks((1L, 100L, 10L)), purchases((1L, 60L, 20L, 1L)))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  private def pSide(rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "p_sec", "p_id")

  test("interval: inclusive bounds, cross-bucket matches, key isolation") {
    val l = Seq((1L, 1000L, 1L), (2L, 1000L, 2L)).toDF("user_id", "c_sec", "c_id")
    val r = pSide(
      (1L, 1000L, 10L),  // at lower bound → match
      (1L, 2800L, 11L),  // inside, next bucket (bucket width 1800) → match
      (1L, 2801L, 12L),  // past upper bound 1000+1800 → no
      (1L, 999L, 13L),   // before lower bound → no
      (2L, 1500L, 14L))  // other key, inside its own window → match
    val out = TemporalJoin.intervalBucketed(l, r, "user_id", "c_sec", "p_sec",
        0L, 1800L, 1800L)
      .select("c_id", "p_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 14L)))
  }

  test("interval: no duplicate pairs when left and right share a bucket") {
    // left explodes into 2 buckets; a right row matching from the FIRST
    // bucket must not also pair via the second
    val l = Seq((1L, 100L, 1L)).toDF("user_id", "c_sec", "c_id")
    val r = pSide((1L, 200L, 10L))
    val out = TemporalJoin.intervalBucketed(l, r, "user_id", "c_sec", "p_sec",
      0L, 1800L, 1800L).collect()
    assert(out.length == 1)
  }

  test("interval: negative lower bound (window straddling the left ts)") {
    val l = Seq((1L, 1000L, 1L)).toDF("user_id", "c_sec", "c_id")
    val r = pSide((1L, 700L, 10L), (1L, 400L, 11L), (1L, 1200L, 12L))
    val out = TemporalJoin.intervalBucketed(l, r, "user_id", "c_sec", "p_sec",
        -300L, 300L, 300L)
      .select("p_id").as[Long].collect().toSet
    assert(out == Set(10L, 12L))
  }

  test("property: asOf matches the brute-force reference on random data, any partitioning") {
    val rnd = new scala.util.Random(42)
    val lRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, 1000L + i))
    val rRows = Seq.tabulate(200)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(50).toLong, 2000L + i, rnd.nextInt(1000).toLong))
    // brute force: newest right row at-or-before, ties toward larger seq
    val expected = lRows.map { case (k, ts, id) =>
      val m = rRows.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption
      (id, m.map(_._3))
    }.toMap
    for (parts <- Seq(1, 5)) {
      val out = asOf(
        clicks(lRows.map { case (k, ts, id) => (k, ts, id) }: _*).repartition(parts),
        purchases(rRows: _*).repartition(parts))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      assert(out == expected, s"parts=$parts")
    }
  }

  test("property: interval matches the brute-force cross-filter on random data") {
    val rnd = new scala.util.Random(7)
    val lRows = Seq.tabulate(250)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(10000).toLong, 1000L + i))
    val rRows = Seq.tabulate(250)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(10000).toLong, 2000L + i))
    for ((lo, hi, bucket) <- Seq((0L, 1800L, 1800L), (-500L, 500L, 700L), (100L, 3000L, 1000L))) {
      val expected = (for {
        (lk, lts, lid) <- lRows
        (rk, rts, rid) <- rRows
        if lk == rk && rts >= lts + lo && rts <= lts + hi
      } yield (lid, rid)).toSet
      val out = TemporalJoin.intervalBucketed(
          lRows.toDF("user_id", "c_sec", "c_id"),
          rRows.toDF("user_id", "p_sec", "p_id"),
          "user_id", "c_sec", "p_sec", lo, hi, bucket)
        .select("c_id", "p_id").as[(Long, Long)].collect().toSet
      assert(out == expected, s"window=[$lo,$hi] bucket=$bucket")
    }
  }

  test("interval plan: sort-merge/shuffle equi-join on (bucket, key), never a nested loop") {
    val l = Seq((1L, 100L, 1L)).toDF("user_id", "c_sec", "c_id")
    val r = pSide((1L, 200L, 10L))
    val plan = TemporalJoin.intervalBucketed(l, r, "user_id", "c_sec", "p_sec",
      0L, 1800L, 1800L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("interval auto: switch point pinned (hot-key pair product vs per-row budget)") {
    // uniform keys: share ≈ 1/K → hot-key product tiny → naive SMJ
    assert(!TemporalJoin.useBucketed(0.001, 0.001, 2e5, 2e5, 8.0))
    // 30% hot key on both sides of a 200k-row join → bucketed (the 54× regime)
    assert(TemporalJoin.useBucketed(0.3, 0.3, 2e5, 2e5, 8.0))
    // one-sided 30% hot key still crosses the budget at 200k rows: the
    // hot key meets 0.1% of the right side = 200 rows, 12M pairs — but a
    // small join (2k rows) under the same shares stays naive
    assert(TemporalJoin.useBucketed(0.3, 0.001, 2e5, 2e5, 8.0))
    assert(!TemporalJoin.useBucketed(0.3, 0.001, 2e3, 2e3, 8.0))
    // empty sample → share 0 → naive
    assert(!TemporalJoin.useBucketed(0.0, 0.0, 0.0, 0.0, 8.0))
  }

  test("interval auto: picks each arm on the matching shape, identical results") {
    val rnd = new scala.util.Random(11)
    // uniform: 400 rows over 100 keys; skewed: same but 60% folded onto key 0
    def rows(skewed: Boolean, idBase: Long) = Seq.tabulate(400) { i =>
      val k = rnd.nextInt(100).toLong
      (if (skewed && k < 60) 0L else k, rnd.nextInt(10000).toLong, idBase + i)
    }
    for (skewed <- Seq(false, true)) {
      val lRows = rows(skewed, 1000L)
      val rRows = rows(skewed, 2000L)
      val l = lRows.toDF("user_id", "c_sec", "c_id")
      val r = rRows.toDF("user_id", "p_sec", "p_id")
      // sampleFraction=1.0 → the histogram is exact → decision deterministic
      val auto = TemporalJoin.interval(l, r, "user_id", "c_sec", "p_sec",
        0L, 1800L, 1800L, sampleFraction = 1.0)
      val chosebucketed = auto.queryExecution.logical.toString.contains("explode")
      assert(chosebucketed == skewed, s"skewed=$skewed chose wrong arm")
      val expected = (for {
        (lk, lts, lid) <- lRows; (rk, rts, rid) <- rRows
        if lk == rk && rts >= lts && rts <= lts + 1800L
      } yield (lid, rid)).toSet
      assert(auto.select("c_id", "p_id").as[(Long, Long)].collect().toSet == expected,
        s"skewed=$skewed")
    }
  }
}
