package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("windowed streaming agg with watermark produces hourly counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    mem.addData(
      (java.sql.Timestamp.valueOf("2026-01-01 10:05:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 10:55:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2026-01-01 11:05:00"), "view", 3.0))
    val out = EventStream.runToMemory(EventStream.hourlyCounts(df), "hourly")
      .orderBy("window_start", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2) // two clicks in the 10:00 window
    assert(out(0).getAs[Double]("total_value") == 3.0)
    assert(out(1).getAs[String]("event_type") == "view")
  }

  test("stateful price envelope via mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.PriceEvent]
    mem.addData(
      EventStream.PriceEvent("p1", 100.0, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      EventStream.PriceEvent("p1", 50.0, java.sql.Timestamp.valueOf("2026-01-01 10:01:00")),
      EventStream.PriceEvent("p2", 7.0, java.sql.Timestamp.valueOf("2026-01-01 10:02:00")))
    val out = EventStream.runToMemory(EventStream.priceEnvelope(mem.toDS()).toDF(),
      "envelope", OutputMode.Update())
      .orderBy("product_id").collect()
    val p1 = out.find(_.getString(0) == "p1").get
    assert(p1.getAs[Long]("n") == 2)
    assert(p1.getAs[Double]("min_price") == 50.0)
    assert(p1.getAs[Double]("max_price") == 100.0)
    assert(p1.getAs[Double]("last_price") == 50.0)
  }

  test("expired sessions via flatMapGroupsWithState + event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    def ev(k: String, p: Double, t: String) =
      EventStream.PriceEvent(k, p, java.sql.Timestamp.valueOf(t))
    val mem = MemoryStream[EventStream.PriceEvent]
    val sessions = EventStream.expiredSessions(
      mem.toDS().withWatermark("ts", "0 seconds"),
      gap = java.time.Duration.ofMinutes(10))
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // Timeouts fire against the watermark, which advances at the END of
      // each micro-batch — so each addData below is one controlled batch.
      mem.addData(ev("p1", 100.0, "2026-01-01 10:00:00"),
        ev("p1", 50.5, "2026-01-01 10:01:00"))
      q.processAllAvailable() // wm -> 10:01; p1 timeout set for 10:11
      mem.addData(ev("p2", 7.0, "2026-01-01 10:30:00"))
      q.processAllAvailable() // checked against wm 10:01: p1 still open; wm -> 10:30
      mem.addData(ev("p3", 1.0, "2026-01-01 11:00:00"))
      q.processAllAvailable() // wm 10:30 > 10:11 -> p1 emitted; wm -> 11:00
      mem.addData(ev("p4", 2.0, "2026-01-01 12:00:00"))
      // wm 11:00 > 10:40 -> p2 emitted; the engine then runs a follow-up
      // no-data batch for the wm advance to 12:00, which expires p3 too
      q.processAllAvailable()
      val out = spark.table("sessions").orderBy("key").collect()
      assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("p1", 2L, 15050L), ("p2", 1L, 700L), ("p3", 1L, 100L)))
      // p4's session is still open: nothing emitted for it
    } finally q.stop()
  }

  test("expired sessions: in-data gap closes the session instead of folding across silence") {
    implicit val sqlCtx = spark.sqlContext
    def ev(k: String, p: Double, t: String) =
      EventStream.PriceEvent(k, p, java.sql.Timestamp.valueOf(t))
    val mem = MemoryStream[EventStream.PriceEvent]
    val sessions = EventStream.expiredSessions(
      mem.toDS().withWatermark("ts", "0 seconds"),
      gap = java.time.Duration.ofMinutes(10))
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sessions_gap").start()
    try {
      // Batch 1: p1 opens a session at 10:00.
      mem.addData(ev("p1", 100.0, "2026-01-01 10:00:00"))
      q.processAllAvailable() // wm -> 10:00; p1 timeout at 10:10
      // Batch 2: p1 receives DATA again — but 50 min after its last event.
      // The timeout cannot fire (the key has data), so the data branch
      // must detect the in-data gap: close session 1, open session 2.
      // Same batch also carries an IN-BATCH gap: 11:05 then 11:30.
      mem.addData(ev("p1", 50.5, "2026-01-01 10:50:00"),
        ev("p1", 1.0, "2026-01-01 11:05:00"),
        ev("p1", 2.0, "2026-01-01 11:30:00"))
      q.processAllAvailable()
      val closed = spark.table("sessions_gap").orderBy("cents").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // Every consecutive pair is >10 min apart, so three sessions close
      // (10:00; 10:50; 11:05) and the 11:30 one stays open in state.
      assert(closed == Seq(("p1", 1L, 100L), ("p1", 1L, 5050L), ("p1", 1L, 10000L)))
    } finally q.stop()
  }

  test("property: expiredSessions equals batch session_window over random streams") {
    // ≥100 independent per-key event streams (keys are independent in
    // flatMapGroupsWithState, so one query multiplexes them all): random
    // event counts/timestamps per key, random BATCH BOUNDARIES cut from
    // the globally time-sorted event list (cuts from sorted order keep
    // every batch's min ≥ the previous watermark, i.e. no late data —
    // the contract the operator documents), random order WITHIN a batch.
    // A far-future sentinel key then flushes every real session (its
    // watermark advance fires all remaining event-time timeouts), and
    // the emitted sessions must equal batch session_window exactly.
    // Even-second timestamps + an odd 601 s gap keep every inter-event
    // delta strictly off the gap boundary, where the streaming fold
    // (closed interval) and session_window (half-open) could disagree.
    implicit val sqlCtx = spark.sqlContext
    import org.scalacheck.Gen
    val nKeys = 120
    val gapSec = 601L
    val streamGen = for {
      n <- Gen.chooseNum(1, 25)
      // even seconds, shifted one day up: ts = 0 would equal Spark's
      // INITIAL watermark and be dropped as late in the first batch —
      // a harness artifact (epoch-zero events), not operator behavior
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 30000L).map(s => (s + 43200L) * 2))
      cents <- Gen.listOfN(n, Gen.chooseNum(1, 99999))
    } yield ts.zip(cents)
    val perKey = (0 until nKeys).map { k =>
      s"k$k" -> streamGen.sample.getOrElse(Seq((0L, 1)))
    }
    val events = perKey.flatMap { case (k, evs) =>
      evs.map { case (sec, c) =>
        EventStream.PriceEvent(k, c / 100.0, new java.sql.Timestamp(sec * 1000L))
      }
    }.sortBy(_.ts.getTime)
    // random cut points over the sorted list -> ~40 micro-batches. Cuts
    // are only legal where the timestamp STRICTLY increases: a cut inside
    // a run of equal timestamps would put rows at ts == watermark into
    // the next batch, where the stateful operator's late-row filter
    // drops them — late data is outside the operator's contract.
    val legal = (1 until events.size)
      .filter(i => events(i - 1).ts.getTime < events(i).ts.getTime)
    val nCuts = 40
    val cutGen = Gen.listOfN(nCuts - 1, Gen.oneOf(legal))
    val cuts = (Seq(0, events.size) ++
      (if (legal.nonEmpty) cutGen.sample.getOrElse(Nil) else Nil)).distinct.sorted
    val batches = cuts.zip(cuts.tail).map { case (a, b) =>
      scala.util.Random.shuffle(events.slice(a, b)) // in-batch disorder
    }.filter(_.nonEmpty)
    val sentinel = EventStream.PriceEvent("zzz_sentinel", 1.0,
      new java.sql.Timestamp((events.map(_.ts.getTime).max) + 10 * gapSec * 1000L))

    val mem = MemoryStream[EventStream.PriceEvent]
    val sessions = EventStream.expiredSessions(
      mem.toDS().withWatermark("ts", "0 seconds"),
      gap = java.time.Duration.ofSeconds(gapSec))
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sessions_prop").start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      mem.addData(sentinel)
      q.processAllAvailable()
      val got = spark.table("sessions_prop")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val expected = events.toDF()
        .groupBy(col("product_id"),
          session_window(col("ts"), s"$gapSec seconds").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("price") * 100).cast("long")).as("cents"))
        .collect().map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("cents")))
        .groupBy(identity).view.mapValues(_.length).toMap
      // multiset equality: a key can close several identical sessions
      assert(got == expected,
        s"streaming sessions diverge from batch session_window: " +
          s"only-streaming=${(got.toSet -- expected.toSet).take(5)} " +
          s"only-batch=${(expected.toSet -- got.toSet).take(5)}")
    } finally q.stop()
  }

  test("stream-static broadcast join enriches facts with dimension rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val facts = mem.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "A"), (2L, "B")).toDF("key", "segment")
    mem.addData((1L, 10.0), (1L, 5.0), (2L, 7.0), (9L, 99.0)) // 9 has no dim row
    val joined = facts.join(broadcast(dim), col("user_id") === col("key"))
      .groupBy("segment").agg(count(lit(1)).as("n"), sum("value").as("total"))
    val out = EventStream.runToMemory(joined, "enrich", OutputMode.Complete())
      .orderBy("segment").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("A", 2L, 15.0), ("B", 1L, 7.0))) // inner join drops the orphan fact
  }

  test("stream-stream interval join: window honored, state eviction planned") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val c = clicks.toDF().toDF("c_user", "c_ts", "c_id").withWatermark("c_ts", "1 hour")
    val p = purchases.toDF().toDF("p_user", "p_ts", "p_id").withWatermark("p_ts", "1 hour")
    clicks.addData(
      (1L, ts("2026-01-01 10:00:00"), 100L),
      (2L, ts("2026-01-01 10:00:00"), 101L))
    purchases.addData(
      (1L, ts("2026-01-01 10:20:00"), 200L), // inside 30 min → pair
      (1L, ts("2026-01-01 10:45:00"), 201L), // outside 30 min → no pair
      (2L, ts("2026-01-01 09:50:00"), 202L), // before the click → no pair
      (3L, ts("2026-01-01 10:10:00"), 203L)) // no matching user
    val joined = c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 30 minutes"))
    val out = EventStream.runToMemory(joined, "ssjoin", OutputMode.Append()).collect()
    assert(out.map(r => (r.getAs[Long]("c_id"), r.getAs[Long]("p_id"))).toSeq ==
      Seq((100L, 200L)))
    // the watermark + interval condition must reach the physical join as
    // state-eviction predicates — a stream-stream join without them
    // accumulates state forever (check the join carries a key watermark)
    val plan = joined.queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), s"no watermark in plan:\n$plan")
    // both event-time columns carry the watermark delay marker into the
    // join condition (the -T...ms annotation is what state eviction keys on)
    assert(plan.contains("-T3600000ms"), s"join keys lost the watermark delay:\n$plan")
  }

  test("checkpoint recovery: restart resumes state + offsets, output stays exactly-once") {
    // The production failure mode at 100 TB: a long-running stream dies
    // and restarts from its checkpoint. State (here: the dedup key set)
    // and source offsets must both resume — re-delivered keys after the
    // restart must still be dropped, and already-committed batches must
    // not be re-emitted to the sink.
    val in = tempDir("ckpt_in"); val out = tempDir("ckpt_out")
    val ckpt = tempDir("ckpt_meta")
    def writeDrop(name: String, keys: Range): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        keys.map(k => s"""{"k":$k}""").mkString("\n").getBytes)
    def start() = EventStream.dedupKeys(
        spark.readStream.schema("k long").json(in), "k")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    // run 1: two drops with overlapping keys, then stop (simulated death)
    writeDrop("drop1.json", 1 to 5)
    writeDrop("drop2.json", 4 to 8)   // 4,5 are dups within run 1
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // run 2 from the SAME checkpoint: re-deliver every old key + 9,10
    writeDrop("drop3.json", 1 to 10)  // only 9,10 are new
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    // batch oracle: distinct over everything delivered = 1..10, once each
    val got = spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (1L to 10L), s"got $got")
  }

  test("streaming near-dup gate: accumulated pairs equal the batch " +
      "candidate set across controlled micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      1L -> "spark shuffle join plan over the partition key",
      2L -> "spark shuffle join plan over the partition key",   // exact dup of 1
      3L -> "spark shuffle join plan over a partition key",     // near dup
      4L -> "customer order line value table scan",
      5L -> "customer order line value table scan",              // exact dup of 4
      6L -> "stream batch node sort vector column",
      7L -> "spark shuffle join plan over the partition key",   // late dup of 1/2
      8L -> "stream batch node sort vector column hash")        // near dup of 6
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val cands = graft.streaming.DocStream.neardupCandidates(
      df, "text", "doc_id", bands = 4, rowsPerBand = 2, shingleN = 2)
    val q = cands.toDF().writeStream.outputMode("append").format("memory")
      .queryName("st8spec").start()
    mem.addData(docs.take(4): _*); q.processAllAvailable()
    mem.addData(docs.slice(4, 6): _*); q.processAllAvailable()
    mem.addData(docs.drop(6): _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("st8spec")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Dedup.minhashCandidates(
        docs.toDF("doc_id", "text"), "text", "doc_id",
        bands = 4, rowsPerBand = 2, shingleN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.nonEmpty)                  // the fixture must exercise pairing
    assert(got.forall(p => p._1 < p._2))  // ordered pairs only
  }

  test("streaming near-dup gate: re-ingesting a seen doc id emits nothing; " +
      "a frozen bucket stops pairing at the cap") {
    implicit val sqlCtx = spark.sqlContext
    val text = "identical text shared by every arriving document"
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    // cap = 2: the third identical doc finds its buckets frozen
    val cands = graft.streaming.DocStream.neardupCandidates(
      df, "text", "doc_id", bands = 4, rowsPerBand = 2, shingleN = 2,
      maxBucket = 2)
    val q = cands.toDF().writeStream.outputMode("append").format("memory")
      .queryName("st8cap").start()
    mem.addData(1L -> text, 2L -> text); q.processAllAvailable()
    val afterTwo = spark.table("st8cap").distinct().count()
    assert(afterTwo == 1, s"expected the (1,2) pair only, got $afterTwo")
    mem.addData(2L -> text); q.processAllAvailable()   // re-ingestion: no-op
    assert(spark.table("st8cap").distinct().count() == 1)
    mem.addData(3L -> text); q.processAllAvailable()   // bucket frozen at 2
    q.stop()
    val fin = spark.table("st8cap").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fin == Set((1L, 2L)), s"frozen bucket must not pair doc 3: $fin")
  }

  test("property: streaming near-dup gate equals batch candidates over " +
      "random corpora and random batch boundaries") {
    // Random small-vocabulary corpora (so band collisions actually
    // happen), random doc count, random number of micro-batches with
    // random cut points: however the stream is chopped, the accumulated
    // distinct pair set must equal the batch plan's candidate set —
    // the arrival-order-independence claim st8's oracle relies on.
    implicit val sqlCtx = spark.sqlContext
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("spark", "join", "plan", "scan", "key", "row")
    val docGen = for {
      n <- Gen.chooseNum(2, 6)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    // fixed seed, derived per round/draw: every CI run exercises the
    // SAME corpora and cut points, and a failure names its (seed, round)
    // so the fixture replays exactly (unseeded Gen.sample made failing
    // rounds unreproducible — r11 ADVICE)
    val baseSeed = 0x12c0ffeeL
    val gp = Gen.Parameters.default
    for (round <- 1 to 4) {
      val rs = Seed(baseSeed).reseed(round.toLong)
      val nDocs = 10 + round * 7
      val docs = (1 to nDocs).map(i =>
        i.toLong -> docGen.pureApply(gp, rs.reseed(i.toLong)))
      val nCuts = Gen.chooseNum(1, 5).pureApply(gp, rs.reseed(-1L))
      val cutPts = (Seq(0, nDocs) ++
        Gen.listOfN(nCuts, Gen.chooseNum(1, nDocs - 1))
          .pureApply(gp, rs.reseed(-2L))).distinct.sorted
      val mem = MemoryStream[(Long, String)]
      val df = mem.toDF().toDF("doc_id", "text")
      val cands = graft.streaming.DocStream.neardupCandidates(
        df, "text", "doc_id", bands = 4, rowsPerBand = 2, shingleN = 2)
      val q = cands.toDF().writeStream.outputMode("append").format("memory")
        .queryName(s"st8prop$round").start()
      cutPts.zip(cutPts.tail).foreach { case (a, b) =>
        mem.addData(docs.slice(a, b): _*); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"st8prop$round")
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.operators.Dedup.minhashCandidates(
          docs.toDF("doc_id", "text"), "text", "doc_id",
          bands = 4, rowsPerBand = 2, shingleN = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch,
        s"round $round (seed $baseSeed, cuts $cutPts): stream $got vs batch $batch")
    }
  }

  test("live depth artifact: a mid-stream rewrite is picked up by the next " +
      "micro-batch without a restart; a fixed artifact matches the Map form; " +
      "missing cells and missing artifact default to depth 0") {
    import graft.operators.Similarity
    import graft.sources.DepthArtifact
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") < 200)
    val cents = Similarity.md5Centroids(4, 64)
    // targetCell=16 over ~50-vector cells → real nonzero depths
    val depths1 = Similarity.cellDepths(emb, "embedding", cents,
      targetCell = 16, maxExtraBits = 3)
    assert(depths1.values.exists(_ > 0), s"fixture depths all zero: $depths1")
    val path = tempDir("depth-artifact") + "/depths.json"
    DepthArtifact.write(spark, path, depths1)
    assert(DepthArtifact.read(spark, path) == depths1) // atomic round-trip
    def keyed(d: org.apache.spark.sql.DataFrame) =
      d.select("vec_id", "centroid", "subcell").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // fixed artifact ⇒ BATCH semantics identical to the Map form
    val viaMap = keyed(Similarity.semanticBucketsAdaptive(
      emb, "embedding", cents, depths1))
    val viaLive = keyed(Similarity.semanticBucketsAdaptiveLive(
      emb, "embedding", cents, path, maxExtraBits = 3))
    assert(viaLive == viaMap && viaLive.nonEmpty)
    // streaming: batch 1 under depths1, rewrite, batch 2 under depths2 —
    // no restart between them
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val mem = MemoryStream[(Long, Array[Float])]
    val stream = Similarity.semanticBucketsAdaptiveLive(
      mem.toDF().toDF("vec_id", "embedding"), "embedding", cents, path,
      maxExtraBits = 3).select("vec_id", "centroid", "subcell")
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("st9live").start()
    val (b1, b2) = rows.splitAt(100)
    mem.addData(b1: _*); q.processAllAvailable()
    def sink() = spark.table("st9live").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val after1 = sink()
    assert(after1 == b1.map(r => r._1 -> viaMap(r._1)).toMap,
      "batch 1 must key under the v1 artifact")
    // the refresh: coarsen every cell to depth 0 — rewritten MID-STREAM
    val depths2 = depths1.map { case (c, _) => c -> 0 }
    DepthArtifact.write(spark, path, depths2)
    mem.addData(b2: _*); q.processAllAvailable()
    val after2 = sink()
    q.stop()
    val viaMap2 = keyed(Similarity.semanticBucketsAdaptive(
      emb, "embedding", cents, depths2))
    val b1Ids = b1.map(_._1).toSet
    assert(after2.filter(kv => b1Ids(kv._1)) == after1.filter(kv => b1Ids(kv._1)),
      "batch-1 rows are already emitted — unchanged")
    assert(after2.filter(kv => !b1Ids(kv._1)) ==
      b2.map(r => r._1 -> viaMap2(r._1)).toMap,
      "batch 2 must key under the REWRITTEN artifact, without a restart")
    assert(b2.exists(r => viaMap2(r._1) != viaMap(r._1)),
      "fixture rewrite changed no key — test is vacuous")
    // a cell the artifact doesn't name defaults to depth 0 (left-join
    // coalesce), exactly the Map form's getOrElse(0)
    val partial = depths1.filter(_._2 > 0).take(1)
    DepthArtifact.write(spark, path, partial)
    assert(keyed(Similarity.semanticBucketsAdaptiveLive(
      emb, "embedding", cents, path, maxExtraBits = 3)) ==
      keyed(Similarity.semanticBucketsAdaptive(emb, "embedding", cents, partial)))
    // missing artifact = empty map = every cell depth 0 (cold start)
    val ghost = tempDir("depth-artifact-missing") + "/none.json"
    assert(DepthArtifact.read(spark, ghost).isEmpty)
    assert(keyed(Similarity.semanticBucketsAdaptiveLive(
      emb, "embedding", cents, ghost, maxExtraBits = 3)).values
      .forall(_._2 == 0L))
  }

  test("streaming file source ingests scrape drops incrementally") {
    val raw = tempDir("stream_raw")
    java.nio.file.Files.write(java.nio.file.Paths.get(raw, "drop1.json"),
      """{"ad_id":"1","title":"t1","price":"100"}""".getBytes)
    val stream = EventStream.fileSource(spark, raw, graft.schema.Schemas.avitoSchema)
    assert(stream.isStreaming)
    val out = EventStream.runToMemory(
      stream.groupBy().agg(count(lit(1)).as("n")), "filesrc", OutputMode.Complete())
    assert(out.collect()(0).getAs[Long]("n") == 1)
  }
}
