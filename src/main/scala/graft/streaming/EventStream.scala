package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators — the continuous upgrade of the
  * reference's @daily batch (SURVEY.md §2.9/§7.5). The batch pipeline's
  * plans run unchanged here: same groupBy(window(...)) the batch
  * st1_hourly_events query uses, made incremental with a watermark.
  *
  * Scale notes: state is keyed on (window, event_type) or product_id —
  * partitioned across executors; watermarks bound state size; file-source
  * ingestion reads new scrape drops per micro-batch (the reference's
  * "new JSON file appeared in the raw dir" trigger, continuous instead of
  * daily).
  */
object EventStream {

  /** Windowed event aggregation with late-data handling: counts + value
    * sums per (window, event_type). Append mode emits a window once its
    * watermark passes — exactly-once per window downstream. */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"),
        col("total_value"))

  /** File-source ingestion of scrape drops: stream new JSON files from a
    * raw directory with an explicit schema (never inference on a stream). */
  def fileSource(spark: SparkSession, dir: String,
                 schema: org.apache.spark.sql.types.StructType,
                 maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema)
      .json(dir)

  case class PriceEvent(product_id: String, price: Double, ts: java.sql.Timestamp)
  case class PriceState(product_id: String, n: Long, last_price: Double,
                        min_price: Double, max_price: Double)

  /** Custom state: running per-product price envelope via
    * mapGroupsWithState — the streaming analog of the merge fold's
    * per-product accumulation. State is one tiny struct per product. */
  def priceEnvelope(events: Dataset[PriceEvent]): Dataset[PriceState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.product_id)
      .mapGroupsWithState[PriceState, PriceState](GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[PriceEvent], state: GroupState[PriceState]) =>
          val prev = state.getOption.getOrElse(PriceState(id, 0L, 0.0,
            Double.MaxValue, Double.MinValue))
          val next = rows.foldLeft(prev) { (st, e) =>
            PriceState(id, st.n + 1, e.price,
              math.min(st.min_price, e.price), math.max(st.max_price, e.price))
          }
          state.update(next)
          next
      }
  }

  case class SessionAgg(key: String, n: Long, cents: Long, last_ms: Long)
  case class SessionOut(key: String, n: Long, cents: Long)

  /** Completed-session emission via flatMapGroupsWithState + EVENT-TIME
    * TIMEOUT — the programmable sibling of session_window (st4) and the
    * canonical custom-state streaming operator: accumulate per-key
    * session state as events arrive; when the watermark passes the last
    * event + `gap`, the state times out, the finished session is emitted
    * ONCE, and its state is freed. Append-mode output = exactly-once
    * session facts downstream. State is one small struct per active key,
    * partitioned across executors and bounded by the timeout (an idle
    * key's state cannot outlive watermark + gap — the property that
    * keeps 100 TB of traffic from accreting state forever).
    *
    * The input must carry a watermark on `ts` (timeout firing is defined
    * BY the watermark; without one EventTimeTimeout is rejected by the
    * engine).
    *
    * Gap semantics match session_window (st4) even when a key receives
    * data in consecutive batches: the timeout only fires for keys with NO
    * data in a batch, so the data branch itself must close sessions. Each
    * batch's events are sorted by event time and folded gap-aware — an
    * event landing more than `gap` after the running session's last event
    * CLOSES that session (emitted immediately, still exactly-once: append
    * mode, state replaced) and starts a new one, instead of folding an
    * arbitrarily long silence into one session. */
  def expiredSessions(events: Dataset[PriceEvent], gap: java.time.Duration): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gap.toMillis
    events.groupByKey(_.product_id)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (id: String, rows: Iterator[PriceEvent], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(s.key, s.n, s.cents))
          } else {
            // A micro-batch delivers events in arbitrary order; gap
            // detection needs event-time order within the batch.
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[SessionOut]
            val open = sorted.foldLeft(state.getOption) { (cur, e) =>
              val ms = e.ts.getTime
              val base = cur match {
                case Some(st) if ms > st.last_ms + gapMs =>
                  closed += SessionOut(st.key, st.n, st.cents)   // in-data gap
                  SessionAgg(id, 0L, 0L, 0L)
                case Some(st) => st
                case None     => SessionAgg(id, 0L, 0L, 0L)
              }
              Some(SessionAgg(id, base.n + 1,
                base.cents + math.floor(e.price * 100).toLong,
                math.max(base.last_ms, ms)))
            }
            open.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup: keep the first arrival per key — one state
    * row per key, partitioned across executors. Unbounded keyspaces need
    * a watermark + dropDuplicatesWithinWatermark to bound state; for a
    * keyed-id dedup (scrape drops re-delivering the same ads) the state
    * IS the key set and this is the right shape. */
  def dedupKeys(stream: DataFrame, keyCols: String*): DataFrame =
    stream.select(keyCols.map(col): _*).dropDuplicates(keyCols)

  /** Run a streaming frame to completion against a memory sink (local
    * verification harness; production uses a real sink + trigger). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Update()): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
