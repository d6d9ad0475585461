package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped, exactly-once memo of materialized DataFrames — the
  * in-process layer shared by the pipeline artifacts ([[PairGraph]]'s
  * near-dup pair graph, [[GroupStats]]' anomaly-family stats table).
  *
  * Semantics, each load-bearing:
  *
  *   - Exactly-once under concurrency: TrieMap.getOrElseUpdate has
  *     putIfAbsent semantics (the first INSERTED cell wins) but may
  *     evaluate the by-name default in several concurrent first callers.
  *     Storing an unforced lazy cell and forcing it AFTER insertion makes
  *     the expensive computation exactly-once: losers discard their
  *     (never-forced) cell and force the winner's. Without this, two
  *     concurrent first callers each ran the full pipeline and the
  *     loser's localCheckpoint leaked until GC (r11 verdict item 6;
  *     2-thread regression test in PairGraphSpec).
  *   - No poisoned cells: a THROWING thunk leaves its lazy val
  *     uninitialized, so every later caller would retry the computation
  *     serialized under the cell's monitor with no eviction path for a
  *     permanently-failing key. The forcing site evicts the failed cell
  *     (remove(k, OUR cell) — a concurrent successful recompute under a
  *     fresh cell is left alone) before rethrowing (r12 ADVICE).
  *     [[computeCount]] therefore counts computations that ran to
  *     COMPLETION.
  *   - Session-scoped: entries are keyed on the SparkSession INSTANCE
  *     (reference identity — sessions don't define value equality) and
  *     evicted when the session's SparkContext ends, so a long-lived JVM
  *     cycling sessions cannot leak checkpointed frames or resurrect a
  *     frame bound to a dead session.
  */
private[graft] final class FrameMemo {

  private final class Cell(thunk: () => DataFrame) {
    @volatile private[FrameMemo] var done = false
    lazy val value: DataFrame =
      { val r = thunk(); computeCount.incrementAndGet(); done = true; r }
  }

  /** Test probe: completed computations (vs memo hits / failures). */
  private[graft] val computeCount = new java.util.concurrent.atomic.AtomicInteger(0)

  private val cells =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Cell]
  // sessions whose context already carries our eviction listener
  private val listening =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def getOrCompute(sess: SparkSession, key: String)(thunk: => DataFrame): DataFrame = {
    evictOnStop(sess)
    val k = (sess, key)
    val cell = cells.getOrElseUpdate(k, new Cell(() => thunk))
    try cell.value
    catch { case t: Throwable => cells.remove(k, cell); throw t }
  }

  /** The already-COMPUTED frame under `key`, if any — never forces a
    * pending or unforced cell (forcing would run the computation). Lets
    * an artifact serve a cheaper tier as a projection of a richer one
    * when the richer one happens to be materialized already. */
  def peek(sess: SparkSession, key: String): Option[DataFrame] =
    cells.get((sess, key)).filter(_.done).map(_.value)

  /** Drop every entry (test isolation; bench harnesses that must time
    * computation, not reuse). */
  def clear(): Unit = cells.clear()

  /** Drop one session's entries — called by the application-end listener;
    * package-private so specs can exercise eviction without stopping a
    * shared test context. */
  private[graft] def evictSession(sess: SparkSession): Unit = {
    cells.keys.filter(_._1 eq sess).foreach(cells.remove)
    listening.remove(sess); ()
  }

  private def evictOnStop(sess: SparkSession): Unit =
    if (listening.add(sess))
      sess.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictSession(sess)
      })
}
