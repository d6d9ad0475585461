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
  *   - Session-scoped entries, CONTEXT-scoped eviction: entries are
  *     keyed on the SparkSession INSTANCE (reference identity — sessions
  *     don't define value equality); one listener per SparkContext
  *     evicts every session of that context when the context stops, so a
  *     JVM cycling whole contexts cannot leak checkpointed frames or
  *     resurrect a frame bound to a dead context. A JVM cycling
  *     `newSession()` clones over ONE long-lived context does accumulate
  *     entries until that context stops (the frames stay readable — the
  *     checkpoint blocks belong to the live context); such a caller
  *     should evict explicitly ([[clear]]) between session generations.
  *     (A weak-keyed map cannot fix this transparently: the memoized
  *     DataFrame strongly references its session, so every entry's value
  *     would pin its own key.)
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
  // contexts that already carry our eviction listener — keyed on the
  // CONTEXT, not the session: onApplicationEnd is a context event, and a
  // per-session listener would pile one bus entry per newSession() clone
  // onto the shared context (r13 ADVICE)
  private val listening =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, java.lang.Boolean]())

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

  /** Drop one session's entries — package-private so specs can exercise
    * eviction without stopping a shared test context. */
  private[graft] def evictSession(sess: SparkSession): Unit = {
    cells.keys.filter(_._1 eq sess).foreach(cells.remove)
    ()
  }

  /** Drop every entry whose session rides `sc` — the application-end
    * listener's action, covering newSession() clones too. */
  private[graft] def evictContext(sc: org.apache.spark.SparkContext): Unit = {
    cells.keys.filter(_._1.sparkContext eq sc).foreach(cells.remove)
    listening.remove(sc); ()
  }

  private def evictOnStop(sess: SparkSession): Unit = {
    val sc = sess.sparkContext
    if (listening.add(sc))
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictContext(sc)
      })
  }
}
