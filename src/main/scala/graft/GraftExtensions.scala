package graft

import graft.functions.SimHash64
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering the engine's native expressions for SQL
  * use. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`:
  *
  * {{{ SELECT graft_simhash64(text) FROM documents }}}
  *
  * No custom optimizer rules or planner strategies are required for
  * reference parity (SURVEY.md §4.2) — built-in Catalyst covers every
  * operator; this only adds scalar-function surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs.head)))
  }
}
