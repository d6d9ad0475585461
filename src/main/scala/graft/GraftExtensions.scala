package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering the engine's native expressions for SQL
  * use. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`:
  *
  * {{{
  * SELECT graft_simhash64(text),
  *        graft_word_shingles(text, 2),
  *        graft_minhash_signature(text, 8, 2),
  *        graft_gram_hashes(text, 2),
  *        graft_text_stats(text).n_tok,
  *        graft_vec_dot(embedding, embedding)
  * FROM documents
  * }}}
  *
  * No custom optimizer rules or planner strategies are required for
  * reference parity (SURVEY.md §4.2) — built-in Catalyst covers every
  * operator; this only adds scalar-function surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    def register(name: String, clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))

    register("graft_simhash64", classOf[SimHash64], exprs => SimHash64(exprs.head))
    register("graft_word_shingles", classOf[WordShingles],
      exprs => WordShingles(exprs.head, intArg(exprs(1), "n")))
    register("graft_minhash_signature", classOf[MinHashSignature],
      exprs => MinHashSignature(exprs.head,
        intArg(exprs(1), "numHashes"), intArg(exprs(2), "shingleN")))
    register("graft_gram_hashes", classOf[GramHashes],
      exprs => GramHashes(exprs.head, intArg(exprs(1), "shingleN")))
    register("graft_text_stats", classOf[TextStats], exprs => TextStats(exprs.head))
    register("graft_repetition_stats", classOf[RepetitionStats],
      exprs => RepetitionStats(exprs.head))
    register("graft_term_counts", classOf[TermCounts], exprs => TermCounts(exprs.head))
    register("graft_vec_dot", classOf[VecDot], exprs => VecDot(exprs.head, exprs(1)))
    register("graft_brand_lookup", classOf[BrandMapLookup], exprs => {
      // graft_brand_lookup(str) — the shared pipeline map with Title Case
      // fallback (the F3 scan); custom maps stay a Scala-API concern
      val keys = graft.functions.ScalarFunctions.BrandMap.keys.toSeq
      val vals = graft.functions.ScalarFunctions.BrandMap.values.toSeq
      BrandMapLookup(exprs.head, keys, vals, titleCaseFallback = true)
    })
  }
}
