package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked text retrieval — the search-engine complement of the
  * similarity family: given a term query, score documents with BM25
  * (Robertson/Spärck Jones; the Lucene-shaped idf
  * `ln((N − df + 0.5)/(df + 0.5) + 1)`, saturation k1, length
  * normalization b) and return the top k.
  *
  * Scale shape: the per-document term-frequency lists are emitted
  * map-side (native TermCounts — token instances never shuffle) and
  * immediately filtered to the QUERY vocabulary, so everything after the
  * scan is proportional to the postings of the query terms, not the
  * corpus: per-term document frequencies are a |Q|-row aggregate
  * (broadcast back), corpus size and average length are one broadcast
  * row, the per-document score sum shuffles only matching documents, and
  * the final top-k is a TakeOrdered — no global sort. */
object Retrieval {

  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "need query terms and k > 0")
    val docs = df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    // document lengths (total term instances) + corpus stats: one agg row
    val lens = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("__text")).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // postings restricted to the query vocabulary before any shuffle
    val tf = docs
      .select(col("doc_id"),
        explode(graft.functions.NativeTextColumns.termCounts(col("__text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .where(col("term").isin(queryTerms: _*))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df")) // |Q| rows
    val scored = tf
      .join(broadcast(dfs), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("term_score",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"),
        round(sum(col("term_score")), 4).as("score"))
    scored.orderBy(desc("score"), col("doc_id")).limit(k)
  }
}
