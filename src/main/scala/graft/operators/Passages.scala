package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact repeated-passage detection — the substring-grain dedup signal
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
  * Better"): boilerplate, licenses, and templated spans repeat VERBATIM
  * across documents whose full texts differ, so document-level dedup
  * (exact or near) never catches them. The passage unit here is the word
  * n-gram over the same normalization as the rest of the dedup family
  * (lowercase, non-alphanumerics collapsed), distinct per document.
  *
  * Scale shape: one explode of per-document DISTINCT n-grams, one hash
  * aggregation keyed on the passage. Map-side combine collapses exactly
  * the repeated passages (the ones we're after); the long unique tail
  * shuffles once and dies in the HAVING filter. At 100 TB the shuffle
  * carries O(total tokens) small rows — the inherent cost of an exact
  * passage census; to cut bytes (not rows) further, count 8-byte
  * `xxhash64(passage)` keys first and semi-join the hot hashes back for
  * strings, trading a second scan for a narrower exchange (same
  * two-pass trade as [[Decontaminate]]'s bloom path).
  */
object Passages {

  private def passages(df: DataFrame, textCol: String, idCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
      explode(graft.functions.NativeTextColumns.wordShingles(col(textCol), n))
        .as("passage"))

  /** Word n-gram passages occurring in at least `minDocs` distinct
    * documents: (passage, n_docs, first_doc). Within-document repeats
    * count once (the shingle set is distinct per doc), so n_docs is a
    * true document frequency. */
  def repeatedPassages(df: DataFrame, textCol: String, idCol: String,
                       n: Int, minDocs: Int): DataFrame =
    passages(df, textCol, idCol, n)
      .groupBy("passage")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .where(col("n_docs") >= minDocs)

  /** Per-document flags: for every document containing at least one
    * repeated passage, how many of its passages are repeated and the
    * widest spread among them — the triage table a curation run uses to
    * decide trim-vs-drop. Recomputes the shingle explode rather than
    * caching it: the gram table is O(corpus) and a second scan is the
    * scale-appropriate price (same choice as the decontamination path). */
  def flagPassageDocs(df: DataFrame, textCol: String, idCol: String,
                      n: Int, minDocs: Int): DataFrame = {
    val hot = repeatedPassages(df, textCol, idCol, n, minDocs)
      .select(col("passage"), col("n_docs"))
    passages(df, textCol, idCol, n)
      .join(hot, "passage")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_repeated_passages"),
        max(col("n_docs")).as("max_passage_docs"))
  }
}
