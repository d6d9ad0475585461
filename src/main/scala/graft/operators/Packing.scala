package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: assign documents to fixed
  * token-budget packs with concat-then-chunk semantics — documents are
  * laid out in a deterministic order and pack k covers token offsets
  * [k·budget, (k+1)·budget); a document belongs to the pack its FIRST
  * token falls in (it may straddle the boundary, exactly as GPT-style
  * pretraining chunking does).
  *
  * Shape at scale: one running-sum window per partition key. Packing is
  * an inherently sequential fold over an ordered stream, so the
  * parallelism unit is the partition key (source, shard, language...) —
  * pick a key with enough cardinality for the cluster, never pack the
  * whole corpus under one key.
  */
object Packing {

  /** Adds `n_tok` (the token count) and `pack_id` (the budget-chunk the
    * document starts in, 0-based per partition key, deterministic by
    * orderCol). */
  def assignPacks(df: DataFrame, partitionCol: String, orderCol: String,
                  tokenCount: Column, budget: Int): DataFrame = {
    require(budget > 0, "pack budget must be positive")
    val w = Window.partitionBy(partitionCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tok", tokenCount)
      .withColumn("pack_id",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / budget))
  }

  /** Packing's inverse — split each document into overlapping
    * token-window chunks (the standard long-document pre-tokenization
    * step: context windows of `chunkTokens` tokens advancing by `stride`,
    * so consecutive chunks share `chunkTokens − stride` tokens of
    * context). Tokens come from the same BPE-ish pre-tokenizer regex as
    * [[graft.functions.TextFunctions.bpeTokenCount]]; a document of
    * ≤ chunkTokens tokens (including an empty one) yields exactly one
    * chunk, and the final chunk of a longer document may be short —
    * every token lands in at least one chunk.
    *
    * Output: one row per (doc, chunk_idx) with `n_tok` (document total),
    * `chunk_tok` (this chunk's token count) and `chunk_text` (the
    * space-joined token window). Shape at scale: pure per-row column
    * math + one explode — runs inside the scan stage, no shuffle; the
    * ~chunkTokens/stride× row amplification is the operator's output,
    * not an intermediate. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val toks = regexp_extract_all(coalesce(col(textCol), lit("")),
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))
    val nChunks = when(col("n_tok") <= chunkTokens, lit(1L))
      .otherwise(ceil((col("n_tok") - chunkTokens).cast("double") / stride)
        .cast("long") + 1L)
    df.select(col(idCol), toks.as("__toks"))
      .withColumn("n_tok", size(col("__toks")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), nChunks - 1)))
      .select(col(idCol), col("n_tok"), col("chunk_idx"),
        least(lit(chunkTokens), col("n_tok") - col("chunk_idx") * stride)
          .cast("int").as("chunk_tok"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }
}
