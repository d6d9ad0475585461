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
}
