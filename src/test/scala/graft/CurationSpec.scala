package graft

import graft.operators.{Decontaminate, Packing}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Decontamination and sequence-packing fixtures (hand-computed). */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("decontamination: overlap fraction, best eval match, threshold") {
    // eval doc 100: bigrams {alpha beta, beta gamma, gamma delta}
    val evalSet = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma zeta"),   // shares 2 of its 3 bigrams → 0.6667
      (2L, "entirely unrelated words herein"), // no shared grams → absent
      (3L, "alpha beta only")          // shares 1 of 2 → 0.5
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlapAgainst(corpus, evalSet, "text", "doc_id",
        shingleN = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 100L, 0.6667), (3L, 100L, 0.5)))
  }

  test("decontamination: best match wins, ties break to smallest eval id") {
    val evalSet = Seq((10L, "one two three"), (20L, "one two three"))
      .toDF("doc_id", "text") // identical eval docs → tie on overlap
    val corpus = Seq((1L, "one two four")).toDF("doc_id", "text")
    val got = Decontaminate.overlapAgainst(corpus, evalSet, "text", "doc_id",
      shingleN = 2, threshold = 0.1).collect()
    assert(got.length == 1 && got(0).getLong(1) == 10L)
  }

  test("sequence packing: concat-then-chunk pack ids from running offsets") {
    // token counts 3,2,4,1 with budget 5 → start offsets 0,3,5,9 → packs 0,0,1,1
    val d = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val got = Packing.assignPacks(d, "source", "doc_id",
        TextFunctions.bpeTokenCount(col("text")), budget = 5)
      .select("doc_id", "n_tok", "pack_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3, 0L), (2L, 2, 0L), (3L, 4, 1L), (4L, 1, 1L)))
  }

  test("sequence packing: packing is per partition key (keys never interleave)") {
    val d = Seq(("a", 1L, "w x y z"), ("b", 2L, "w x y z"))
      .toDF("source", "doc_id", "text")
    val got = Packing.assignPacks(d, "source", "doc_id",
        TextFunctions.bpeTokenCount(col("text")), budget = 3)
      .select("source", "pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // each source starts its own pack 0 — offsets do not leak across keys
    assert(got == Set(("a", 0L), ("b", 0L)))
  }
}
