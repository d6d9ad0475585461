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

  test("bloom decontamination: identical result to the exact join, and the " +
      "corpus gram stream is bloom-filtered before the shuffle") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(fn: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, Int, Double) => org.apache.spark.sql.DataFrame) =
      fn(d.where(col("doc_id") % 10 =!= 0), d.where(col("doc_id") % 10 === 0),
          "text", "doc_id", 2, 0.1)
    val exact = run(Decontaminate.overlapAgainst(_, _, _, _, _, _))
    val bloomed = run(Decontaminate.overlapAgainstBloom(_, _, _, _, _, _))
    assert(bloomed.collect().map(_.toSeq).toSet == exact.collect().map(_.toSeq).toSet)
    // the reduction is actually in the plan (not optimized away)
    assert(bloomed.queryExecution.executedPlan.toString
      .contains("graft_bloom_might_contain"))
  }

  test("index decontamination: identical result to the exact join; zero-" +
      "shuffle argmax runs through the broadcast inverted index") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(fn: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, Int, Double) => org.apache.spark.sql.DataFrame) =
      fn(d.where(col("doc_id") % 10 =!= 0), d.where(col("doc_id") % 10 === 0),
          "text", "doc_id", 2, 0.1)
    val exact = run(Decontaminate.overlapAgainst(_, _, _, _, _, _))
    val indexed = run(Decontaminate.overlapAgainstIndex(_, _, _, _, _, _))
    assert(indexed.collect().map(_.toSeq).toSet == exact.collect().map(_.toSeq).toSet)
    assert(indexed.queryExecution.executedPlan.toString
      .contains("graft_top_eval_overlap"))
    // the whole corpus side is ONE narrow stage: no shuffle anywhere
    assert(!indexed.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("decontamination auto entry: postings budget picks the index plan " +
      "small, the hit-rate router beyond it; every route exact") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (corpus, evalSet) =
      (d.where(col("doc_id") % 10 =!= 0), d.where(col("doc_id") % 10 === 0))
    val exact = Decontaminate.overlapAgainst(
      corpus, evalSet, "text", "doc_id", 2, 0.1).collect().map(_.toSeq).toSet
    val viaIndex = Decontaminate.overlap(corpus, evalSet, "text", "doc_id", 2, 0.1)
    // big-eval + flooded vocabulary (this corpus shares its whole bigram
    // vocabulary): the router must NOT pick bloom — it measures hit rate
    // ~1.0 and takes the chunked index path
    val viaChunked = Decontaminate.overlap(corpus, evalSet, "text", "doc_id",
      2, 0.1, indexMaxPostings = 1L)
    // big-eval with the bloom route forced (impossible hit-rate bar) —
    // the discriminative-vocabulary arm, still exact
    val viaBloom = Decontaminate.overlap(corpus, evalSet, "text", "doc_id", 2,
      0.1, indexMaxPostings = 1L, bloomMaxHitRate = 1.01)
    assert(viaIndex.queryExecution.executedPlan.toString
      .contains("graft_top_eval_overlap"))
    assert(viaChunked.queryExecution.executedPlan.toString
      .contains("graft_top_eval_overlap"))
    assert(!viaChunked.queryExecution.executedPlan.toString
      .contains("graft_bloom_might_contain"))
    assert(viaBloom.queryExecution.executedPlan.toString
      .contains("graft_bloom_might_contain"))
    assert(viaIndex.collect().map(_.toSeq).toSet == exact)
    assert(viaChunked.collect().map(_.toSeq).toSet == exact)
    assert(viaBloom.collect().map(_.toSeq).toSet == exact)
  }

  test("chunked index decontamination: multi-chunk winners merge bit-" +
      "identically to the exact join on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (corpus, evalSet) =
      (d.where(col("doc_id") % 10 =!= 0), d.where(col("doc_id") % 10 === 0))
    val postings = evalSet.select(
      sum(size(graft.operators.Dedup.gramHashSet(col("text"), 2)))).head().getLong(0)
    val exact = Decontaminate.overlapAgainst(
      corpus, evalSet, "text", "doc_id", 2, 0.1).collect().map(_.toSeq).toSet
    // quarter-budget → ~5 chunks; the x9d catalog entry's construction
    val chunked = Decontaminate.overlapAgainstIndexChunked(corpus, evalSet,
      "text", "doc_id", 2, 0.1, chunkPostings = math.max(1L, postings / 4))
    assert(chunked.collect().map(_.toSeq).toSet == exact)
    // schema parity with the join formulations (the overlap contract)
    assert(chunked.schema("eval_id").dataType ==
      Decontaminate.overlapAgainst(corpus, evalSet, "text", "doc_id", 2, 0.1)
        .schema("eval_id").dataType)
  }

  test("chunked index decontamination: cross-chunk ties break to the " +
      "smallest eval id; higher rounded overlap in a later chunk wins") {
    // chunkPostings=1 → every eval doc is its own chunk, so every
    // comparison below crosses a chunk boundary
    val evalSet = Seq(
      (10L, "one two three"),          // chunk 1
      (20L, "one two three"),          // chunk 2 — identical: tie with 10
      (30L, "one two five seven")      // chunk 3 — covers doc 2 fully
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "one two four"),   // inter 1/2 vs both 10 and 20 → tie → 10
      (2L, "one two five")    // vs 30: 2/2 = 1.0 beats 10/20's 1/2
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlapAgainstIndexChunked(corpus, evalSet,
        "text", "doc_id", shingleN = 2, threshold = 0.1, chunkPostings = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 10L, 0.5), (2L, 30L, 1.0)))
    // same answers as the window-formulation join, bit for bit
    val exact = Decontaminate.overlapAgainst(corpus, evalSet,
        "text", "doc_id", shingleN = 2, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exact)
  }

  test("hit-rate router measurement: flooded vocabulary reads ~1, " +
      "disjoint reads ~fpp — and the disjoint route is bloom naturally") {
    import graft.operators.Dedup
    val evalSet = Seq((10L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val eg = evalSet.select(explode(
      Dedup.gramHashSet(col("text"), 2)).as("gram"))
    val bloom = eg.stat.bloomFilter("gram", 1000L, 0.01)
    val flooded = Seq((1L, "alpha beta gamma"), (2L, "gamma delta epsilon"))
      .toDF("doc_id", "text") // every corpus bigram is an eval bigram
    val disjoint = Seq((1L, "wholly different words entirely"),
      (2L, "nothing shared with that eval document"))
      .toDF("doc_id", "text")
    assert(Decontaminate.corpusBloomHitRate(flooded, "text", 2, bloom) == 1.0)
    assert(Decontaminate.corpusBloomHitRate(disjoint, "text", 2, bloom) < 0.5)
    // end-to-end: a big-eval call over the disjoint corpus routes to the
    // bloom join without any forcing — the measured rate is low
    val routed = Decontaminate.overlap(disjoint, evalSet, "text", "doc_id",
      2, 0.1, indexMaxPostings = 1L)
    assert(routed.queryExecution.executedPlan.toString
      .contains("graft_bloom_might_contain"))
    assert(routed.count() == 0) // nothing shared → nothing flagged
  }

  test("index decontamination: direct calls enforce the postings budget, " +
      "and the eval_id output type follows the input id type") {
    val evalSet = Seq((100, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq((1, "alpha beta gamma zeta")).toDF("doc_id", "text")
    // reject path: an unbudgeted direct call must not build an unbounded
    // driver index (r9 verdict item 8 — the budget lived only in overlap)
    val e = intercept[IllegalArgumentException] {
      Decontaminate.overlapAgainstIndex(corpus, evalSet, "text", "doc_id",
        shingleN = 2, threshold = 0.1, postingsBudget = 1L)
    }
    assert(e.getMessage.contains("Decontaminate.overlap"))
    // type consistency: int ids in → int eval_id out, same as the join
    // formulations (r9 ADVICE: the index plan used to widen to long)
    val viaIndex = Decontaminate.overlapAgainstIndex(corpus, evalSet, "text",
      "doc_id", shingleN = 2, threshold = 0.1)
    val viaJoin = Decontaminate.overlapAgainst(corpus, evalSet, "text",
      "doc_id", shingleN = 2, threshold = 0.1)
    assert(viaIndex.schema("eval_id").dataType == viaJoin.schema("eval_id").dataType)
    assert(viaIndex.collect().map(_.toSeq).toSet == viaJoin.collect().map(_.toSeq).toSet)
  }

  test("bloom might-contain: no false negatives; codegen and interpreted agree") {
    import graft.functions.BloomFilterColumns
    val keys = (1L to 500L).map(_ * 7919L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(500, 0.01)
    keys.foreach(bloom.putLong)
    val df = (1L to 5000L).toDF("v")
    val kept = df.where(BloomFilterColumns.mightContainLong(col("v") * 7919L, bloom))
      .collect().map(_.getLong(0)).toSet
    assert((1L to 500L).toSet.subsetOf(kept)) // every inserted key passes
    // interpreted path (outside codegen) matches
    keys.foreach(k => assert(bloom.mightContainLong(k)))
  }

  test("repetition stats: hand-computed fractions, one-pass native expression") {
    // tokens: a a b a  → n_tok 4, distinct 2 → dup 2
    // bigrams: "a a","a b","b a" → top 1, n 3
    val d = Seq((1L, "a a b a"), (2L, "x y"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        graft.functions.TextStats.repetitionStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_tok"), col("st.dup_tok"),
        col("st.top_bigram"), col("st.n_bigrams"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    // doc 2: k ≤ 2 → single whole-text gram; doc 3: bigram "c c" ×3
    assert(got == Set((1L, 4, 2, 1, 3), (2L, 2, 0, 1, 1), (3L, 4, 3, 3, 3)))
  }

  test("per-key cap: at most K rows per key, deterministic across runs") {
    import graft.operators.Sampling
    val d = (1L to 100L).map(i => (i, s"k${i % 4}")).toDF("id", "key")
    val a = Sampling.capPerKey(d, "key", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(a.length == 20 && a.forall(_._3 <= 5))
    assert(a.groupBy(_._2).forall(_._2.length == 5))
    val b = Sampling.capPerKey(d, "key", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq) // same rows every run
  }

  test("mixture sampling: rates from actual counts, shortfall keeps all, allowlist drops") {
    import graft.operators.Sampling
    // 1000 'big' rows, 30 'small' rows, 50 'other' rows (no target)
    val d = ((1L to 1000L).map((_, "big")) ++ (2001L to 2030L).map((_, "small")) ++
      (3001L to 3050L).map((_, "other"))).toDF("id", "stratum")
    val out = Sampling.mixture(d, "id", "stratum",
      targets = Map("big" -> 0.5, "small" -> 0.5), totalBudget = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("stratum")))
    val bySt = out.groupBy(_._2).view.mapValues(_.length).toMap
    // big: rate = 100·0.5/1000 = 500bp → ~50 rows (binomial, wide margin)
    assert(bySt("big") > 20 && bySt("big") < 90, s"big got ${bySt.get("big")}")
    // small: target 50 rows > 30 available → rate clamps to 1, keep all 30
    assert(bySt("small") == 30, s"small got ${bySt.get("small")}")
    // 'other' has no target share: dropped entirely
    assert(!bySt.contains("other"))
    // deterministic: the exact same row set on a second run
    val again = Sampling.mixture(d, "id", "stratum",
      targets = Map("big" -> 0.5, "small" -> 0.5), totalBudget = 100L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("stratum")))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("epoch shuffle: seeded permutation is stable, seeds differ, head is TakeOrdered") {
    import graft.operators.Sampling
    val d = (1L to 200L).toDF("id")
    def order(seed: String): Seq[Long] =
      Sampling.epochShuffle(d, "id", seed).collect().map(_.getLong(0)).toSeq
    val e1 = order("ep1")
    assert(e1 == order("ep1"))                  // same seed → same permutation
    assert(e1.sorted == (1L to 200L))           // a permutation, nothing lost
    assert(e1 != order("ep2"))                  // new seed → new epoch order
    assert(e1 != (1L to 200L))                  // actually shuffled
    // a head sample must not materialize the full sort
    val headPlan = Sampling.epochShuffle(d, "id", "ep1").limit(5)
      .queryExecution.executedPlan.toString
    assert(headPlan.contains("TakeOrderedAndProject"), headPlan)
  }

  test("token chunking: windows overlap by chunk-stride, every token covered, short docs whole") {
    import graft.operators.Packing
    // 25 alphabetic tokens (digits split off under the BPE-ish regex)
    val words = ('a' to 'y').map(c => s"tok$c").mkString(" ")
    val d = Seq((1L, words), (2L, "just five little tokens here"), (3L, null: String))
      .toDF("doc_id", "text")
    val out = Packing.chunkByTokens(d, "doc_id", "text", chunkTokens = 10, stride = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3), r.getString(4)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 25 tokens, window 10, stride 6 → ceil((25-10)/6)+1 = 4 chunks
    assert(doc1.length == 4)
    assert(doc1.map(_._3).toSeq == Seq(10, 10, 10, 7)) // final chunk short
    // consecutive chunks share chunkTokens - stride = 4 tokens of context
    val c0 = doc1(0)._4.split(" "); val c1 = doc1(1)._4.split(" ")
    assert(c0.takeRight(4).toSeq == c1.take(4).toSeq)
    // every token appears in at least one chunk, in order
    assert(doc1.flatMap(_._4.split(" ")).distinct.length == 25)
    // short doc → exactly one whole chunk; null text → one empty chunk
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2(0)._3 == 5)
    val doc3 = out.filter(_._1 == 3L)
    assert(doc3.length == 1 && doc3(0)._3 == 0 && doc3(0)._4 == "")
  }

  test("bm25: multi-term hits outrank single-term, saturation caps spam, length normalized") {
    import graft.operators.Retrieval
    val corpus = Seq(
      (1L, "spark hash join strategies"),                       // 2 query terms, short
      (2L, "spark spark spark spark spark spark spark spark"),  // tf spam, 1 term
      (3L, "hash tables explained at length with many many extra words padding the document"),
      (4L, "nothing relevant here at all"),
      (5L, "spark hash batch processing")                       // all 3 terms
    ).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(corpus, "text", "doc_id",
        Seq("spark", "hash", "batch"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val rankById = top.sortBy(-_._3).map(_._1).toSeq
    // the doc hitting all three terms wins; tf-spam does NOT beat
    // term diversity (k1 saturates repeated terms)
    assert(rankById.head == 5L, s"got ranking $rankById")
    assert(top.find(_._1 == 5L).get._2 == 3L)
    // doc 4 (no query term) never appears
    assert(!top.exists(_._1 == 4L))
    // doc 1 (2 distinct short) outranks doc 2 (1 term spammed)
    val s1 = top.find(_._1 == 1L).get._3
    val s2 = top.find(_._1 == 2L).get._3
    assert(s1 > s2, s"diversity lost to spam: $s1 vs $s2")
  }

  test("LLM transport from env: url selects the real client, absence selects the stub") {
    import graft.operators.LlmEnrich
    assert(LlmEnrich.transportFromEnv(Map.empty).isInstanceOf[LlmEnrich.StubTransport])
    val real = LlmEnrich.transportFromEnv(
      Map("GRAFT_OLLAMA_URL" -> "http://h:11434/api/generate"))
    assert(real.isInstanceOf[LlmEnrich.OllamaTransport])
  }

  test("token-budget selection: boundary class refined by id, whole classes admitted") {
    import graft.operators.Sampling
    val d = Seq((1L, 0.9, 5L), (2L, 0.9, 5L), (3L, 0.8, 4L), (4L, 0.8, 4L),
      (5L, 0.7, 10L)).toDF("id", "score", "tokens")
    def ids(budget: Long): Set[Long] =
      Sampling.selectByTokenBudget(d, "score", "tokens", "id", budget)
        .collect().map(_.getLong(0)).toSet
    // 0.9-class (10) fits; 0.8-class (8) splits: doc3 lands at 14, doc4 at 18
    assert(ids(15) == Set(1L, 2L, 3L))
    // budget inside the top class: refine it directly
    assert(ids(7) == Set(1L))
    // boundary exactly at budget is kept (inclusive prefix rule)
    assert(ids(14) == Set(1L, 2L, 3L))
    // everything fits
    assert(ids(30) == Set(1L, 2L, 3L, 4L, 5L))
    // budget below the first doc: empty
    assert(ids(4) == Set.empty[Long])
  }

  test("token-budget selection: decomposed plan equals the one-window global rule") {
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    // pseudo-random but deterministic scores/tokens; many score ties so
    // whole-class admission, boundary refinement, and unique scores all occur
    val d = spark.range(0, 300, 1, 8)
      .select(col("id"), round((pmod(hash(col("id")), lit(17)) / 16.0), 4).as("score"),
        (pmod(hash(col("id"), lit(1)), lit(9)) + 1).cast("long").as("tokens"))
    val budget = 400L
    val w = Window.orderBy(desc("score"), asc("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.withColumn("cum", sum("tokens").over(w))
      .where(col("cum") <= budget).select("id")
      .collect().map(_.getLong(0)).toSet
    val got = Sampling.selectByTokenBudget(d, "score", "tokens", "id", budget)
      .collect().map(_.getLong(0)).toSet
    assert(got == naive, s"decomposed ${got.size} vs naive ${naive.size}")
  }
}
