package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the two MinHash-LSH bucket strategies at the d2
  * parameters (bench tooling): fixed-cap buckets (`refineRows = 0` —
  * flooded buckets dropped, the pre-round-8 plan) vs adaptive bucket
  * refinement (`refineRows = 8` — flooded buckets split by the salted
  * refinement hash family, `Dedup.refineBuckets`). ScaleCheck C3 proved
  * the recall difference at sf10 (capped 0.71 exact vs refined 1.00);
  * this tool prices it — the wall-clock cost of generating and exactly
  * verifying the candidate pairs the cap silently dropped — so the
  * recall/cost frontier in the `refineBuckets` scaladoc is a published
  * measurement, not an assertion.
  *
  * Single timed pass per arm by default (the sf10 arms run minutes and
  * amortize codegen internally; SPARK_GRAFT_PASSES=2 for min-of-two at
  * small sf). Also reports each arm's pair count: refined ⊇ capped on
  * any corpus (refinement only ADDS surviving buckets), asserted here.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.NeardupAB
  */
object NeardupAB {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.cacheTables", "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.get("SPARK_GRAFT_PASSES").flatMap(_.toIntOption).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(1, cpus.toInt / 2))
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(length(graft.functions.TextFunctions.normalizeText(col("text"))) > 0)
      .cache()
    val nDocs = docs.count()

    // both arms run the catalog's shared d2 parameter constant — the A/B
    // prices exactly the configuration the catalog ships
    val p = graft.Queries.D2Params
    def arm(refineRows: Int): DataFrame =
      graft.operators.Dedup.minhashNearDup(docs, "text", "doc_id",
        p.bands, p.rowsPerBand, p.threshold, p.shingleN, p.maxBucket,
        refineRows = refineRows)

    // time a full materialization; min over `passes` runs (the cache is
    // filled on the LAST pass so the ⊇ check below reads a warm arm)
    def time(mk: => DataFrame): (Double, Long, DataFrame) = {
      var best = Double.MaxValue
      var last: DataFrame = null
      var rows = -1L
      for (p <- 1 to passes) {
        val d = mk
        val t0 = System.nanoTime()
        if (p == passes) { last = d.cache(); rows = last.count() }
        else d.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows, last)
    }

    // SPARK_GRAFT_AB_STAGES=1: decompose each arm — candidate count/time
    // vs end-to-end — and the TRUE-jaccard decile histogram of a candidate
    // sample. This is the data a verify pre-filter design needs: the
    // premium only yields to a cheap filter if the candidate mass sits
    // far below the threshold (discriminable), not just below it.
    if (sys.env.get("SPARK_GRAFT_AB_STAGES").contains("1")) {
      def cands(refineRows: Int): DataFrame =
        graft.operators.Dedup.minhashCandidates(docs, "text", "doc_id",
          p.bands, p.rowsPerBand, p.shingleN, p.maxBucket, refineRows)
      for ((tag, rr) <- Seq(("capped", 0), ("refined", 8))) {
        val t0 = System.nanoTime()
        val n = cands(rr).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"tool":"NeardupAB_stages","arm":"$tag","candidates":$n,"cand_s":$sec%.1f}""")
      }
      // deterministic ~1/16 sample of refined candidates, verified with no
      // threshold → where does the candidate mass sit vs t?
      val sample = cands(8)
        .where(pmod(xxhash64(col("id_a"), col("id_b")), lit(16)) === 0)
      val hist = graft.operators.Dedup.verifyJaccard(docs, sample,
          "text", "doc_id", threshold = 0.0, shingleN = p.shingleN)
        .groupBy(least(floor(col("jaccard") * 10), lit(9)).as("decile"))
        .count().orderBy("decile").collect()
        .map(r => s""""${r.get(0)}":${r.getLong(1)}""").mkString("{", ",", "}")
      println(s"""{"tool":"NeardupAB_stages","arm":"refined","sampled_true_j_deciles":$hist,"sample":"xxhash64(id_a,id_b)%16==0"}""")
    }

    // SPARK_GRAFT_AB_SELF=0 skips the self-dedup arms (re-running only
    // the incremental section after a partial run)
    if (!sys.env.get("SPARK_GRAFT_AB_SELF").contains("0")) {
    val (cs, cRows, capped) = time(arm(0))
    val (rs, rRows, refined) = time(arm(8))
    // refinement only splits flooded buckets it would otherwise DROP, so
    // its pair set must contain every capped pair
    val lost = capped.join(refined, Seq("id_a", "id_b"), "left_anti").count()
    require(lost == 0, s"refined plan lost $lost capped pairs — refinement must only ADD")
    println(f"""{"tool":"NeardupAB","sf_dir":"$sfDir","n_docs":$nDocs,"capped_s":$cs%.1f,"refined_s":$rs%.1f,"capped_pairs":$cRows,"refined_pairs":$rRows,"cost_ratio":${rs / cs}%.2f}""")

    // third arm: refined + the bottom-k sketch pre-filter — the catalog's
    // shipped adaptive configuration (neardupPairs routes through it above
    // the switch). Reports the filtered cost ratio AND exactly what the
    // filter costs in pairs: every lost pair's jaccard (must be
    // borderline — the Binom(k,j) drop bound collapses by j≈0.5), and
    // that no pair was ADDED (the filter only removes candidates).
    def armF(): DataFrame =
      graft.operators.Dedup.minhashNearDup(docs, "text", "doc_id",
        p.bands, p.rowsPerBand, p.threshold, p.shingleN, p.maxBucket,
        refineRows = 8, prefilterK = p.prefilterK)
    val (fs, fRows, filtered) = time(armF())
    val added = filtered.join(refined, Seq("id_a", "id_b"), "left_anti").count()
    require(added == 0, s"pre-filter ADDED $added pairs — it may only remove")
    val lostPairs = refined.join(filtered, Seq("id_a", "id_b"), "left_anti")
    val (nLost, maxLostJ) = {
      val r = lostPairs.agg(count(lit(1)), max(col("jaccard"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
    }
    println(f"""{"tool":"NeardupAB_prefilter","sf_dir":"$sfDir","n_docs":$nDocs,"prefilter_k":${p.prefilterK},"filtered_s":$fs%.1f,"filtered_pairs":$fRows,"pairs_lost":$nLost,"max_lost_jaccard":$maxLostJ%.4f,"cost_ratio_vs_capped":${fs / cs}%.2f,"cost_ratio_unfiltered":${rs / cs}%.2f}""")
    // drop every self-arm's cached plan and nudge the ContextCleaner:
    // their tens-of-GB shuffle spill is only reclaimed once the RDDs are
    // GC'd, and holding three arms' spill through the incremental arms
    // filled the disk on a 500k-doc run (the ScaleCheck lesson, here)
    filtered.unpersist(); capped.unpersist(); refined.unpersist()
    }
    System.gc()

    // ---- incremental (x14-shaped) arms: capped vs refined, like-for-like.
    // The d2 A/B cannot stand in for this one: the incremental candidate
    // join is asymmetric (new bands × history bands, per-side caps,
    // combined-occupancy flooding), and no superset invariant holds —
    // refinement SPLITS a bucket that passed the per-side caps but
    // flooded on combined occupancy, which can separate a cross-side
    // near-dup pair the capped plan kept. So this section reports both
    // arms' times and matched-doc counts; recall is ScaleCheck C7's job.
    if (!sys.env.get("SPARK_GRAFT_AB_INC").contains("0")) {
      val history = docs.where(col("doc_id") % 2 === 0)
      val incoming = docs.where(col("doc_id") % 2 === 1)
      def incArm(refineRows: Int): DataFrame =
        graft.operators.Dedup.incrementalNearDup(history, incoming,
          "text", "doc_id", p.bands, p.rowsPerBand, p.threshold, p.shingleN,
          p.maxBucket, refineRows = refineRows)
      val (ics, icRows, _) = time(incArm(0))
      val (irs, irRows, _) = time(incArm(8))
      println(f"""{"tool":"NeardupAB_incremental","sf_dir":"$sfDir","n_docs":$nDocs,"capped_s":$ics%.1f,"refined_s":$irs%.1f,"capped_matched":$icRows,"refined_matched":$irRows,"cost_ratio":${irs / ics}%.2f}""")

      // indexed arm: the history band-index + gram-set ARTIFACT is built
      // and materialized UNTIMED (it is computed once per history
      // snapshot, not per batch), then the batch-side operator is timed
      // consuming it — the per-batch cost an incremental pipeline
      // actually pays after persisting the history index.
      val idx = graft.operators.Dedup.historyBandIndex(history,
        "text", "doc_id", p.bands, p.rowsPerBand, p.shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hsets = graft.operators.Dedup.historyGramSets(history,
        "text", "doc_id", p.shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      idx.count(); hsets.count()
      val htexts = history.select(col("doc_id").as("id"), col("text"))
      def incIndexed(): DataFrame =
        graft.operators.Dedup.incrementalNearDupIndexed(idx, hsets, htexts,
          incoming, "text", "doc_id", p.bands, p.rowsPerBand, p.threshold,
          p.shingleN, p.maxBucket, refineRows = 8)
      val (ixs, ixRows, _) = time(incIndexed())
      println(f"""{"tool":"NeardupAB_incremental_indexed","sf_dir":"$sfDir","n_docs":$nDocs,"indexed_batch_s":$ixs%.1f,"indexed_matched":$ixRows,"vs_refined_direct":${ixs / irs}%.2f}""")
    }
    System.gc()

    // ---- design-ratio amortization arm (SPARK_GRAFT_AB_BATCHES=k): the
    // regime the history band-index artifact exists for. The 50/50 arm
    // above prices ONE batch at parity scale; a production ingestion
    // pipeline instead holds a large history (90% of the corpus here)
    // and lands SMALL consecutive batches (the remaining 10%, split into
    // k contiguous-id batches). Per batch we time:
    //   direct  — incrementalNearDup(refined), which re-bands and
    //             re-grams the full history side every batch;
    //   indexed — incrementalNearDupIndexed consuming ONE prebuilt
    //             persisted history index+gram-set artifact, whose build
    //             is timed once and amortizes across the k batches.
    // Matched-id counts are asserted equal per batch (the identity the
    // DedupSpec proves at fixture scale, re-checked at this ratio).
    sys.env.get("SPARK_GRAFT_AB_BATCHES").flatMap(_.toIntOption).foreach { k =>
      val history = docs.where(col("doc_id") % 10 =!= 9)
      val nHist = history.count()
      def batchOf(i: Int) = docs.where(col("doc_id") % 10 === 9 &&
        col("doc_id") >= nDocs.toLong * i / k &&
        col("doc_id") < nDocs.toLong * (i + 1) / k)
      def timeOnce(df: => DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val d = df.cache()
        val n = d.count()
        val s = (System.nanoTime() - t0) / 1e9
        d.unpersist()
        (s, n)
      }
      // artifact build: timed, once — this is the cost the amortization
      // claim must carry, not hide
      val tb0 = System.nanoTime()
      val idx = graft.operators.Dedup.historyBandIndex(history,
          "text", "doc_id", p.bands, p.rowsPerBand, p.shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hsets = graft.operators.Dedup.historyGramSets(history,
          "text", "doc_id", p.shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      idx.count(); hsets.count()
      val buildS = (System.nanoTime() - tb0) / 1e9
      val htexts = history.select(col("doc_id").as("id"), col("text"))
      var directTot = 0.0
      var indexedTot = 0.0
      for (i <- 0 until k) {
        val b = batchOf(i).cache()
        val nb = b.count()
        val (ds, dn) = timeOnce(graft.operators.Dedup.incrementalNearDup(
          history, b, "text", "doc_id", p.bands, p.rowsPerBand, p.threshold,
          p.shingleN, p.maxBucket, refineRows = 8))
        val (is, in) = timeOnce(graft.operators.Dedup.incrementalNearDupIndexed(
          idx, hsets, htexts, b, "text", "doc_id", p.bands, p.rowsPerBand,
          p.threshold, p.shingleN, p.maxBucket, refineRows = 8))
        require(dn == in,
          s"batch $i: indexed matched $in docs vs direct $dn — must be identical")
        directTot += ds; indexedTot += is
        println(f"""{"tool":"NeardupAB_batches","batch":$i,"batch_docs":$nb,"direct_s":$ds%.1f,"indexed_s":$is%.1f,"matched":$dn}""")
        b.unpersist()
      }
      idx.unpersist(); hsets.unpersist()
      println(f"""{"tool":"NeardupAB_batches_total","sf_dir":"$sfDir","n_docs":$nDocs,"history_docs":$nHist,"k":$k,"index_build_s":$buildS%.1f,"direct_total_s":$directTot%.1f,"indexed_total_s":$indexedTot%.1f,"indexed_plus_build_s":${buildS + indexedTot}%.1f,"amortized_ratio":${(buildS + indexedTot) / directTot}%.2f,"per_batch_ratio":${indexedTot / directTot}%.2f}""")
    }
    spark.stop()
  }
}
