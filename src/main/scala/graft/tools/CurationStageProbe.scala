package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition of the composed curation pipeline (x13) at scale
  * (bench tooling): times each of x13's four stages — quality gate,
  * near-dedup (pair graph + components + survivor join), benchmark
  * decontamination, sequence packing — by materializing them in order,
  * exactly as the catalog query composes them (the probe calls the SAME
  * `Queries.x13*` stage functions the catalog entry runs).
  *
  * The decontamination stage is additionally run under BOTH plans:
  *   - `routed` — `Decontaminate.overlap`, what x13 ships since r12
  *     (hit-rate-routed: index / bloom-join / chunked);
  *   - `join`   — the plain inverted-index gram join x13 shipped before
  *     r12, corpus-quadratic on this corpus's flooded vocabulary (the
  *     r11 router finding; x13 was the engine's last composed caller on
  *     that plan class).
  * Equal result rows are asserted; the difference is what routing saved.
  * SPARK_GRAFT_PROBE_ARMS=routed skips the join arm (for scales where
  * the quadratic arm is not worth the wall-clock).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.CurationStageProbe
  */
object CurationStageProbe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.cacheTables", "true")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val arms = sys.env.getOrElse("SPARK_GRAFT_PROBE_ARMS", "routed,join")
      .split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(1, cpus.toInt / 2))
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.PairGraph.clearInProcess()
    graft.operators.SemanticPairGraph.clearInProcess()
    graft.operators.GroupStats.clearInProcess()
    graft.Queries.prewarmTables(spark, sfDir)

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // stage 1 — quality gate (localCheckpoint materializes on count)
    val (tGate, kept) = timed {
      val k = graft.Queries.x13Kept(spark, sfDir)
      k.count()
      k
    }
    out += "gate_s" -> tGate
    val nKept = kept.count()

    // stage 2 — near-dedup: pair-graph build + components + survivor join
    val (tDedup, surv) = timed {
      val sv = graft.Queries.x13Survivors(sfDir, kept)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sv.count()
      sv
    }
    out += "neardedup_s" -> tDedup
    val nSurv = surv.count()

    // optional comparison arm (SPARK_GRAFT_PROBE_CAPPED_DEDUP=1): the
    // near-dedup stage with the FIXED-CAP candidate plan (refineRows=0,
    // same bands/cap/prefilter as the shipping D2Params) instead of the
    // auto→adaptive route the stage takes above its 100k-doc switch.
    // Reports time AND the survivor-count delta: on a flooded-vocabulary
    // corpus the capped plan drops over-cap buckets wholesale, so a
    // faster time with fewer absorbed docs is a recall loss, not a win
    // (the wide-vocab C9 run shows the regime where the two plans are
    // identical). Measurement only — the catalog stage is unchanged.
    if (sys.env.get("SPARK_GRAFT_PROBE_CAPPED_DEDUP").contains("1")) {
      val p = graft.Queries.D2Params
      val (tCap, nSurvCap) = timed {
        val pairs = graft.operators.Dedup.minhashNearDup(kept, "text",
          "doc_id", p.bands, p.rowsPerBand, p.threshold, p.shingleN,
          p.maxBucket, refineRows = 0, prefilterK = p.prefilterK)
        val labels = graft.operators.Dedup.connectedComponents(
          kept.select(col("doc_id").as("id")), pairs)
        kept.join(labels.where(col("id") === col("cluster_id"))
          .select(col("id").as("doc_id")), "doc_id").count()
      }
      out += "neardedup_capped_s" -> tCap
      out += "survivors_capped" -> nSurvCap.toDouble
    }

    // stage 3 — decontamination, both arms over identical inputs
    val (corpus, evalSet) = graft.Queries.x13DecontInputs(spark, sfDir, surv)
    val nEval = evalSet.count()
    var cleanRouted: DataFrame = null
    if (arms("routed")) {
      val (tR, n) = timed {
        val cont = graft.operators.Decontaminate.overlap(
          corpus, evalSet, "text", "doc_id", shingleN = 2, threshold = 0.2)
        cleanRouted = corpus.join(cont.select("doc_id"), Seq("doc_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cleanRouted.count()
      }
      out += "decont_routed_s" -> tR
      out += "clean_docs" -> n.toDouble
    }
    if (arms("join")) {
      val (tJ, nJ) = timed {
        val cont = graft.operators.Decontaminate.overlapAgainst(
          corpus, evalSet, "text", "doc_id", shingleN = 2, threshold = 0.2)
        corpus.join(cont.select("doc_id"), Seq("doc_id"), "left_anti").count()
      }
      out += "decont_join_s" -> tJ
      if (cleanRouted != null)
        require(nJ == cleanRouted.count(),
          s"join arm kept $nJ docs vs routed ${cleanRouted.count()} — plans must agree")
    }

    // stage 4 — packing + the final per-pack aggregate
    if (cleanRouted != null) {
      val (tP, _) = timed(graft.Queries.x13Pack(cleanRouted).count())
      out += "pack_s" -> tP
    }
    surv.unpersist()
    if (cleanRouted != null) cleanRouted.unpersist()

    val fields = out.map { case (k, v) => f""""$k":$v%.1f""" }.mkString(",")
    // total_routed_s only exists when the routed arm actually ran — a
    // join-only run would otherwise sum missing stage keys into a
    // misleading near-zero total (r12 ADVICE)
    val totalField =
      if (arms("routed")) {
        val t = out.getOrElse("gate_s", 0.0) + out.getOrElse("neardedup_s", 0.0) +
          out.getOrElse("decont_routed_s", 0.0) + out.getOrElse("pack_s", 0.0)
        f""","total_routed_s":$t%.1f"""
      } else ""
    println(f"""{"tool":"CurationStageProbe","sf_dir":"$sfDir","kept_docs":$nKept,"survivor_docs":$nSurv,"eval_docs":$nEval,$fields$totalField}""")
    spark.stop()
  }
}
