package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the point-mass subcell guard: on a duplicate-blast corpus
  * (ScaleGen with SPARK_GRAFT_EMB_BLAST — the first k rows carry one
  * identical vector, a subcell no split plane can subdivide), A/Bs the
  * capped SemDeDup pair pass with the salt guard ON (default) vs OFF
  * (-Dgraft.semdedup.salt=off, flipped in-process between arms) and
  * reports:
  *  - max_subcell and the single-task candidate volume the unsalted
  *    plan concentrates there (max²/2 — the exposure the guard removes)
  *  - the salt count s and the per-task candidate volume after
  *    spreading ((2·max/s)² per group over s²/2 groups)
  *  - wall-clock and output pair count of both arms — counts must be
  *    EQUAL (the guard is a task-shape change, not a semantics change;
  *    asserted here at scale, as the spec asserts it at fixture size).
  *
  * Centroids: the fixed md5 table by default — Lloyd's deterministic
  * init seeds from the first nlist rows by id, which in a BLAST corpus
  * are all the same vector, so the trained quantizer would degenerate
  * (whole corpus in one cell) and measure the quantizer's failure, not
  * the guard. Pass `trained` for NATURAL corpora: there the md5 table
  * is the degenerate config — a random centroid is far from the cell's
  * actual population, the cell-CENTERED planes stop bisecting, and at
  * 2.4M vectors 93% of the corpus sat in >4·targetCell keys (measured
  * r16: max subcell 196,956 vs the 1,000 target; the salted arm's
  * s-fold triangle replication then wrote ~230 GB of shuffle and
  * filled the disk). The operator's scale contract is trained
  * centroids with nlist ∝ corpus; a natural-corpus probe must honor it.
  *
  * Usage: runMain graft.tools.PointMassProbe <sfDir> [threshold] [targetCell] [arms] [route] [centroids]
  * `arms` csv subset of salted,unsalted (default both); `route` is
  * capped (default), probed (probeSplitBits = 1 — flood detection and
  * exposure stats key on the PROBE side's per-skey population, the
  * Hamming-≤1 subcell neighborhood sum), or uncapped (drives the auto
  * entry with an unbounded budget, measuring the UNCAPPED branch's
  * flooded-cell salting, whose single-task exposure is the whole
  * cell's pair loop, not just the unsplittable residual's);
  * `centroids` is md5 (default — blast corpora) or trained (natural
  * corpora; IvfIndex.train nlist=64, 2 iters, untimed).
  */
object PointMassProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.99
    val target = if (args.length > 2) args(2).toInt else 1000
    val Known = Set("salted", "unsalted")
    val arms: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Known
    require(arms.nonEmpty && arms.subsetOf(Known),
      s"unknown arm(s) ${(arms -- Known).mkString(",")}; known: ${Known.mkString(",")}")
    val route = if (args.length > 4) args(4) else "capped"
    require(Set("capped", "probed", "uncapped")(route),
      s"route must be capped, probed or uncapped, got $route")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(1, cpus.toInt / 2))
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val centMode = if (args.length > 5) args(5) else "md5"
    require(Set("md5", "trained")(centMode),
      s"centroids must be md5 or trained, got $centMode")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val centroids =
      if (centMode == "trained")
        Similarity.IvfIndex.train(emb, "vec_id", "embedding", nlist = 64, iters = 2)
      else Similarity.md5Centroids(64, 64)

    // the route's key populations (operator's own derivation): the
    // capped route pairs under (centroid, subcell); the uncapped route
    // under the bare cell; the probed route's flood-relevant population
    // is the PROBE side's per-skey count — Σ of the Hamming-≤1 subcell
    // neighborhood — and its per-task candidates are probePop × exactPop
    // (maxKeyPop, worst single-task candidates, total candidates, and the
    // s the PLAN actually uses — 1 when nothing crosses the route's
    // flood threshold, so the JSON never claims a spread the timed arms
    // didn't run)
    val saltAbove = 4L * math.max(target, 1)
    // plan-true salt factors: the operator clamps per-key s to the flood
    // replication budget (Similarity.clampSaltCounts, water-filled), so
    // the probe must report the s values the plan ACTUALLY uses — an
    // unclamped saltCount here would claim a spread the timed arms never
    // ran (exactly the flood-majority regime this probe measures)
    val budgetMult = sys.props.get("graft.semdedup.flood.budget")
      .map(_.toDouble).getOrElse(3.0)
    def clampedS(flooded: Seq[(Seq[Any], Long)]): Map[Seq[Any], Int] =
      if (flooded.isEmpty) Map.empty
      else Similarity.clampSaltCounts(flooded, target,
        (budgetMult * n).toLong).toMap
    val (maxSub, unsaltedTaskCand, totalCand, s, worstSaltedOverride) = route match {
      case "probed" =>
        // probe-side population per key = Hamming-≤1 subcell
        // neighborhood sum; the flood rule mirrors the operator (shared
        // splitDepths/saltCount): probe pop > (1+k_cell)-scaled line OR
        // exact pop > the flat line. Cell sizes come from the subcell
        // table itself — no second assignment pass over the corpus.
        val sc = Similarity.cappedSubcellKeys(emb, "vec_id", "embedding",
            centroids, targetCell = target, maxExtraBits = 8)
          .groupBy("centroid", "subcell").agg(count(lit(1)).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cells = sc.groupBy("centroid").agg(sum("n").as("cn"))
          .collect().map(r => r.getInt(0) -> r.getLong(1))
        val depths = Similarity.splitDepths(cells, target, 8)
        val a = sc.select(col("centroid"), col("subcell").as("sa"), col("n").as("na"))
        val b = sc.select(col("centroid"), col("subcell").as("sb"), col("n").as("nb"))
        val perKey = a.join(b, Seq("centroid"))
          .where(expr("bit_count(sa ^ sb)") <= 1)
          .groupBy(col("centroid"), col("sb"), col("nb"))
          .agg(sum("na").as("probe_pop"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        sc.unpersist()
        def floods(cid: Int, nb: Long, pop: Long): Boolean =
          pop > saltAbove * (1 + depths(cid)) || nb > saltAbove
        val flooded = perKey.collect {
          case (cid, sb, nb, pop) if floods(cid, nb, pop) =>
            (Seq[Any](cid, sb), pop)
        }
        val sOf = clampedS(flooded.toSeq)
        val sVal = if (flooded.isEmpty) 1L
                   else sOf(flooded.maxBy(_._2)._1).toLong
        // honest per-key worst task: a flooded key spreads under ITS OWN
        // (clamped) s — a key the budget left at s=1 keeps its full
        // product; an unflooded key keeps its full pop×exact product
        val worstSalted = perKey.map { case (cid, sb, nb, pop) =>
          val sk = if (floods(cid, nb, pop))
            math.max(sOf(Seq[Any](cid, sb)), 1) else 1
          if (sk <= 1) pop * nb else (2 * pop / sk) * (2 * nb / sk)
        }.max
        (perKey.map(_._4).max,
          perKey.map { case (_, _, nb, pop) => pop * nb }.max,
          perKey.map { case (_, _, nb, pop) => pop * nb }.sum, sVal,
          Some(worstSalted))
      case _ =>
        val keyed =
          if (route == "capped")
            Similarity.cappedSubcellKeys(emb, "vec_id", "embedding",
                centroids, targetCell = target, maxExtraBits = 8)
              .groupBy("centroid", "subcell").agg(count(lit(1)).as("n"))
              .select(col("n"))
          else
            Similarity.IvfIndex.assign(emb, "embedding", centroids)
              .groupBy("centroid").agg(count(lit(1)).as("n"))
              .select(col("n"))
        val r = keyed
          .agg(max("n").cast("long"),
            (max(col("n") * (col("n") - 1)) / 2).cast("long"),
            sum(col("n") * (col("n") - 1) / 2).cast("long")).head()
        // plan-true s for the LARGEST key: collect the flooded key sizes
        // (driver-bounded, same class as the plan's own collect) and run
        // them through the identical clamp
        val floodedSizes = keyed.where(col("n") > saltAbove)
          .collect().zipWithIndex
          .map { case (row, i) => (Seq[Any](i), row.getLong(0)) }.toSeq
        val sVal = if (floodedSizes.isEmpty) 1L
                   else clampedS(floodedSizes)(floodedSizes.maxBy(_._2)._1).toLong
        (r.getLong(0), r.getLong(1), r.getLong(2), sVal, None)
    }
    val saltedTaskCand = worstSaltedOverride.getOrElse(
      if (s <= 1) unsaltedTaskCand else { val g = 2 * maxSub / s; g * g })

    def timed(name: String): (Double, Long) =
      if (!arms(name)) (-1.0, -1L)
      else {
        val t0 = System.nanoTime()
        val c = route match {
          case "capped" =>
            Similarity.semanticNearDupPairsCapped(emb, "vec_id",
              "embedding", centroids, threshold, target, maxExtraBits = 8).count()
          case "probed" =>
            Similarity.semanticNearDupPairsCapped(emb, "vec_id",
              "embedding", centroids, threshold, target, maxExtraBits = 8,
              probeSplitBits = 1).count()
          case _ =>
            Similarity.semanticNearDupPairsAuto(emb, "vec_id", "embedding",
              centroids, threshold, target, maxExtraBits = 8,
              cellPairBudget = Long.MaxValue).count()
        }
        ((System.nanoTime() - t0) / 1e9, c)
      }
    // the "salted" arm relies on the JVM default (guard ON); if the
    // probe were launched with -Dgraft.semdedup.salt=off already set,
    // both arms would silently run unsalted and the output-equality
    // require would pass vacuously — clear the property up front so the
    // A/B always measures what it claims
    sys.props -= "graft.semdedup.salt"
    val (tSalted, nSalted) = timed("salted")
    sys.props("graft.semdedup.salt") = "off"
    val (tUnsalted, nUnsalted) = try timed("unsalted")
    finally sys.props -= "graft.semdedup.salt"
    if (arms == Known) require(nSalted == nUnsalted,
      s"guard changed the output: salted=$nSalted unsalted=$nUnsalted")
    val armsJson = Seq("salted", "unsalted").filter(arms)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    println(f"""{"tool":"PointMassProbe","sf_dir":"$sfDir","route":"$route","arms":$armsJson,"centroids":"$centMode","n_vecs":$n,"threshold":$threshold,"target_cell":$target,"max_subcell":$maxSub,"salt_s":$s,"flood_budget_mult":$budgetMult,"unsalted_task_candidates":$unsaltedTaskCand,"salted_task_candidates":$saltedTaskCand,"total_candidates":$totalCand,"salted_s":$tSalted%.1f,"salted_pairs":$nSalted,"unsalted_s":$tUnsalted%.1f,"unsalted_pairs":$nUnsalted}""")
    spark.stop()
  }
}
