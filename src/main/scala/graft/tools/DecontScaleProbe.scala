package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-control probe for decontamination (bench tooling): the catalog's
  * x9/x9b define the eval set as `doc_id % 50 == 0` — 2% OF THE CORPUS —
  * so a 10× corpus also grows the eval side 10× and the inverted-index
  * join's work grows with the product (~100× pair-instance ceiling). That
  * is the benchmark's construction, not the operator's scaling: in
  * production the eval/benchmark set is FIXED while the corpus grows.
  *
  * This probe times overlapAgainst at a given sf with the eval modulo as
  * a parameter, so the fixed-eval-set scaling (modulo chosen to keep
  * |eval| constant across sf, e.g. %50 at sf0.1 vs %500 at sf1) can be
  * measured against the corpus-proportional catalog definition.
  *
  * Arms per mod, selectable with SPARK_GRAFT_PROBE_ARMS (default
  * "join,bloom,auto"): `join` = plain gram join (overlapAgainst), known
  * superlinear in |eval|·|corpus| — EXCLUDE it at big-eval params;
  * `bloom` = Bloom-reduced join (overlapAgainstBloom) — on THIS corpus's
  * flooded ~900-bigram vocabulary the filter prunes nothing and the arm
  * degenerates to the quadratic join (the r11 probe kill), so exclude it
  * here too and read its regime from the hit-rate line instead;
  * `chunked` = the chunked broadcast-index plan at the production 4M
  * budget; `auto` = the production `overlap` entry (hit-rate routed for
  * big evals). Equal-rows is asserted across every arm that ran; each
  * mod line also reports the measured corpus-sample Bloom hit rate the
  * router sees.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.DecontScaleProbe [mod1,mod2,...]
  */
object DecontScaleProbe {
  def main(args: Array[String]): Unit = {
    val mods = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq else Seq(50, 500)
    val arms = sys.env.getOrElse("SPARK_GRAFT_PROBE_ARMS", "join,bloom,auto")
      .split(",").map(_.trim).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(length(graft.functions.TextFunctions.normalizeText(col("text"))) > 0)
      .cache()
    val total = docs.count()

    // SPARK_GRAFT_PROBE_PASSES=1: single cold execution per arm (count
    // doubles as the timed run). The flooded big-eval arms rebuild a
    // multi-million-posting driver index per execution — warm+min-of-2
    // triples an already ~hour-scale measurement for a plan whose
    // interesting property is its ORDER of growth, not a ±10% floor.
    val singlePass = sys.env.get("SPARK_GRAFT_PROBE_PASSES").contains("1")
    def time(df: => DataFrame): (Double, Long) = {
      if (singlePass) {
        val t0 = System.nanoTime()
        val rows = df.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      } else {
        val rows = df.count() // warm (janino + shuffle files)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        (math.min(t1 - t0, t2 - t1) / 1e9, rows)
      }
    }

    println(f"corpus=$total%d docs  ($sfDir)  arms=${arms.mkString("+")}")
    mods.foreach { m =>
      val corpusM = docs.where(col("doc_id") % m =!= 0)
      val evalM = docs.where(col("doc_id") % m === 0)
      val evalN = evalM.count()
      val postings = {
        val r = evalM.select(sum(size(
          graft.operators.Dedup.gramHashSet(col("text"), 2)))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
      if (arms("join"))
        results("join") = time(graft.operators.Decontaminate.overlapAgainst(
          corpusM, evalM, "text", "doc_id", shingleN = 2, threshold = 0.2))
      if (arms("bloom"))
        results("bloom") = time(graft.operators.Decontaminate.overlapAgainstBloom(
          corpusM, evalM, "text", "doc_id", shingleN = 2, threshold = 0.2))
      if (arms("chunked"))
        results("chunked") = time(
          graft.operators.Decontaminate.overlapAgainstIndexChunked(
            corpusM, evalM, "text", "doc_id", shingleN = 2, threshold = 0.2))
      if (arms("auto"))
        results("auto") = time(graft.operators.Decontaminate.overlap(
          corpusM, evalM, "text", "doc_id", shingleN = 2, threshold = 0.2,
          numEvalPostings = Some(postings)))
      val counts = results.values.map(_._2).toSet
      require(counts.size <= 1,
        s"arms disagree at mod=$m: ${results.map { case (k, v) => s"$k=${v._2}" }.mkString(", ")}")
      // the router's own measurement, reported so the auto arm's plan
      // choice is readable from the log
      val hitRate = {
        val eg = evalM.select(explode(
          graft.operators.Dedup.gramHashSet(col("text"), 2)).as("gram"))
        val n = math.max(1000L,
          eg.agg(approx_count_distinct(col("gram"))).head().getLong(0))
        graft.operators.Decontaminate.corpusBloomHitRate(
          corpusM, "text", 2, eg.stat.bloomFilter("gram", n, 0.01))
      }
      val autoPlan =
        if (postings <= 4000000L) "index"
        else if (hitRate >= 0.5) "chunked" else "bloom"
      val armJson = results.map { case (k, (s, _)) => f""""${k}_s":$s%.3f""" }.mkString(",")
      println(f"""{"tool":"DecontScaleProbe","sf_dir":"$sfDir","mod":$m,"eval_docs":$evalN,"eval_postings":$postings,$armJson,"flagged":${counts.headOption.getOrElse(0L)},"hit_rate":$hitRate%.4f,"auto_plan":"$autoPlan"}""")
    }
    spark.stop()
  }
}
