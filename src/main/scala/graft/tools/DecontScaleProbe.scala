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
  * `bloom` = Bloom-reduced join (overlapAgainstBloom), the big-eval
  * plan; `auto` = the production `overlap` entry, reporting which plan
  * the postings budget selected. Equal-rows is asserted across every
  * arm that ran.
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

    def time(df: => DataFrame): (Double, Long) = {
      val rows = df.count() // warm (janino + shuffle files)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      (math.min(t1 - t0, t2 - t1) / 1e9, rows)
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
      if (arms("auto"))
        results("auto") = time(graft.operators.Decontaminate.overlap(
          corpusM, evalM, "text", "doc_id", shingleN = 2, threshold = 0.2,
          numEvalPostings = Some(postings)))
      val counts = results.values.map(_._2).toSet
      require(counts.size <= 1,
        s"arms disagree at mod=$m: ${results.map { case (k, v) => s"$k=${v._2}" }.mkString(", ")}")
      val autoPlan = if (postings <= 4000000L) "index" else "bloom"
      val armJson = results.map { case (k, (s, _)) => f""""${k}_s":$s%.3f""" }.mkString(",")
      println(f"""{"tool":"DecontScaleProbe","sf_dir":"$sfDir","mod":$m,"eval_docs":$evalN,"eval_postings":$postings,$armJson,"flagged":${counts.headOption.getOrElse(0L)},"auto_plan":"$autoPlan"}""")
    }
    spark.stop()
  }
}
