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
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.DecontScaleProbe [mod1,mod2,...]
  */
object DecontScaleProbe {
  def main(args: Array[String]): Unit = {
    val mods = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq else Seq(50, 500)
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

    println(f"corpus=$total%d docs  ($sfDir)")
    println(f"${"mod"}%6s ${"|eval|"}%8s ${"x9_sec"}%10s ${"x9b_sec"}%10s ${"flagged"}%8s")
    mods.foreach { m =>
      val evalN = docs.where(col("doc_id") % m === 0).count()
      val (sec, rows) = time(graft.operators.Decontaminate.overlapAgainst(
        corpus = docs.where(col("doc_id") % m =!= 0),
        evalSet = docs.where(col("doc_id") % m === 0),
        textCol = "text", idCol = "doc_id", shingleN = 2, threshold = 0.2))
      val (bsec, brows) = time(graft.operators.Decontaminate.overlapAgainstBloom(
        corpus = docs.where(col("doc_id") % m =!= 0),
        evalSet = docs.where(col("doc_id") % m === 0),
        textCol = "text", idCol = "doc_id", shingleN = 2, threshold = 0.2))
      require(rows == brows, s"bloom reduction lost rows at mod=$m: $rows vs $brows")
      println(f"$m%6d $evalN%8d $sec%10.3f $bsec%10.3f $rows%8d")
    }
    spark.stop()
  }
}
