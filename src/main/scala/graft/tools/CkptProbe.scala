package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway probe: does a RELIABLE Dataset.checkpoint recompute the
  * lineage for the checkpoint write (i.e., evaluate each partition
  * twice) when the frame is not persisted? */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // unique per run (a fixed /tmp path would be shared by concurrent
    // probes and accumulate stale checkpoints), deleted before exit
    val ckptDir = java.nio.file.Files.createTempDirectory("ckpt_probe_")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val acc = spark.sparkContext.longAccumulator("evals")
    val ds = spark.range(0, 1000, 1, 4).map { x => acc.add(1); x }
    val cp = ds.checkpoint(false)
    cp.count()
    println(s"rows=1000 evals_lazy_reliable=${acc.value}")
    val acc2 = spark.sparkContext.longAccumulator("evals2")
    val ds2 = spark.range(0, 1000, 1, 4).map { x => acc2.add(1); x }
    val cp2 = ds2.checkpoint(true)
    cp2.count()
    println(s"rows=1000 evals_eager_reliable=${acc2.value}")
    val acc3 = spark.sparkContext.longAccumulator("evals3")
    val ds3 = spark.range(0, 1000, 1, 4).map { x => acc3.add(1); x }
    val cp3 = ds3.localCheckpoint(false)
    cp3.count()
    println(s"rows=1000 evals_lazy_local=${acc3.value}")
    spark.stop()
    // Files.walk must be closed (it holds open directory handles);
    // reverse order deletes children before parents
    val walk = java.nio.file.Files.walk(ckptDir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }
}
