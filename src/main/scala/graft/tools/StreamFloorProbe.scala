package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attributes the per-invocation cost of a catalog streaming query (the
  * "restart floor" the per-query bench numbers carry) to its phases:
  * session clone + source construction, query start→first-batch commit,
  * processAllAvailable drain, stop, and the post-hoc batch aggregate over
  * the sink. Mirrors st2's exact shape (complete-mode hourly aggregate,
  * memory sink, 4 state partitions). Run twice; the second invocation is
  * the warmed number the bench's min-of-2 reports.
  *
  * Usage: runMain graft.tools.StreamFloorProbe <sfDir> [reps]
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    System.setProperty("graft.cacheTables", "true")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(1, cpus.toInt / 2))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpointLocation",
        (if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
         else System.getProperty("java.io.tmpdir")) +
          s"/graft-floor-ckpt-${java.util.UUID.randomUUID()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Queries.prewarmTables(spark, sfDir)

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", 4)
      val stream = ss.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      val sec = graft.Queries.tsEpochSec(schema)
      val agg = stream
        .groupBy((sec - sec % 3600).cast("long").as("hour_epoch"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100)).cast("long").as("cents"))
      val tBuild = ms(t0)

      val t1 = System.nanoTime()
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(s"floor_$i").start()
      val tStart = ms(t1)

      val t2 = System.nanoTime()
      q.processAllAvailable()
      val tDrain = ms(t2)

      val t3 = System.nanoTime()
      q.stop()
      val tStop = ms(t3)

      val t4 = System.nanoTime()
      ss.table(s"floor_$i").orderBy("hour_epoch", "event_type")
        .write.format("noop").mode("overwrite").save()
      val tRead = ms(t4)

      val prog = q.recentProgress.toSeq
      val batchMs = prog.map(p => p.batchId -> p.durationMs).mkString("; ")
      println(f"[floor] rep$i build=$tBuild%.0f start=$tStart%.0f drain=$tDrain%.0f stop=$tStop%.0f readback=$tRead%.0f ms  batches=${prog.size} [$batchMs]")
    }
    spark.stop()
  }
}
