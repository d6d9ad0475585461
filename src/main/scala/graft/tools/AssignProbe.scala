package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/Bs the quantizer-assignment plans over a real corpus:
  *  - literal: `least(struct(-cos, cid) …)` with the centroid table as
  *    nlist·dim plan literals (the catalog-nlist form)
  *  - expr: the [[graft.functions.NearestCentroid]] reference-object
  *    loop (table serialized into each stage's task binary)
  *  - bcast: the same kernel with the table behind a TorrentBroadcast
  *    ([[graft.functions.NearestCentroidBcast]] — the rung `auto` takes
  *    past [[graft.functions.CentroidRouting.bcastDoubles]])
  * At each nlist: asserts the assignments are IDENTICAL per row across
  * every arm that runs (count of disagreeing ids must be 0 — the spec's
  * bit-equality claim re-checked at corpus scale), then times one
  * counted pass of each. The literal arm is skipped (−1) above `litMax`
  * — the regime it exists to avoid. Also reports each carrier's
  * java-serialized expression size: the expr form's bytes grow with
  * nlist·dim (it IS the table), the bcast form's stay a fixed-size
  * handle — the task-binary claim, measured directly on the object that
  * rides it.
  *
  * Usage: runMain graft.tools.AssignProbe <sfDir> [nlists csv] [litMax]
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nlists = (if (args.length > 1) args(1) else "64,256,1024")
      .split(",").map(_.trim.toInt)
    val litMax = if (args.length > 2) args(2).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(1, cpus.toInt / 2))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = f
      ((System.nanoTime() - t0) / 1e9, c)
    }
    def withProp[T](k: String, v: String)(f: => T): T = {
      val prev = sys.props.get(k); sys.props(k) = v
      try f finally { prev match {
        case Some(p) => sys.props(k) = p; case None => sys.props -= k } }
    }
    def serSize(o: AnyRef): Int = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(o); oos.close(); bos.size()
    }

    val rows = nlists.map { nlist =>
      val cents = Similarity.md5Centroids(nlist, 64)
      val t = graft.functions.CentroidTable.sorted(cents)
      val child = org.apache.spark.sql.GraftBridge.expression(col("embedding"))
      val exprBytes = serSize(graft.functions.NearestCentroid(child, t.ids, t.vecs))
      val bc = spark.sparkContext.broadcast(t)
      val bcastBytes = serSize(graft.functions.NearestCentroidBcast(child, bc))
      val auto = if (graft.functions.CentroidRouting.useBroadcast(t.doubles))
        "broadcast" else "expr"
      def arm(carrier: String) = withProp("graft.ann.assign", carrier)(
        Similarity.IvfIndex.assign(emb, "embedding", cents))
      def disagree(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame): Long =
        a.select(col("vec_id"), col("centroid").as("ca"))
          .join(b.select(col("vec_id"), col("centroid").as("cb")), "vec_id")
          .where(col("ca") =!= col("cb")).count()
      val dBcast = disagree(arm("expr"), arm("broadcast"))
      require(dBcast == 0, s"nlist=$nlist: $dBcast rows disagree expr vs bcast")
      val litPart = if (nlist <= litMax) {
        val literal = Similarity.IvfIndex.assignLiteral(emb, "embedding", cents)
        val dLit = disagree(literal, arm("expr"))
        require(dLit == 0, s"nlist=$nlist: $dLit rows disagree literal vs expr")
        val (tl, _) = timed(literal.groupBy("centroid").count().count())
        f""""literal_s":$tl%.1f,"""
      } else """"literal_s":-1,"""
      val (te, _) = timed(arm("expr").groupBy("centroid").count().count())
      val (tb, _) = timed(arm("broadcast").groupBy("centroid").count().count())
      bc.destroy()
      f"""{"nlist":$nlist,$litPart"expr_s":$te%.1f,"bcast_s":$tb%.1f,""" +
        s""""expr_ser_bytes":$exprBytes,"bcast_ser_bytes":$bcastBytes,""" +
        s""""carrier_auto":"$auto","disagree":0}"""
    }
    println(s"""{"tool":"AssignProbe","sf_dir":"$sfDir","n_vecs":$n,"lit_max":$litMax,"rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
