package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("salted aggregate equals plain aggregate") {
    val df = ((1 to 1000).map(i => ("hot", i.toDouble)) ++
      (1 to 10).map(i => ("cold", i.toDouble))).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).cast("double").as("s"),
        min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    val salted = Skew.saltedAggregate(df, Seq("k"), Seq("v"), buckets = 8,
      partial = Seq(count(lit(1)).as("pn"), sum(col("v").cast("decimal(18,2)")).as("ps"),
        min("v").as("pmn"), max("v").as("pmx")),
      merge = Seq(sum("pn").cast("long").as("n"), sum("ps").cast("double").as("s"),
        min("pmn").as("mn"), max("pmx").as("mx")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join and spreads the hot key") {
    val fact = ((1 to 500).map(_ => ("hot", 1)) ++ Seq(("cold", 2))).toDF("k", "v")
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), buckets = 4, saltSource = Seq("v"))
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
    // the salt actually spreads: hot key lands in >1 bucket
    val buckets = fact.where(col("k") === "hot")
      .select(Skew.saltFrom(4, col("v") + monotonically_increasing_id()).as("s"))
      .distinct().count()
    assert(buckets > 1)
  }

  // ---- skew stress: the guards under a deliberately hostile corpus ----
  // One LSH bucket AT the cap, one OVER it, one stop-gram over the df cap,
  // one brand key at ~10x everything else (~10x the sf0.01 documents
  // volume overall). The properties asserted are the per-reducer input
  // bounds that keep a 100 TB run alive: capped buckets generate all their
  // pairs, over-cap buckets generate none, stop-grams generate none, and
  // the salted aggregation splits the hot key so no single reduction group
  // exceeds a constant factor of the fair share.

  test("skew stress: at-cap LSH bucket keeps all pairs, over-cap bucket drops") {
    import graft.operators.Dedup
    val maxBucket = 60
    val atCap = (1 to maxBucket).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta"))
    val overCap = (1 to maxBucket + 1).map(i =>
      (1000L + i, "eta theta iota kappa lambda mu"))
    val filler = (1 to 500).map(i =>
      (10000L + i, s"unique$i token$i payload$i distinct$i"))
    val docs = (atCap ++ overCap ++ filler).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id",
      bands = 4, rowsPerBand = 2, maxBucket = maxBucket)
    val byRange = cands.withColumn("grp",
      when(col("id_a") <= maxBucket && col("id_b") <= maxBucket, "atcap")
        .when(col("id_a") >= 1000L && col("id_a") < 10000L &&
          col("id_b") >= 1000L && col("id_b") < 10000L, "overcap")
        .otherwise("other"))
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // identical docs share every band bucket: the at-cap bucket is kept
    // whole and yields exactly C(n,2) distinct pairs
    assert(byRange.get("atcap").contains(maxBucket.toLong * (maxBucket - 1) / 2))
    // one doc over the cap: the whole degenerate bucket is dropped — the
    // C(n,2) explosion never materializes in any task
    assert(!byRange.contains("overcap"))
  }

  test("skew stress: over-df stop-gram contributes no pairs, rare grams still match") {
    import graft.operators.Dedup
    val maxDf = 500
    // 1000 docs share ONLY the stop-gram; two docs share a rare gram
    val stop = (1 to 1000).map(i => (i.toLong, s"the only$i"))
    val rare = Seq((5001L, "the rareshared xx"), (5002L, "the rareshared yy"))
    val docs = (stop ++ rare).toDF("doc_id", "text")
      .withColumn("blk", lit(0))
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", "blk",
      n = 1, threshold = 0.01, maxDf = maxDf).collect()
    // every surviving pair owes its candidacy to a sub-cap gram: the only
    // pair is the rare-gram one (stop-gram posting list of 1002 dropped)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5001L, 5002L)))
  }

  test("skew stress: salted aggregation bounds every reduction group at ~10x hot key") {
    val buckets = 32
    val hotRows = 20000
    val hot = (1 to hotRows).map(i => ("hotbrand", i.toDouble))
    val cold = (1 to 15).flatMap(b => (1 to 200).map(i => (s"brand$b", i.toDouble)))
    val offers = (hot ++ cold).toDF("brand", "price")
    // combine-resistant payload (collect_list): map-side combine cannot
    // shrink it, so phase-1 reduction-group size IS the reducer input for
    // that key — exactly what the salt must bound
    val salted = Skew.saltedAggregate(offers, Seq("brand"), Seq("price"), buckets,
      partial = Seq(count(lit(1)).as("pn"), collect_list(col("price")).as("pv")),
      merge = Seq(sum("pn").cast("long").as("n"),
        aggregate(flatten(collect_list(col("pv"))), lit(0.0), _ + _).as("s")))
    // correctness unchanged by the salt
    val got = salted.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), math.round(r.getDouble(2))))).toMap
    assert(got("hotbrand") == ((hotRows.toLong, (1 to hotRows).map(_.toLong).sum)))
    assert(got("brand7") == ((200L, (1 to 200).sum.toLong)))
    // the bound: no (key, salt) reduction group exceeds 4x the hot key's
    // fair share, and the hot key actually occupies most salt buckets
    val groups = offers.withColumn("__salt",
        Skew.saltFrom(buckets, col("price")))
      .groupBy("brand", "__salt").count()
    val hotGroups = groups.where(col("brand") === "hotbrand")
    val fairShare = hotRows.toDouble / buckets
    val maxGroup = groups.agg(max("count")).head().getLong(0)
    assert(maxGroup <= 4 * fairShare,
      s"a reduction group of $maxGroup rows exceeds 4x the fair share $fairShare")
    assert(hotGroups.count() >= buckets / 2, "hot key did not spread across salts")
  }
}
