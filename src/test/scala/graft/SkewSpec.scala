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
}
