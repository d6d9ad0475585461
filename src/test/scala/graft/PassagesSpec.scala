package graft

import graft.operators.Passages
import org.apache.spark.sql.functions._

class PassagesSpec extends SparkSuite {
  import spark.implicits._

  private val boiler = "all rights reserved contact us for details"

  test("repeated passages: verbatim boilerplate found across differing docs") {
    val docs = Seq(
      (1L, s"first document body text here $boiler"),
      (2L, s"completely different second story $boiler trailing words"),
      (3L, s"$boiler and a third unrelated tail"),
      (4L, "nothing shared with the others at all whatsoever")).toDF("doc_id", "text")
    val hot = Passages.repeatedPassages(docs, "text", "doc_id", n = 4, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every 4-gram inside the boilerplate span is shared by docs 1,2,3
    val expected = boiler.split(" ").sliding(4).map(_.mkString(" ")).toSet
    assert(hot.map(_._1).toSet == expected)
    assert(hot.forall { case (_, n, first) => n == 3L && first == 1L })
    // document-level dedup would never fire here: no two texts are equal,
    // and full-doc jaccard at these lengths is far below near-dup range
  }

  test("repeated passages: within-document repeats count once") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "spam spam spam spam other tail words here"),
      (3L, "unrelated text entirely different from both")).toDF("doc_id", "text")
    val hot = Passages.repeatedPassages(docs, "text", "doc_id", n = 4, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "spam spam spam spam" appears many times inside docs 1 and 2 but
    // n_docs must be the DOCUMENT frequency: 2
    assert(hot.toMap.get("spam spam spam spam").contains(2L))
  }

  test("passage flags: per-doc triage counts and widest spread") {
    val docs = Seq(
      (1L, s"a b c d $boiler"),
      (2L, s"e f g h $boiler"),
      (3L, s"i j k l $boiler"),
      (4L, "m n o p q r s t")).toDF("doc_id", "text")
    val flags = Passages.flagPassageDocs(docs, "text", "doc_id", n = 4, minDocs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val nBoiler = boiler.split(" ").length - 3 // 4-grams fully inside the span
    assert(flags.map(_._1).toSeq == Seq(1L, 2L, 3L)) // doc 4 untouched
    assert(flags.forall { case (_, n, spread) => n == nBoiler.toLong && spread == 3L })
  }
}
