package graft

import graft.functions.ScalarFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Table-driven unit tests for the scalar cleaning functions, pinning the
  * reference's exact behaviors including its documented quirks
  * (SURVEY.md §2.4, §5.2). */
class ScalarFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def eval1(in: String, f: Column => Column): Any =
    Seq(Option(in)).toDF("v").select(f(col("v"))).collect()(0).get(0)

  test("F1 clean_price: naive semantics incl. the 13,875 comma-decimal quirk") {
    val cases = Seq(
      "7800 DH" -> 7800.0,
      "13,875 MAD" -> 13.875, // golden quirk: thousands comma read as decimal
      "250" -> 250.0,
      "abc" -> 0.0,
      "NULL" -> 0.0,
      null.asInstanceOf[String] -> 0.0,
      "1 234,56" -> 1234.56)
    cases.foreach { case (in, want) =>
      assert(eval1(in, cleanPrice) == want, s"cleanPrice($in)")
    }
  }

  test("F2 extract_price_fixed: European formats") {
    val cases = Seq(
      "4.500,00" -> 4500.0,
      "4,500" -> 4500.0,
      "250 DH" -> 250.0,
      "45.99" -> 45.99,
      "" -> 0.0,
      // multi-dot with no comma is ambiguous; the reference's float() parse
      // fails and the first-match regex wins: 1.234
      "1.234.567" -> 1.234)
    cases.foreach { case (in, want) =>
      assert(eval1(in, extractPriceFixed) == want, s"extractPriceFixed($in)")
    }
  }

  test("F3 normalize_brand: map priority, typo keys, sentinel, title-case fallback") {
    val cases = Seq(
      "samsung galaxy" -> "Samsung",  // samsung hits before galaxy
      "GALAXY A14" -> "Samsung",
      "redmi note" -> "Xiaomi",
      "hauwei p30" -> "Huawei",       // typo key
      "iphone 13" -> "Apple",
      "INCONNU" -> "Unknown",
      "" -> "Unknown",
      null.asInstanceOf[String] -> "Unknown",
      "nothingphone" -> "Nothingphone") // fallback title-case
    cases.foreach { case (in, want) =>
      assert(eval1(in, normalizeBrand(_)) == want, s"normalizeBrand($in)")
    }
  }

  test("F4 3-stage brand: field, then title, then model, then Unknown") {
    val df = Seq(
      ("SAMSUNG", "whatever", "x", "Samsung"),
      ("NULL", "Galaxy S24 Ultra", "x", "Samsung"),
      (null, "telephone", "redmi note 12", "Xiaomi"),
      (null, "telephone", "telephone", "Unknown"),
      // the FIELD-stage sentinel list is only ['','NULL','NONE','INCONNU']
      // (avito_extractor.py:94): 'NAN'/'UNKNOWN' are present there and
      // Title-Case instead of falling through to the title scan
      ("NAN", "Sony Xperia", null, "Nan"),
      ("UNKNOWN", "Sony Xperia", null, "Unknown"),
      ("INCONNU", "Sony Xperia", null, "Sony")
    ).toDF("brand", "title", "model", "want")
    val got = df.select(extractBrandFixed(col("brand"), col("title"), col("model")), col("want"))
      .collect()
    got.foreach(r => assert(r.get(0) == r.get(1)))
  }

  test("F4 fixed path maps HONOR to Huawei at every stage (avito_extractor.py:102,125)") {
    val df = Seq(
      ("HONOR", "x", null, "Huawei"),              // field stage
      ("HONOR 90 Lite", "x", null, "Huawei"),
      (null, "Honor Magic 5 Pro", null, "Huawei"), // title stage
      ("NULL", "telephone", "honor x7", "Huawei"), // model stage
      ("MOTO G84", "x", null, "Motorola"),         // avito-only MOTO key
      ("SONY", "x", null, "Sony")
    ).toDF("brand", "title", "model", "want")
    df.select(extractBrandFixed(col("brand"), col("title"), col("model")), col("want"))
      .collect().foreach(r => assert(r.get(0) == r.get(1), r.toSeq.toString))
    // the shared pipeline map (F3) keeps Honor as its own brand
    assert(eval1("honor 90", normalizeBrand(_)) == "Honor")
  }

  test("F4/F7 DAG-inline variants (CompatMode.DagInline, dag:101-133,196-219)") {
    // brand field: HONOR stays Honor on the DAG path; 7-brand title list
    // has no HONOR/GALAXY keys and no model stage
    val df = Seq(
      ("HONOR 90", "x", "Honor"),
      (null, "Honor Magic 5", "Unknown"),       // honor not in the 7-brand list
      (null, "Galaxy S24", "Unknown"),          // galaxy not in the list either
      (null, "HUAWEI P30", "Huawei"),
      ("NULL", "xiaomi redmi", "Xiaomi"),
      ("weird", "x", "Weird")                   // title-case fallback
    ).toDF("brand", "title", "want")
    df.select(extractBrandDagInline(col("brand"), col("title")), col("want"))
      .collect().foreach(r => assert(r.get(0) == r.get(1), r.toSeq.toString))
    // condition: 'excellent' survives; comme neuf folds into new;
    // Reconditionné is unmapped
    val cases = Seq(
      "excellent état" -> "excellent", "Comme neuf" -> "new",
      "Reconditionné" -> "used", "bon" -> "good",
      "" -> "used", null.asInstanceOf[String] -> "used")
    cases.foreach { case (in, want) =>
      assert(eval1(in, determineConditionDag) == want, s"conditionDag($in)")
    }
  }

  test("F5 model extraction: reference golden record (test_avito_structure.py)") {
    // brand=SAMSUNG model='S24 ULTRA' price='7800 DH' condition='NEUF'
    val df = Seq(("Samsung S24 ULTRA - 512 GB", "SAMSUNG", "S24 ULTRA", "7800 DH", "NEUF"))
      .toDF("title", "brand", "model", "price", "condition")
    val r = df.select(
      extractBrandFixed(col("brand"), col("title"), col("model")).as("b"),
      extractModel(col("model"), col("title"), col("brand")).as("m"),
      extractPriceFixed(col("price")).as("p"),
      determineCondition(col("condition")).as("c")).collect()(0)
    assert(r.getString(0) == "Samsung")
    assert(r.getString(1) == "S24 ULTRA")
    assert(r.getDouble(2) == 7800.0)
    assert(r.getString(3) == "new")
  }

  test("F5 model extraction: title cascade strips marketing words") {
    val df = Seq((null: String, "Samsung Galaxy S24 Ultra 512GB", "Samsung"))
      .toDF("model", "title", "brand")
    val got = df.select(extractModel(col("model"), col("title"), col("brand"))).collect()(0).getString(0)
    assert(got == "S24 512GB")
  }

  test("F5 field stage: 4-entry sentinel list and unicode-aware cleaning") {
    val cases = Seq(
      // 'INCONNU' is NOT a model-field sentinel (avito_extractor.py:150):
      // it passes through the cleaning stage verbatim
      ("INCONNU", "Samsung Galaxy S24", "Samsung", "INCONNU"),
      // 'UNKNOWN' IS one → title cascade runs
      ("UNKNOWN", "Samsung Galaxy S24", "Samsung", "S24"),
      // unicode \w parity: accents survive the [^\w\s] cleaning
      ("Téléphone X1", "t", "b", "TÉLÉPHONE X1"),
      // cleaning can null out a present field only via emptiness
      ("!!!", "Samsung Galaxy S24", "Samsung", "Unknown"))
    cases.foreach { case (m, t, b, want) =>
      val got = Seq((m, t, b)).toDF("model", "title", "brand")
        .select(extractModel(col("model"), col("title"), col("brand")))
        .collect()(0).getString(0)
      assert(got == want, s"extractModel(model=$m)")
    }
  }

  test("F11 clean_model_name: empty-only fallback, no sentinel list (base_extractor.py:141-152)") {
    assert(eval1("none!", cleanModelName) == "NONE")
    assert(eval1("Galaxy-S24", cleanModelName) == "GALAXY S24")
    assert(eval1("  ", cleanModelName) == "Unknown")
    assert(eval1(null.asInstanceOf[String], cleanModelName) == "Unknown")
  }

  test("F6 product_id: slug, token fallback, md5 fallback; always [a-z0-9_]*") {
    val df = Seq(
      ("Samsung", "S24 Ultra", "t", "samsung_s24ultra"),
      ("Apple", "Unknown", "galaxy s24", "apple_s24"),
      ("Apple", null, "Telephone pas cher",
        "apple_title_" + java.security.MessageDigest.getInstance("MD5")
          .digest("Telephone pas cher".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8))
    ).toDF("brand", "model", "title", "want")
    df.select(productId(col("brand"), col("model"), col("title")).as("got"), col("want"))
      .collect().foreach { r =>
        assert(r.get(0) == r.get(1))
        assert(r.getString(0).matches("[a-z0-9_]*"))
      }
  }

  test("F7 condition: FR/EN substring map with priority") {
    val cases = Seq(
      "Comme neuf" -> "like new", "neuf" -> "new", "Nouveau scellé" -> "new",
      "excellent" -> "good", "bon état" -> "good", "moyen" -> "fair",
      "endommagé" -> "poor", "Reconditionné" -> "refurbished",
      "" -> "used", null.asInstanceOf[String] -> "used", "whatever" -> "used")
    cases.foreach { case (in, want) =>
      assert(eval1(in, determineCondition) == want, s"condition($in)")
    }
  }

  test("F8 rating: three formats + first-decimal fallback") {
    val cases = Seq("4.5 out of 5" -> 4.5, "3/5" -> 3.0, "note 4.2 moyenne" -> 4.2,
      "no" -> 0.0, null.asInstanceOf[String] -> 0.0)
    cases.foreach { case (in, want) =>
      assert(eval1(in, extractRating) == want, s"rating($in)")
    }
  }

  test("F9 avito url: keep, rebuild, homepage") {
    val df = Seq(
      ("https://www.avito.ma/vi/1.htm", "9", "https://www.avito.ma/vi/1.htm"),
      ("https://other.com/x", "76741338", "https://www.avito.ma/vi/76741338.htm"),
      (null, null, "https://www.avito.ma")
    ).toDF("url", "ad_id", "want")
    df.select(buildAvitoUrl(col("url"), col("ad_id")), col("want")).collect()
      .foreach(r => assert(r.get(0) == r.get(1)))
  }

  test("F12 specs regexes") {
    assert(eval1("iPhone 256 Go - 8 Go RAM", specStorage) == "256")
    assert(eval1("8 go ram", specRam) == "8")
    assert(eval1("écran 6,9\"", specScreen) == "6,9")
    assert(eval1("no specs here", specStorage) == null)
  }

  test("property: cleanPrice is total and non-negative on arbitrary strings") {
    val gen = new scala.util.Random(7)
    val inputs = (1 to 200).map(_ => gen.nextString(gen.nextInt(24)))
      .map(Option(_))
    val out = inputs.toDF("v").select(cleanPrice(col("v")).as("p")).collect()
    out.foreach(r => assert(!r.isNullAt(0) && r.getDouble(0) >= 0.0))
  }
}
