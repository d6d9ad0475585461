package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Scalar cleaning/extraction functions of the marketeye reference,
  * re-expressed as pure Catalyst column expressions (codegen'd, no UDFs).
  *
  * Reference semantics (file:line cited per function) from
  * SARA-MAGGAG/ETL-marketeye_airflow — see SURVEY.md §2.4. Every function
  * here is Catalyst-visible so predicate pushdown / constant folding /
  * whole-stage codegen apply; at 100 TB these run inside the parquet scan
  * stage with zero extra shuffles.
  */
object ScalarFunctions {

  /** Sentinel strings the reference treats as missing.
    * Ref: avito_extractor.py:94,151,241,246,286. */
  private val Sentinels = Seq("", "NULL", "NONE", "INCONNU", "UNKNOWN", "NAN")

  /** P5 — null out sentinel values: ''/'NULL'/'NONE'/'INCONNU'/'UNKNOWN'
    * (case-insensitive, trimmed). Ref: dag :106,141; avito_extractor.py:94. */
  def sentinelToNull(c: Column): Column =
    when(c.isNull || upper(trim(c)).isin(Sentinels: _*), lit(null)).otherwise(c)

  /** True when a string column is present and non-sentinel. */
  def isPresent(c: Column): Column = presentPer(c, Sentinels)

  /** The Avito-fixed BRAND field-stage sentinel list is shorter than the
    * shared one — ['', 'NULL', 'NONE', 'INCONNU'] only
    * (avito_extractor.py:94), so brand='NAN' is *present* there and
    * Title-Cases to 'Nan' instead of falling to the title scan. */
  private val BrandFieldSentinels = Seq("", "NULL", "NONE", "INCONNU")

  /** …and the MODEL field stage has its own list again —
    * ['', 'NULL', 'NONE', 'UNKNOWN'] (avito_extractor.py:150). */
  private val ModelFieldSentinels = Seq("", "NULL", "NONE", "UNKNOWN")

  private def presentPer(c: Column, sentinels: Seq[String]): Column =
    c.isNotNull && !upper(trim(c)).isin(sentinels: _*)

  /** F10 — safe_string: null→"", passthrough otherwise (numbers already cast
    * upstream). Ref: base_extractor.py:32-38. */
  def safeString(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** F1 — clean_price, naive path (bug-for-bug): strip all but [0-9,.],
    * turn ',' into '.', take the FIRST `\d+\.?\d*` match, cast to double,
    * else 0.0.  Preserves the reference bug where "13,875" (thousands
    * comma) parses as 13.875.  Ref: dag:61-71; base_extractor.py:89-101. */
  def cleanPrice(c: Column): Column = {
    val stripped = regexp_replace(c.cast("string"), "[^0-9,\\.]", "")
    val dotted   = regexp_replace(stripped, ",", ".")
    val first    = regexp_extract(dotted, "\\d+\\.?\\d*", 0)
    coalesce(nullif(first, lit("")).cast("double"), lit(0.0))
  }

  /** F2 — _extract_price_fixed (robust European formats): if both ',' and
    * '.' present → '.' is thousands sep (drop it) and ',' is decimal;
    * if only ',' present → ',' is thousands sep (drop it).
    * "4.500,00"→4500.0, "4,500"→4500.0, "250 DH"→250.0.
    * Ref: avito_extractor.py:197-231. */
  def extractPriceFixed(c: Column): Column = {
    val s = regexp_replace(c.cast("string"), "[^0-9,\\.]", "")
    val both    = s.contains(",") && s.contains(".")
    val commaOnly = s.contains(",") && !s.contains(".")
    val norm = when(both, regexp_replace(regexp_replace(s, "\\.", ""), ",", "."))
      .when(commaOnly, regexp_replace(s, ",", ""))
      .otherwise(s)
    val first = regexp_extract(norm, "\\d+\\.?\\d*", 0)
    coalesce(nullif(first, lit("")).cast("double"), lit(0.0))
  }

  /** Brand substring→canonical map, first hit wins in insertion order.
    * Ref: config/pipeline_config.py:22-34 + dag:73-96 (incl. typo keys). */
  val BrandMap: ListMap[String, String] = ListMap(
    "samsung" -> "Samsung", "samsng" -> "Samsung", "galaxy" -> "Samsung",
    "iphone" -> "Apple", "apple" -> "Apple",
    "xiaomi" -> "Xiaomi", "redmi" -> "Xiaomi", "poco" -> "Xiaomi",
    "huawei" -> "Huawei", "hauwei" -> "Huawei", "honor" -> "Honor",
    "oppo" -> "Oppo", "realme" -> "Realme", "vivo" -> "Vivo",
    "oneplus" -> "OnePlus", "one plus" -> "OnePlus",
    "pixel" -> "Google", "google" -> "Google",
    "nokia" -> "Nokia", "sony" -> "Sony", "lg" -> "LG",
    "tecno" -> "Tecno", "infinix" -> "Infinix", "itel" -> "Itel",
    "motorola" -> "Motorola", "lenovo" -> "Lenovo", "alcatel" -> "Alcatel"
  )

  /** Avito-fixed stage-1 field map (avito_extractor.py:97-115): the
    * reference's own ordered dict for the `brand` field — notably
    * HONOR→'Huawei' (the shared pipeline map has honor→Honor) plus
    * MOTO/SONY/LG/GOOGLE/PIXEL entries and no GALAXY key. */
  val AvitoFieldBrandMap: ListMap[String, String] = ListMap(
    "apple" -> "Apple", "iphone" -> "Apple",
    "samsung" -> "Samsung", "samsg" -> "Samsung",
    "xiaomi" -> "Xiaomi", "redmi" -> "Xiaomi", "poco" -> "Xiaomi",
    "huawei" -> "Huawei", "honor" -> "Huawei",
    "oppo" -> "Oppo", "realme" -> "Realme",
    "nokia" -> "Nokia", "tecno" -> "Tecno",
    "infinix" -> "Infinix", "vivo" -> "Vivo",
    "motorola" -> "Motorola", "moto" -> "Motorola",
    "oneplus" -> "OnePlus", "sony" -> "Sony",
    "lg" -> "LG", "google" -> "Google", "pixel" -> "Google")

  /** Avito-fixed stage-2/3 title/model list (avito_extractor.py:119-135):
    * same as the field map but with GALAXY→Samsung and no SAMSG typo key. */
  val AvitoTitleBrandMap: ListMap[String, String] = ListMap(
    "apple" -> "Apple", "iphone" -> "Apple",
    "samsung" -> "Samsung", "galaxy" -> "Samsung",
    "xiaomi" -> "Xiaomi", "redmi" -> "Xiaomi", "poco" -> "Xiaomi",
    "huawei" -> "Huawei", "honor" -> "Huawei",
    "oppo" -> "Oppo", "realme" -> "Realme",
    "nokia" -> "Nokia", "tecno" -> "Tecno",
    "infinix" -> "Infinix", "vivo" -> "Vivo",
    "motorola" -> "Motorola", "moto" -> "Motorola",
    "oneplus" -> "OnePlus", "sony" -> "Sony",
    "lg" -> "LG", "google" -> "Google", "pixel" -> "Google")

  /** F3 — normalize_brand: null/sentinel→"Unknown"; else first substring hit
    * in the ordered map (insertion order); else Title Case of the raw value.
    * The ordered scan is the native [[BrandMapLookup]] expression (one
    * codegen'd call instead of a 22-deep CASE — see its scaladoc).
    * Ref: dag:73-96; base_extractor.py:40-51. */
  def normalizeBrand(c: Column, map: ListMap[String, String] = BrandMap): Column =
    when(!isPresent(c), lit("Unknown"))
      .otherwise(BrandMapLookup.column(trim(c), map, titleCaseFallback = true))

  /** F3b — the BASE-path normalize_brand (base_extractor.py:40-51, used
    * by the Jumia and Electroplanet extractors): falsy-only missing check
    * — no sentinel list, so the literal string 'NULL' title-cases to
    * 'Null' (bug-for-bug); ordered map scan; Title Case fallback of the
    * untrimmed value. */
  def normalizeBrandBase(c: Column): Column = {
    val s = coalesce(c.cast("string"), lit(""))
    when(s === "", lit("Unknown"))
      .otherwise(BrandMapLookup.column(s, BrandMap, titleCaseFallback = true))
  }

  /** Scan a free-text title for a brand key; null when no key matches.
    * Stage 2/3 of F4. Ref: avito_extractor.py:107-139. */
  def brandFromTitle(title: Column, map: ListMap[String, String] = BrandMap): Column =
    BrandMapLookup.column(coalesce(title, lit("")), map, titleCaseFallback = false)

  /** F4 — 3-stage Avito brand: explicit field (Avito field map) → title
    * scan → model scan (Avito title map) → "Unknown". Bug-for-bug with
    * the reference's fixed path, including HONOR→'Huawei' and the
    * 4-entry field-stage sentinel list (brand='NAN'/'UNKNOWN' is present
    * there → Title-Case fallback 'Nan'/'Unknown', never the title scan).
    * Ref: avito_extractor.py:90-145. */
  def extractBrandFixed(brand: Column, title: Column, model: Column): Column =
    coalesce(
      when(presentPer(brand, BrandFieldSentinels),
        BrandMapLookup.column(trim(brand), AvitoFieldBrandMap, titleCaseFallback = true)),
      brandFromTitle(title, AvitoTitleBrandMap),
      brandFromTitle(model, AvitoTitleBrandMap),
      lit("Unknown"))

  /** F4 DAG-inline variant (dag:101-133, CompatMode.DagInline): stage-1
    * field map is the DAG's 17-key dict (HONOR→'Honor' here, unlike the
    * fixed path), sentinel check is 'NULL' only, the title fallback scans
    * a 7-brand list returning Title Case, and there is NO model stage. */
  val DagFieldBrandMap: ListMap[String, String] = ListMap(
    "apple" -> "Apple", "iphone" -> "Apple",
    "samsung" -> "Samsung",
    "huawei" -> "Huawei", "honor" -> "Honor",
    "xiaomi" -> "Xiaomi", "redmi" -> "Xiaomi", "poco" -> "Xiaomi",
    "oppo" -> "Oppo", "realme" -> "Realme",
    "nokia" -> "Nokia", "tecno" -> "Tecno",
    "infinix" -> "Infinix", "vivo" -> "Vivo",
    "motorola" -> "Motorola", "moto" -> "Motorola",
    "oneplus" -> "OnePlus")

  val DagTitleBrands: Seq[String] =
    Seq("Apple", "Samsung", "Huawei", "Xiaomi", "Oppo", "Realme", "Nokia")

  def extractBrandDagInline(brand: Column, title: Column): Column = {
    val fieldPresent = brand.isNotNull && brand =!= "" && upper(trim(brand)) =!= "NULL"
    val fromField =
      BrandMapLookup.column(trim(brand), DagFieldBrandMap, titleCaseFallback = true)
    val fromTitle = coalesce(
      BrandMapLookup.column(coalesce(title, lit("")),
        ListMap(DagTitleBrands.map(b => b.toLowerCase -> b): _*),
        titleCaseFallback = false),
      lit("Unknown"))
    when(fieldPresent, fromField).otherwise(fromTitle)
  }

  /** Marketing words stripped from models on the fixed path.
    * Ref: avito_extractor.py:171. */
  private val MarketingWords = "\\b(ULTRA|PRO|PLUS|MAX|MINI|LITE)\\b"

  /** F11 — clean_model_name: non-alnum→space, collapse, UPPER; only the
    * EMPTY result (or empty/null input) falls back to "Unknown" — the
    * reference has no sentinel list here, so 'NONE!' cleans to 'NONE'.
    * Ref: base_extractor.py:141-152. */
  def cleanModelName(c: Column): Column = {
    val cleaned = upper(trim(regexp_replace(
      regexp_replace(c, "[^A-Za-z0-9]+", " "), "\\s+", " ")))
    when(cleaned.isNull || cleaned === "", lit("Unknown")).otherwise(cleaned)
  }

  /** F5 — the Avito-FIXED model extraction: the `model` field when
    * present (cleaned), else the title via the fixed-path ordered regex
    * cascade (first match wins), uppercased with marketing words
    * stripped; else "Unknown". The BASE-class cascade used by
    * Jumia/Electroplanet is [[extractModelBase]] — a different algorithm.
    * Ref: avito_extractor.py:147-195. */
  def extractModel(model: Column, title: Column, brand: Column,
                   stripMarketing: Boolean = true): Column = {
    // field stage: 4-entry sentinel list (model='INCONNU'/'NAN' is
    // present → cleaned verbatim); cleaning keeps unicode letters like
    // the reference's \w class (avito_extractor.py:150-155)
    val fieldCleaned = upper(trim(regexp_replace(
      regexp_replace(model, "[^\\p{L}\\p{N}_\\s]+", " "), "\\s+", " ")))
    val fromField = when(presentPer(model, ModelFieldSentinels),
      when(fieldCleaned === "", lit("Unknown")).otherwise(fieldCleaned))
    // title stage (avito_extractor.py:157-183), exactly the reference's
    // shape — pinned by the real-record replay (GoldenReplaySpec), which
    // caught an earlier simplified cascade producing "X100 6G 128G"
    // where the reference's first pattern stops at "X100 6G":
    //  - the brand is removed with an EMPTY replacement (guarded for
    //    brand="Unknown", like the reference); raw punctuation stays —
    //    the patterns treat it as a boundary
    //  - FIVE ordered patterns with bounded tails; each match is
    //    marketing-stripped + collapsed, accepted only if LONGER THAN 1
    //    char, else the NEXT pattern is tried
    //  - fallback: the first ≤3 title words longer than 2 chars that are
    //    not pure digits
    val tU = upper(coalesce(title, lit("")))
    val t0 = when(coalesce(brand, lit("")) === "Unknown", tU)
      .otherwise(replace(tU, upper(coalesce(brand, lit(" "))), lit("")))
    val patterns = Seq(
      "[A-Z]+\\s*\\d+\\s*[A-Z]*\\s*\\d*\\s*[A-Z]*", // S24 ULTRA, 12T PRO
      "\\d+\\s*[A-Z]+\\s*\\d*",                     // 12 PRO, 14 PLUS
      "[A-Z]+\\s*\\d+",                             // GALAXY S21
      "\\d+\\s*[A-Z]{2,}",                          // 256GB, 512 GO
      "[A-Z]{2,}\\s*\\d+")                          // NOTE 10, TAB S9
    val cascade = patterns.map { p =>
      val m = trim(regexp_extract(t0, p, 0))
      val stripped = if (stripMarketing) regexp_replace(m, MarketingWords, " ") else m
      val cleaned = trim(regexp_replace(stripped, "\\s+", " "))
      when(length(cleaned) > 1, cleaned)
    }
    // fallback: ' '.join(w for w in title.split()[:3] if len(w)>2 and not
    // w.isdigit()) — native one-pass expression: the filter() HOF
    // formulation is CodegenFallback and dropped the model Project out of
    // whole-stage codegen (see ModelWordFallback scaladoc)
    val fromWords = ModelWordFallback(t0)
    coalesce((fromField +: cascade) ++ Seq(fromWords, lit("Unknown")): _*)
  }

  /** F5-DAG — the DAG-inline Avito model extraction (dag.py:137-164), a
    * genuinely different algorithm from the plugin's fixed path: 2-entry
    * field sentinel list ('NONE' passes through verbatim — bug
    * preserved), lowercase title with the brand removed UNCONDITIONALLY
    * (brand "Unknown" removes the literal substring "unknown" — bug
    * preserved), FOUR case-insensitive patterns with \w (unicode) tails,
    * first raw match uppercased — no marketing strip, no length gate, no
    * word fallback. */
  def extractModelDag(model: Column, title: Column, brand: Column): Column = {
    val fromField = when(model.isNotNull && model =!= "" &&
        !upper(trim(model)).isin("NULL", "UNKNOWN"),
      upper(trim(model)))
    val t0 = trim(replace(lower(coalesce(title, lit(""))),
      lower(coalesce(brand, lit(" "))), lit("")))
    val W = "[\\p{L}\\p{N}_]"
    val patterns = Seq(
      s"[a-z]+\\s*\\d+$W*\\s*\\d*$W*", // iPhone 12 Pro, A14 5G
      "\\d+\\s*[a-z]+\\s*\\d*",        // 12 Pro, 14 Plus
      "[a-z]+\\s*\\d+",                // Galaxy S21
      "\\d+\\s*go|\\d+\\s*gb")         // 128GB, 256 Go
    val cascade = patterns.map(p =>
      nullif(upper(trim(regexp_extract(t0, p, 0))), lit("")))
    coalesce(fromField +: cascade :+ lit("Unknown"): _*)
  }

  /** F5b — the BASE-path extract_model_from_title
    * (base_extractor.py:53-87, used by Jumia and Electroplanet): lowercase
    * title, remove the (lowercased, normalized) brand substring, then an
    * ordered regex cascade — Samsung brands first try the galaxy
    * patterns, everyone gets the generic go/gb + letters-digits patterns —
    * first group(1) match uppercased with collapsed whitespace, else
    * "Unknown". A different algorithm from the Avito-fixed cascade (F5). */
  def extractModelBase(title: Column, brand: Column): Column = {
    val titleStr = coalesce(title.cast("string"), lit(""))
    val brandLower = lower(coalesce(brand.cast("string"), lit("")))
    val tc = trim(replace(lower(titleStr), brandLower, lit("")))
    // [\p{L}\p{N}_] instead of \w: Python's \w is unicode ('téléphone'
    // extends a match through the accents — the committed artifacts pin
    // 'S10 TÉLÉPHONE') while Java's is ASCII and RE2 has no (?U); the
    // explicit class means the same thing in Java, RE2, and Python
    val W = "[\\p{L}\\p{N}_]"
    val samsungPatterns = Seq(
      s"galaxy\\s+([a-z]\\d+$W*\\s*\\d*$W*)",
      s"([a-z]\\d+$W*\\s*\\d*$W*)\\s+")
    val genericPatterns = Seq(
      "(\\d+\\s*go|\\d+\\s*gb)",
      "(\\d+\\s*go\\s+\\d+\\s*go\\s+ram)",
      s"([a-z]+\\s*\\d+$W*)")
    def firstMatch(pats: Seq[String]): Column =
      coalesce(pats.map(p => nullif(regexp_extract(tc, p, 1), lit(""))): _*)
    val raw = when(brandLower.contains("samsung"),
        firstMatch(samsungPatterns ++ genericPatterns))
      .otherwise(firstMatch(genericPatterns))
    val cleaned = nullif(trim(regexp_replace(upper(raw), "\\s+", " ")), lit(""))
    when(titleStr === "", lit("Unknown")).otherwise(coalesce(cleaned, lit("Unknown")))
  }

  /** Slug: lowercase, keep [a-z0-9] only. */
  def slug(c: Column): Column = regexp_replace(lower(coalesce(c, lit(""))), "[^a-z0-9]", "")

  /** F6 — create_product_id = "{slug(brand)}_{slug(model)}"; when the model
    * slug is empty/unknown, fall back to the first token-with-digits of the
    * title, then to "title_{md5(title)[:8]}".
    * Ref: base_extractor.py:103-114; avito_extractor.py:251-280. */
  def productId(brand: Column, model: Column, title: Column): Column = {
    val b = slug(brand)
    val m = slug(model)
    val titleToken = slug(regexp_extract(lower(coalesce(title, lit(""))), "\\b[a-z]+\\d+\\w*\\b", 0))
    val md5Fb = concat(lit("title_"), substring(md5(coalesce(title, lit(""))), 1, 8))
    val mFinal = when(m =!= "" && m =!= "unknown", m)
      .when(titleToken =!= "", titleToken)
      .otherwise(md5Fb)
    concat_ws("_", b, mFinal)
  }

  /** F6b — the BASE-path create_product_id (base_extractor.py:103-114,
    * used by Jumia and Electroplanet): "{slug(brand)}_{slug(model)}",
    * and when the model slug is exactly "unknown" the SECOND word of the
    * non-alnum-to-space title becomes the model — no digit requirement,
    * no md5 fallback; a one-word (or empty) title leaves "unknown". */
  def productIdBase(brand: Column, model: Column, title: Column): Column = {
    val b = slug(brand)
    val m = slug(model)
    val words = split(trim(regexp_replace(lower(coalesce(title.cast("string"), lit(""))),
      "[^a-z0-9]", " ")), "\\s+")
    val secondWord = when(size(words) > 1, element_at(words, 2)).otherwise(lit("unknown"))
    val mFinal = when(m === "unknown", secondWord).otherwise(m)
    concat(b, lit("_"), mFinal)
  }

  /** F7 — determine_condition: FR/EN substring map; sentinel→'used'.
    * Ref: avito_extractor.py:282-304; dag:196-219. */
  def determineCondition(c: Column): Column = {
    val lc = lower(trim(coalesce(c, lit(""))))
    when(!isPresent(c), lit("used"))
      .when(lc.contains("comme neuf") || lc.contains("like new"), lit("like new"))
      .when(lc.contains("reconditionn") || lc.contains("refurbished"), lit("refurbished"))
      .when(lc.contains("neuf") || lc.contains("new") || lc.contains("nouveau"), lit("new"))
      .when(lc.contains("bon") || lc.contains("good") || lc.contains("excellent"), lit("good"))
      .when(lc.contains("moyen") || lc.contains("fair") || lc.contains("acceptable"), lit("fair"))
      .when(lc.contains("mauvais") || lc.contains("poor") || lc.contains("endommag"), lit("poor"))
      .otherwise(lit("used"))
  }

  /** DAG-inline normalize_brand (dag:73-96): falsy-only missing check,
    * the DAG's 17-key map (HONOR→Honor), Title Case fallback. */
  def normalizeBrandDag(c: Column): Column = {
    val s = coalesce(c.cast("string"), lit(""))
    when(s === "", lit("Unknown"))
      .otherwise(BrandMapLookup.column(s, DagFieldBrandMap, titleCaseFallback = true))
  }

  /** DAG-inline Jumia model cascade (dag:415-433): lowercase title minus
    * the lowered normalized brand, three ordered patterns, first group
    * uppercased+trimmed, else "Unknown". */
  def extractModelJumiaDag(title: Column, brand: Column): Column = {
    val t = coalesce(title.cast("string"), lit(""))
    val tc = trim(replace(lower(t), lower(coalesce(brand.cast("string"), lit(""))), lit("")))
    // unicode word class, matching Python's \w (see extractModelBase)
    val W = "[\\p{L}\\p{N}_]"
    val pats = Seq(
      s"([a-z]+\\s*\\d+$W*\\s*\\d*$W*)",
      "(\\d+\\s*[a-z]+\\s*\\d*)",
      "([a-z]+\\s*\\d+)")
    val m = coalesce(pats.map(p => nullif(regexp_extract(tc, p, 1), lit(""))): _*)
    when(t === "", lit("Unknown"))
      .otherwise(coalesce(nullif(trim(upper(m)), lit("")), lit("Unknown")))
  }

  /** DAG-inline Jumia rating (dag:480-488): first decimal, else 0.0. */
  def extractRatingDag(c: Column): Column =
    coalesce(
      nullif(regexp_extract(c.cast("string"), "(\\d+\\.?\\d*)", 1), lit("")).cast("double"),
      lit(0.0))

  /** F7 DAG-inline variant (dag:196-219, CompatMode.DagInline): ordered
    * substring map neuf/new/bon/good/excellent/moyen/fair/mauvais/poor —
    * 'excellent' maps to 'excellent' (the plugin path folds it into
    * 'good'), there are no comme-neuf/reconditionné/endommagé keys, and
    * the sentinel check is falsy-or-'NULL' only. */
  def determineConditionDag(c: Column): Column = {
    val lc = lower(trim(coalesce(c, lit(""))))
    val present = c.isNotNull && upper(c) =!= "NULL" && c =!= ""
    when(!present, lit("used"))
      .when(lc.contains("neuf") || lc.contains("new"), lit("new"))
      .when(lc.contains("bon") || lc.contains("good"), lit("good"))
      .when(lc.contains("excellent"), lit("excellent"))
      .when(lc.contains("moyen") || lc.contains("fair"), lit("fair"))
      .when(lc.contains("mauvais") || lc.contains("poor"), lit("poor"))
      .otherwise(lit("used"))
  }

  /** F8 — extract_rating: "4.5 out of 5"→4.5; "4.5/5"→4.5; first decimal
    * in the string; else 0.0. The out-of and slash forms require a
    * trailing number, exactly as the reference's regexes do.
    * Ref: jumia_extractor.py:56-78. */
  def extractRating(c: Column): Column = {
    val s = c.cast("string")
    coalesce(
      nullif(regexp_extract(s, "(\\d+\\.?\\d*)\\s*out of\\s*\\d+", 1), lit("")).cast("double"),
      nullif(regexp_extract(s, "(\\d+\\.?\\d*)\\s*/\\s*\\d+", 1), lit("")).cast("double"),
      nullif(regexp_extract(s, "(\\d+\\.?\\d*)", 1), lit("")).cast("double"),
      lit(0.0))
  }

  /** F9 — Avito URL builder: keep if it already points at avito.ma, else
    * rebuild from the ad id, else homepage. Ref: avito_extractor.py:306-316. */
  def buildAvitoUrl(url: Column, adId: Column): Column =
    when(coalesce(url, lit("")).contains("avito.ma"), url)
      .when(isPresent(adId), concat(lit("https://www.avito.ma/vi/"), adId.cast("string"), lit(".htm")))
      .otherwise(lit("https://www.avito.ma"))

  /** F12 — bare-number storage/ram/screen regexes (the DAG-inline spec
    * extraction, dag:440-448). The plugin Jumia path formats values with
    * units and a screen_size key — that version lives inline in
    * Transforms.jumia (jumia_extractor.py:80-111). */
  def specStorage(text: Column): Column =
    nullif(regexp_extract(lower(text), "(\\d+)\\s*(go|gb)", 1), lit(""))
  def specRam(text: Column): Column =
    nullif(regexp_extract(lower(text), "(\\d+)\\s*go\\s*ram", 1), lit(""))
  def specScreen(text: Column): Column =
    nullif(regexp_extract(lower(text), "(\\d+[.,]?\\d*)\"", 1), lit(""))
}
