package graft.transform

import graft.functions.ScalarFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1 — per-source record → unified-product projections.
  *
  * Each transform is a pure column projection (narrow, codegen'd, no
  * shuffle): a raw scraped record becomes one unified product document with
  * a single offer, ready for the merge fold. The reference's defensive
  * empty-product_id drop (try/except-append, dag:271-273) is provably a
  * no-op on these projections — productId always ends in a non-empty
  * md5-fallback segment — so no per-row filter is emitted here (a pushed-
  * down filter would re-inline the whole id tree into the scan predicate);
  * the REAL empty-id drop, where trim/normalization can legitimately
  * produce "", lives in ProductMerge.merge (P2/P3), which every pipeline
  * run applies downstream.
  *
  * Plugin-path ("fixed") semantics are primary per SURVEY.md: European
  * price formats, 3-stage brand extraction, md5 id fallback
  * (M/scripts/data_processors/{avito,jumia,electroplanet}_extractor.py).
  *
  * `runTs` is injected (not now()) so runs are reproducible and tasks
  * across a cluster agree on metadata timestamps.
  */
/** Which of the reference's two coexisting implementations to mirror:
  * the plugin/extractor path (primary — European price parsing, 3-stage
  * Avito brand with HONOR→Huawei, rich condition map) or the DAG-inline
  * path (naive clean_price, 17-key brand map with HONOR→Honor and a
  * 7-brand title list, condition map with a distinct 'excellent' value).
  * SURVEY §0: plugin semantics primary, DAG-inline behind this flag. */
sealed trait CompatMode
object CompatMode {
  case object Plugin extends CompatMode
  case object DagInline extends CompatMode
}

object Transforms {

  private def offer(
      source: String, price: Column, originalPrice: Column, condition: Column,
      sellerType: Column, city: Column, area: Column, rating: Column,
      reviews: Column, url: Column, sellerName: Column, scrapedAt: Column): Column =
    struct(
      lit(source).as("source"), price.as("price"),
      originalPrice.as("original_price"), lit("MAD").as("currency"),
      condition.as("condition"), sellerType.as("seller_type"),
      city.as("city"), area.as("area"), rating.cast("string").as("rating"),
      reviews.cast("string").as("reviews_count"), url.as("url"),
      sellerName.as("seller_name"), scrapedAt.as("scraped_at"))

  /** Null-safe map from (key, value) pairs, dropping null-valued entries —
    * the reference only copies specs that are present
    * (avito_extractor.py:233-249). Built as a map_concat chain of
    * conditional singleton maps (all codegen'd native expressions) rather
    * than map_from_entries over a filtered array — filter() is a
    * higher-order function and would run this interpreted on every row of
    * the scan stage. Keys are distinct literals, so concat cannot clash. */
  private def specsMap(pairs: (String, Column)*): Column =
    pairs.map { case (k, v) =>
      when(v.isNotNull, map(lit(k), v.cast("string")))
        .otherwise(map().cast("map<string,string>"))
    }.reduce(map_concat(_, _))

  private def unified(id: Column, brand: Column, model: Column, name: Column,
                      specs: Column, off: Column, source: String, runTs: String): Seq[Column] = Seq(
    id.as("product_id"),
    brand.as("brand"), model.as("model"),
    coalesce(name, lit("")).as("product_name"),
    lit("Smartphone").as("category"),
    specs.as("specifications"),
    array(off).as("offers"),
    array(lit(source)).as("sources"),
    lit(runTs).as("created_at"),
    lit(runTs).as("last_updated"))

  // Staging note (applies to all three transforms): the brand/model trees
  // are bound to named intermediate columns via withColumn instead of
  // passing the Column objects around. Column reuse duplicates the whole
  // WHEN-chain subtree into every consumer (model references brand twice,
  // product_id references both) — the resulting single Project exceeds
  // the codegen limits and the entire stage silently drops out of
  // whole-stage codegen into interpreted eval (~10× slower at the scan).
  // As separate projections CollapseProject keeps them split (non-cheap
  // expressions referenced more than once are not inlined), each Project
  // stays codegen-sized, and each tree is evaluated once per row.

  /** Avito: brand via 3-stage extraction (field → title → model), model via
    * regex cascade, robust European price, condition map, location struct,
    * URL rebuild (avito_extractor.py:19-84). */
  def avito(raw: DataFrame, runTs: String,
            mode: CompatMode = CompatMode.Plugin): DataFrame = {
    val brandExpr = mode match {
      case CompatMode.Plugin => extractBrandFixed(col("brand"), col("title"), col("model"))
      case CompatMode.DagInline => extractBrandDagInline(col("brand"), col("title"))
    }
    val modelExpr = mode match {
      case CompatMode.Plugin => extractModel(col("model"), col("title"), col("__graft_brand"))
      case CompatMode.DagInline => extractModelDag(col("model"), col("title"), col("__graft_brand"))
    }
    val stagedRaw = raw
      .withColumn("__graft_brand", brandExpr)
      .withColumn("__graft_model", modelExpr)
    val brand = col("__graft_brand")
    val model = col("__graft_model")
    val off = offer("Avito",
      price = mode match {
        case CompatMode.Plugin => extractPriceFixed(col("price"))
        case CompatMode.DagInline => cleanPrice(col("price"))
      },
      originalPrice = lit(null).cast("double"),
      condition = mode match {
        case CompatMode.Plugin => determineCondition(col("condition"))
        case CompatMode.DagInline => determineConditionDag(col("condition"))
      },
      sellerType = coalesce(col("seller_type"), lit("PRIVATE")),
      city = col("city"), area = col("area"),
      rating = lit(null).cast("string"), reviews = lit(null).cast("string"),
      url = buildAvitoUrl(col("url"), col("ad_id")),
      sellerName = col("seller_name"), scrapedAt = col("list_time"))
    val specs = specsMap(
      "storage" -> sentinelToNull(col("storage")),
      "ram" -> sentinelToNull(col("ram")),
      "battery_health" -> sentinelToNull(col("battery_health")),
      "color" -> sentinelToNull(col("color")),
      "condition" -> sentinelToNull(col("condition")))
    // product_name is the STRIPPED title (avito_extractor.py:68) — the id
    // hash and model extraction read the raw title, only the display name
    // strips (caught by the real-record replay: committed listings carry
    // trailing spaces the synthetic fixtures never had)
    stagedRaw.select(unified(productId(brand, model, col("title")), brand, model,
      trim(col("title")), specs, off, "Avito", runTs): _*)
  }

  /** Jumia — faithful to jumia_extractor.py:15-111: BASE-path brand
    * (falsy-only check), BASE model cascade, BASE product id (words[1]
    * fallback); storage/ram/screen_size regexes over title+description
    * with the reference's unit formatting ("512 GO", "12 Go", '6.5"');
    * specs-dict overrides with last-matching-entry-wins and the
    * reference's or/and precedence quirk (a 'stockage'/'écran' key
    * overrides even with an empty value, 'ram'/'storage'/'screen'
    * require one); naive price (preserves the "13,875" comma-decimal
    * quirk, committed golden jumia_transformed.json); condition "Neuf". */
  def jumia(raw: DataFrame, runTs: String,
            mode: CompatMode = CompatMode.Plugin): DataFrame = mode match {
    case CompatMode.Plugin => jumiaPlugin(raw, runTs)
    case CompatMode.DagInline => jumiaDag(raw, runTs)
  }

  private def jumiaPlugin(raw: DataFrame, runTs: String): DataFrame = {
    val stagedRaw = raw
      .withColumn("__graft_brand", normalizeBrandBase(col("brand")))
      .withColumn("__graft_model", extractModelBase(col("title"), col("__graft_brand")))
    val brand = col("__graft_brand")
    val model = col("__graft_model")
    // full_text = safe(title) + " " + safe(description), lowercased
    val ft = lower(concat(coalesce(col("title"), lit("")), lit(" "),
      coalesce(col("description"), lit(""))))
    val stG1 = regexp_extract(ft, "(\\d+)\\s*(go|gb|go ram)", 1)
    val stG2 = regexp_extract(ft, "(\\d+)\\s*(go|gb|go ram)", 2)
    val storageRegex = when(stG1 =!= "", concat(stG1, lit(" "), upper(stG2)))
    val ramG = regexp_extract(ft, "(\\d+)\\s*go\\s*ram", 1)
    val ramRegex = when(ramG =!= "", concat(ramG, lit(" Go")))
    val scrG = regexp_extract(ft, "(\\d+[.,]?\\d*)\"", 1)
    val screenRegex = when(scrG =!= "", concat(scrG, lit("\"")))
    // dict overrides: the reference iterates the dict with an if/elif
    // chain, so the LAST matching entry wins and each entry hits at most
    // one branch in chain order — one-pass native pick (JumiaSpecPick
    // scaladoc: the filter()+try_element_at HOF formulation is
    // CodegenFallback and dropped this whole Project out of codegen)
    val pick = graft.functions.JumiaSpecPick(col("specs"), dagMode = false)
    val specs = specsMap(
      "storage" -> when(pick.getField("sto_matched"),
        coalesce(pick.getField("sto_value"), lit(""))).otherwise(storageRegex),
      "ram" -> when(pick.getField("ram_matched"),
        coalesce(pick.getField("ram_value"), lit(""))).otherwise(ramRegex),
      "screen_size" -> when(pick.getField("scr_matched"),
        coalesce(pick.getField("scr_value"), lit(""))).otherwise(screenRegex))
    val off = offer("Jumia",
      price = cleanPrice(col("price")),
      originalPrice = cleanPrice(col("old_price")),
      condition = lit("Neuf"),
      sellerType = lit(null).cast("string"),
      city = lit(null).cast("string"), area = lit(null).cast("string"),
      rating = extractRating(col("rating")).cast("string"),
      reviews = col("reviews_count_text"),
      url = col("product_url"), sellerName = lit(null).cast("string"),
      scrapedAt = col("scraped_at"))
    stagedRaw.select(unified(productIdBase(brand, model, col("title")), brand, model,
      col("title"), specs, off, "Jumia", runTs): _*)
  }

  /** Jumia DAG-inline variant (transform_jumia_item, dag:410-477): the
    * DAG brand map (falsy-only, HONOR→Honor), the DAG's own 3-pattern
    * title cascade, "{slug(brand)}_{slug(model)}" with NO fallback,
    * dict-only ram/storage specs (same or/and precedence quirk; an
    * unguarded 'stockage' key copies str(value) — null renders 'None'),
    * condition 'new', first-decimal rating, no original_price field,
    * scraped_at defaulting to the run timestamp. */
  private def jumiaDag(raw: DataFrame, runTs: String): DataFrame = {
    val stagedRaw = raw
      .withColumn("__graft_brand", normalizeBrandDag(col("brand")))
      .withColumn("__graft_model", extractModelJumiaDag(col("title"), col("__graft_brand")))
    val brand = col("__graft_brand")
    val model = col("__graft_model")
    // same if/elif chain as the plugin path minus the screen slot — see
    // JumiaSpecPick scaladoc for why this is a native one-pass expression
    val pick = graft.functions.JumiaSpecPick(col("specs"), dagMode = true)
    val specs = specsMap(
      "ram" -> when(pick.getField("ram_matched"), pick.getField("ram_value")),
      "storage" -> when(pick.getField("sto_matched"),
        coalesce(pick.getField("sto_value"), lit("None"))))
    val off = offer("Jumia",
      price = cleanPrice(col("price")),
      originalPrice = lit(null).cast("double"),
      condition = lit("new"),
      sellerType = lit(null).cast("string"),
      city = lit(null).cast("string"), area = lit(null).cast("string"),
      rating = extractRatingDag(col("rating")).cast("string"),
      reviews = col("reviews_count_text"),
      url = col("product_url"), sellerName = lit(null).cast("string"),
      scrapedAt = coalesce(col("scraped_at"), lit(runTs)))
    stagedRaw.select(unified(
      concat(slug(brand), lit("_"), slug(model)), brand, model,
      trim(col("title")), specs, off, "Jumia", runTs): _*)
  }

  /** French spec keys mapped to the reference's canonical names
    * (electroplanet_extractor.py:62-72). */
  val ElectroSpecKeys: Seq[(String, String)] = Seq(
    "Capacité de stockage interne" -> "storage",
    "Capacité de la RAM" -> "ram",
    "Marque" -> "brand",
    "Modèle" -> "model",
    "Famille de processeur" -> "processor",
    "Résolution de la caméra arrière (numerique)" -> "camera",
    "Afficher le nom du marketing technologique" -> "screen_tech",
    "Écran Gorilla Glass" -> "gorilla_glass")

  /** Electroplanet — faithful to electroplanet_extractor.py:14-77:
    * BASE-path brand from the `brand` field only (no Marque/title
    * fallbacks); model is the `Modèle` spec VERBATIM when truthy AND not
    * the literal 'Unknown' (`specs.get('Modèle') or "Unknown"` followed
    * by `if model == "Unknown"` re-runs the title cascade on both an
    * absent spec and a spec that literally says 'Unknown'); BASE
    * product id; specs copied under the reference's canonical names when
    * truthy; price via the BASE clean_price (','→'.', so "13,875" parses
    * 13.875 — the extractor calls self.clean_price, not the fixed
    * variant); rating kept as the raw average_rating string ("20" —
    * deliberately unparsed); detailed_scraped_at preferred. */
  def electroplanet(raw: DataFrame, runTs: String,
                    mode: CompatMode = CompatMode.Plugin): DataFrame = mode match {
    case CompatMode.Plugin => electroplanetPlugin(raw, runTs)
    case CompatMode.DagInline => electroplanetDag(raw, runTs)
  }

  private def electroplanetPlugin(raw: DataFrame, runTs: String): DataFrame = {
    val specsIn = coalesce(col("specifications"), map())
    val modelField = try_element_at(specsIn, lit("Modèle"))
    val stagedRaw = raw
      .withColumn("__graft_brand", normalizeBrandBase(col("brand")))
      .withColumn("__graft_model",
        when(modelField.isNotNull && modelField =!= "" && modelField =!= "Unknown",
            modelField)
          .otherwise(extractModelBase(col("name"), col("__graft_brand"))))
    val brand = col("__graft_brand")
    val model = col("__graft_model")
    val specs = specsMap(ElectroSpecKeys.map { case (fr, canon) =>
      canon -> nullif(try_element_at(specsIn, lit(fr)), lit(""))
    }: _*)
    val off = offer("Electroplanet",
      price = cleanPrice(col("price")),
      originalPrice = cleanPrice(col("old_price")),
      condition = lit("Neuf"),
      sellerType = lit(null).cast("string"),
      city = lit(null).cast("string"), area = lit(null).cast("string"),
      rating = col("reviews_summary").getField("average_rating"),
      reviews = col("reviews_summary").getField("total_reviews").cast("string"),
      url = col("product_url"), sellerName = col("store"),
      scrapedAt = coalesce(col("detailed_scraped_at"), col("scraped_at")))
    stagedRaw.select(unified(productIdBase(brand, model, col("name")), brand, model,
      col("name"), specs, off, "Electroplanet", runTs): _*)
  }

  /** Electroplanet DAG-inline variant (transform_electroplanet_item,
    * dag:551-610) — the version that produced the repo's committed
    * electroplanet_transformed.json (GoldenReplaySpec replays it
    * byte-faithfully): DAG brand map, `Modèle` verbatim else ONE
    * letters-digits pattern over the brand-stripped name, slug-only id,
    * 3-key truthy spec mapping, condition 'new', raw average_rating,
    * detailed_scraped_at falsy-or else scraped_at. */
  private def electroplanetDag(raw: DataFrame, runTs: String): DataFrame = {
    val specsIn = coalesce(col("specifications"), map())
    val modelField = try_element_at(specsIn, lit("Modèle"))
    val nm = coalesce(col("name").cast("string"), lit(""))
    val stagedRaw = raw
      .withColumn("__graft_brand", normalizeBrandDag(col("brand")))
      .withColumn("__graft_model", {
        val nc = trim(replace(lower(nm), lower(col("__graft_brand")), lit("")))
        when(modelField.isNotNull && modelField =!= "", modelField)
          .otherwise(coalesce(
            nullif(upper(regexp_extract(nc, "([a-z]+\\s*\\d+[\\p{L}\\p{N}_]*)", 1)), lit("")),
            lit("Unknown")))
      })
    val brand = col("__graft_brand")
    val model = col("__graft_model")
    val specs = specsMap(Seq(
      "Capacité de stockage interne" -> "storage",
      "Capacité de la RAM" -> "ram",
      "Modèle" -> "model").map { case (fr, canon) =>
      canon -> nullif(try_element_at(specsIn, lit(fr)), lit(""))
    }: _*)
    val off = offer("Electroplanet",
      price = cleanPrice(col("price")),
      originalPrice = lit(null).cast("double"),
      condition = lit("new"),
      sellerType = lit(null).cast("string"),
      city = lit(null).cast("string"), area = lit(null).cast("string"),
      rating = col("reviews_summary").getField("average_rating"),
      reviews = col("reviews_summary").getField("total_reviews").cast("string"),
      url = col("product_url"), sellerName = lit(null).cast("string"),
      scrapedAt = coalesce(nullif(col("detailed_scraped_at"), lit("")),
        col("scraped_at"), lit(runTs)))
    stagedRaw.select(unified(
      concat(slug(brand), lit("_"), slug(model)), brand, model,
      trim(nm), specs, off, "Electroplanet", runTs): _*)
  }
}
