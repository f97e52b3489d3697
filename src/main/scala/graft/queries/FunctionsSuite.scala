package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.{GraftQuery, QuerySuite, Tables}

/** Scalar-function inventory — SURVEY.md §2.9 (F1-F24) re-expressed over
  * the driver test tables. Every query is a pure, codegen-friendly
  * expression tree (no UDFs), so filters/projections push into the scan
  * and the whole stage fuses under WholeStageCodegen.
  *
  * Cross-engine notes (Spark vs DuckDB oracle):
  *  - `split` == `string_split` for single-space ASCII text;
  *  - `md5` hex strings match bit-for-bit (lowercase hex both sides);
  *  - array lambdas: `transform/filter/aggregate` == `list_transform/
  *    list_filter/list_reduce`;
  *  - Spark `sequence(a,b)` is inclusive, DuckDB `range(a,b)` exclusive;
  *  - `dayofweek` differs (Spark 1=Sun vs DuckDB 0=Sun) → aligned
  *    explicitly in f07.
  */
object FunctionsSuite extends QuerySuite {

  /** f01 — string cleanup chain (F1-F4; ref `standardize_categories.py:
    * 39-40`, `generate_mock_data.py:11-16`): lower/trim/upper/substring/
    * lpad/concat_ws build a deterministic product code from part rows. */
  private val f01 = GraftQuery(
    "f01_string_chain",
    (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          lower(trim(col("p_name"))).as("name_norm"),
          concat_ws("-",
            upper(substring(col("p_brand"), 1, 2)),
            upper(substring(col("p_type"), 1, 2)),
            lpad(col("p_size").cast("string"), 3, "0")).as("code")),
    Some("""SELECT p_partkey, lower(trim(p_name)) AS name_norm,
      concat_ws('-', upper(substring(p_brand,1,2)),
        upper(substring(p_type,1,2)),
        lpad(CAST(p_size AS VARCHAR),3,'0')) AS code
    FROM part"""))

  /** f02 — split / array ops / rejoin (F4-F5; ref `seperate_tables.py:
    * 82-83` pipe-split, `'|'.join`): tokenize document text, count and
    * re-join the first 5 tokens. */
  private val f02 = GraftQuery(
    "f02_split_array",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          array_join(slice(split(col("text"), " "), 1, 5), "|").as("head5")),
    Some("""SELECT doc_id,
      len(string_split(text,' ')) AS n_tokens,
      array_to_string(list_slice(string_split(text,' '),1,5),'|') AS head5
    FROM documents"""))

  /** f03 — explode list to rows (F6-F7; ref `seperate_tables.py:81-106`
    * image explode): one row per token with its position, for the first
    * 3 tokens of each doc. posexplode == unnest WITH ORDINALITY. */
  private val f03 = GraftQuery(
    "f03_explode",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 3))
            .as(Seq("pos", "token")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          col("token")),
    Some("""SELECT doc_id, CAST(pos AS BIGINT) AS pos, token
    FROM (SELECT doc_id, unnest(list_slice(string_split(text,' '),1,3)) AS token,
            unnest(range(1, 1+len(list_slice(string_split(text,' '),1,3)))) AS pos
          FROM documents)"""))

  /** f04 — regex strip / extract / match (F8-F10; ref `products_scraping
    * .py:443,506`): digits-only normalization and capture over p_name,
    * rlike alternation over p_type. */
  private val f04 = GraftQuery(
    "f04_regex",
    (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_replace(col("p_name"), "[^0-9]", "").as("digits_only"),
          regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("first_word"),
          col("p_type").rlike("(?i)(brass|steel)").as("is_metal")),
    Some("""SELECT p_partkey,
      regexp_replace(p_name, '[^0-9]', '', 'g') AS digits_only,
      regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
      regexp_matches(p_type, '(?i)(brass|steel)') AS is_metal
    FROM part"""))

  /** f05 — containment predicates (F11-F12; ref `standardize_categories
    * .py:51`, `products_scraping.py:345`). */
  private val f05 = GraftQuery(
    "f05_contains",
    (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          col("p_type").contains("BRUSHED").as("has_brushed"),
          col("p_type").startsWith("ECONOMY").as("is_economy"),
          col("p_type").endsWith("TIN").as("ends_tin"),
          (instr(col("p_name"), "red") > 0).as("has_red")),
    Some("""SELECT p_partkey,
      contains(p_type,'BRUSHED') AS has_brushed,
      starts_with(p_type,'ECONOMY') AS is_economy,
      suffix(p_type,'TIN') AS ends_tin,
      strpos(p_name,'red') > 0 AS has_red
    FROM part"""))

  /** f06 — JSON parse + serialize (F15-F16; ref `seperate_tables.py:
    * 35-44`, `generate_mock_data.py:59-62`): extract typed field from the
    * props JSON column, rebuild a JSON string. */
  private val f06 = GraftQuery(
    "f06_json",
    (s, dir) =>
      Tables(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          concat(lit("""{"type":""""), col("event_type"),
            lit("""","k":"""), get_json_object(col("props"), "$.k"),
            lit("}")).as("rebuilt")),
    Some("""SELECT event_id,
      CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
      concat('{"type":"', event_type, '","k":',
             json_extract_string(props,'$.k'), '}') AS rebuilt
    FROM events"""))

  /** f07 — timestamp functions (F19; ref `seperate_tables.py:31-32`
    * strftime): truncation, formatting, calendar parts. Session TZ is
    * UTC in both engines; dayofweek aligned to ISO (1=Mon..7=Sun). */
  private val f07 = GraftQuery(
    "f07_datetime",
    (s, dir) =>
      Tables(s, dir, "events")
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          date_trunc("hour", col("ts")).as("ts_hour"),
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("m"),
          dayofmonth(col("ts")).cast("long").as("d"),
          hour(col("ts")).cast("long").as("h"),
          dayofweek(col("ts")).cast("long").as("dow_sun1")),
    Some("""SELECT event_id,
      strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
      date_trunc('hour', ts) AS ts_hour,
      CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
      CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
      CAST(dayofweek(ts) + 1 AS BIGINT) AS dow_sun1
    FROM events"""))

  /** f08 — casts, rounding, arithmetic (F20-F23; ref `generate_mock_data
    * .py:84-88`, `seperate_tables.py:69-74`): integer math is exact so
    * no decimal scaffolding is needed. */
  private val f08 = GraftQuery(
    "f08_cast_arith",
    (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity").cast("long").as("qty_int"),
          round(col("l_discount") * 100).cast("long").as("disc_pct"),
          (col("l_quantity").cast("long") * 1000).as("qty_millis"),
          col("l_quantity").cast("string").as("qty_str")),
    Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      CAST(l_quantity AS BIGINT) AS qty_int,
      CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
      CAST(l_quantity AS BIGINT) * 1000 AS qty_millis,
      CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '.0' AS qty_str
    FROM lineitem"""))

  /** f09 — truncate + ellipsis, coalesce/default (F14, F21, P7; ref
    * `generate_embeddings.py:107-108`, `seperate_tables.py:91,101`). */
  private val f09 = GraftQuery(
    "f09_truncate_coalesce",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          when(length(col("text")) > 60,
            concat(substring(col("text"), 1, 60), lit("...")))
            .otherwise(col("text")).as("preview"),
          coalesce(nullif(col("lang"), lit("en")), lit("default"))
            .as("lang_or_default")),
    Some("""SELECT doc_id,
      CASE WHEN length(text) > 60 THEN substring(text,1,60) || '...'
           ELSE text END AS preview,
      COALESCE(NULLIF(lang,'en'), 'default') AS lang_or_default
    FROM documents"""))

  /** f10 — URL build + parse (F17-F18; ref `products_scraping.py:344-349,
    * 537-540`): synthesize a URL from columns, then parse path + last
    * segment back out. Spark uses parse_url; the oracle derives the same
    * value by construction. */
  private val f10 = GraftQuery(
    "f10_url",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val url = concat(lit("https://example.com/"), col("source"),
        lit("/doc-"), col("doc_id"), lit(".html?lang="), col("lang"))
      d.select(
        col("doc_id"),
        url.as("url"),
        parse_url(url, lit("PATH")).as("path"),
        element_at(split(parse_url(url, lit("PATH")), "/"), -1)
          .as("last_segment"),
        parse_url(url, lit("QUERY"), lit("lang")).as("qs_lang"))
    },
    Some("""SELECT doc_id,
      'https://example.com/' || source || '/doc-' || doc_id || '.html?lang=' || lang AS url,
      '/' || source || '/doc-' || doc_id || '.html' AS path,
      'doc-' || doc_id || '.html' AS last_segment,
      lang AS qs_lang
    FROM documents"""))

  /** f11 — array construction + lambdas (F22 size-ladder; ref
    * `generate_mock_data.py:67-79`): price ladder base + i*step via
    * sequence/transform, exact integer arithmetic. The ladder is
    * serialized to a pipe-joined string (the reference's own list
    * encoding) so the driver's pandas compare can sort/hash the column —
    * raw array cells are unhashable there. */
  private val f11 = GraftQuery(
    "f11_array_lambda",
    (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          array_join(transform(sequence(lit(0), lit(2)),
            i => (col("p_size").cast("long") * 1000 + i * 500)
              .cast("string")), "|")
            .as("price_ladder"),
          aggregate(sequence(lit(1), col("p_size").cast("int")),
            lit(0L), (acc, x) => acc + x).as("size_triangle")),
    Some("""SELECT p_partkey,
      array_to_string(list_transform(range(0,3),
        i -> CAST(CAST(p_size AS BIGINT)*1000 + i*500 AS VARCHAR)), '|')
        AS price_ladder,
      list_reduce(list_prepend(CAST(0 AS BIGINT), range(1, p_size+1)),
        (a, x) -> a + x) AS size_triangle
    FROM part"""))

  /** f12 — map/struct construction (SURVEY §1.1 cmetadata; ref
    * `generate_embeddings.py:196-207`): key-value metadata as JSON. */
  private val f12 = GraftQuery(
    "f12_metadata_map",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          to_json(struct(col("lang"), col("source"),
            col("n_chars"))).as("cmetadata")),
    Some("""SELECT doc_id,
      '{"lang":"' || lang || '","source":"' || source ||
        '","n_chars":' || n_chars || '}' AS cmetadata
    FROM documents"""))

  /** f13 — conditional category mapping compiled to a when/rlike chain
    * (ref `standardize_categories.py:38-72` — the dictionary+regex
    * mapper as a pure expression tree, no UDF). */
  private val f13 = GraftQuery(
    "f13_rlike_categorizer",
    (s, dir) =>
      Tables(s, dir, "part")
        .withColumn("category",
          when(col("p_type").rlike("(?i)anodized"), "anodized")
            .when(col("p_type").rlike("(?i)(brushed|burnished)"), "finished")
            .when(col("p_type").rlike("(?i)plated"), "plated")
            .when(col("p_type").rlike("(?i)polished"), "polished")
            .otherwise("other"))
        .groupBy("category")
        .agg(count(lit(1)).as("cnt")),
    Some("""SELECT CASE
        WHEN regexp_matches(p_type, '(?i)anodized') THEN 'anodized'
        WHEN regexp_matches(p_type, '(?i)(brushed|burnished)') THEN 'finished'
        WHEN regexp_matches(p_type, '(?i)plated') THEN 'plated'
        WHEN regexp_matches(p_type, '(?i)polished') THEN 'polished'
        ELSE 'other' END AS category, COUNT(*) AS cnt
    FROM part GROUP BY 1"""))

  /** f14 — md5 content hash (cross-engine-stable hashing primitive used
    * by the dedup suite; ref `remove_duplicates.py` key idea). */
  private val f14 = GraftQuery(
    "f14_md5",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("text_md5")),
    Some("SELECT doc_id, md5(text) AS text_md5 FROM documents"))

  /** f15 — exact median + arg-min/max aggregates (SURVEY §2.5 family
    * extension): median of an integer-valued measure is exactly
    * representable in both engines ((a+b)/2 on ints); arg-extrema are
    * keyed on the unique partkey so ties cannot occur. */
  private val f15 = GraftQuery(
    "f15_median_argmin",
    (s, dir) =>
      Tables(s, dir, "part")
        .groupBy("p_brand")
        .agg(
          expr("percentile(p_size, 0.5)").as("median_size"),
          min_by(col("p_name"), col("p_partkey")).as("first_part"),
          max_by(col("p_name"), col("p_partkey")).as("last_part"),
          count(lit(1)).as("cnt")),
    Some("""SELECT p_brand,
      quantile_cont(CAST(p_size AS DOUBLE), 0.5) AS median_size,
      arg_min(p_name, p_partkey) AS first_part,
      arg_max(p_name, p_partkey) AS last_part,
      COUNT(*) AS cnt
    FROM part GROUP BY 1"""))

  /** f16 — collection algebra (array union/intersect/except over token
    * halves) + map construction. Results sorted in both engines (DuckDB's
    * list_intersect has no order guarantee) and serialized to pipe-joined
    * strings so the driver's pandas compare can sort/hash them. */
  private val f16 = GraftQuery(
    "f16_collections",
    (s, dir) => {
      val toks = split(col("text"), " ")
      val half = floor(size(toks) / 2).cast("int")
      val a = array_distinct(slice(toks, lit(1), half))
      val b = array_distinct(slice(toks, half + 1, size(toks)))
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          array_join(array_sort(array_union(a, b)), "|").as("union_toks"),
          array_join(array_sort(array_intersect(a, b)), "|")
            .as("common_toks"),
          array_join(array_sort(array_except(a, b)), "|")
            .as("first_half_only"),
          array_join(map_keys(map(lit("lang"), col("lang"), lit("source"),
            col("source"))), "|").as("meta_keys"))
    },
    Some("""SELECT doc_id,
      COALESCE(array_to_string(
        list_sort(list_distinct(list_concat(a, b))), '|'), '')
        AS union_toks,
      COALESCE(array_to_string(list_sort(list_intersect(a, b)), '|'), '')
        AS common_toks,
      COALESCE(array_to_string(list_sort(list_filter(a,
        x -> NOT list_contains(b, x))), '|'), '') AS first_half_only,
      array_to_string(map_keys(map{'lang': lang, 'source': source}), '|')
        AS meta_keys
    FROM (SELECT doc_id, lang, source,
        list_distinct(list_slice(string_split(text,' '), 1, half)) AS a,
        list_distinct(list_slice(string_split(text,' '), half+1,
          len(string_split(text,' ')))) AS b
      FROM (SELECT *, CAST(len(string_split(text,' ')) // 2 AS INTEGER)
              AS half FROM documents))"""))

  /** f17 — calendar arithmetic (F19's formatting sibling): extract
    * parts, add months, diff days, month boundaries. Conventions that
    * AGREE cross-engine only (no dayofweek — Spark counts Sunday=1,
    * DuckDB dow Sunday=0). Timestamps truncate to DATE first so no
    * sub-day component leaks into the arithmetic. */
  private val f17 = GraftQuery(
    "f17_date_math",
    (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("d"))
        .select(
          col("o_orderkey"),
          year(col("d")).cast("long").as("yr"),
          quarter(col("d")).cast("long").as("qtr"),
          month(col("d")).cast("long").as("mo"),
          dayofmonth(col("d")).cast("long").as("dom"),
          add_months(col("d"), 2).as("plus2mo"),
          last_day(col("d")).as("eom"),
          datediff(lit("1998-12-31").cast("date"), col("d"))
            .cast("long").as("days_to_end")),
    Some("""SELECT o_orderkey,
      CAST(year(d) AS BIGINT) AS yr,
      CAST(quarter(d) AS BIGINT) AS qtr,
      CAST(month(d) AS BIGINT) AS mo,
      CAST(day(d) AS BIGINT) AS dom,
      CAST(d + INTERVAL 2 MONTH AS DATE) AS plus2mo,
      last_day(d) AS eom,
      CAST(date_diff('day', d, DATE '1998-12-31') AS BIGINT)
        AS days_to_end
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
          FROM orders)"""))

  /** f18 — higher-order predicate lambdas (exists / forall / filter —
    * the F11 family's boolean siblings): does any token carry a digit,
    * are all tokens short, how many are long. DuckDB spells exists /
    * forall as filtered lengths — identical semantics. */
  private val f18 = GraftQuery(
    "f18_lambda_predicates",
    (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("toks", graft.functions.TextOps.tokens(col("text")))
        .select(
          col("doc_id"),
          exists(col("toks"), w => w.rlike("[0-9]")).as("any_digit"),
          forall(col("toks"), w => length(w) <= 12).as("all_short"),
          size(filter(col("toks"), w => length(w) >= 8)).cast("long")
            .as("n_long")),
    Some("""SELECT doc_id,
      len(list_filter(string_split(text,' '),
        w -> regexp_matches(w, '[0-9]'))) > 0 AS any_digit,
      len(list_filter(string_split(text,' '),
        w -> length(w) > 12)) = 0 AS all_short,
      CAST(len(list_filter(string_split(text,' '),
        w -> length(w) >= 8)) AS BIGINT) AS n_long
    FROM documents"""))

  /** f19 — null-preserving explode (explode_outer — f03's sibling for
    * the rows-must-survive contract): docs whose derived array is NULL
    * still emit one row with a NULL token. DuckDB's unnest drops NULL
    * lists, so the oracle substitutes the single-NULL list explicitly —
    * stating explode_outer's exact semantics. */
  private val f19 = GraftQuery(
    "f19_explode_outer",
    (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("arr",
          when(col("doc_id") % 10 === 0, lit(null))
            .otherwise(slice(graft.functions.TextOps.tokens(col("text")),
              1, 3)))
        .select(col("doc_id"), explode_outer(col("arr")).as("tok")),
    Some("""WITH t AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN [NULL]
               ELSE list_slice(string_split(text,' '), 1, 3) END AS arr
        FROM documents)
      SELECT doc_id, unnest(arr) AS tok FROM t"""))

  /** f20 — the config-driven HTML product extractor
    * ([[graft.etl.ProductExtract]], ref `products_scraping.py:392-621`)
    * oracle-paired: product pages are SYNTHESIZED relationally from
    * `part` (so DuckDB can compute the expected inverse directly),
    * then Spark round-trips them through the REAL operator — the
    * tolerant HTML parser, CSS descendant chains, entity decoding,
    * price cleanup, image alt/_optimized rules, the category skip-tag
    * and URL fallback, the og: meta fallback, and quarantine (absent
    * rows) — and the hash compare proves the parse inverts the
    * construction field-for-field. Three page shapes by partkey:
    * %97=0 unparseable (quarantined → absent), %10=0 og:-only (meta
    * path), %13=5 no-category (URL path fallback), else full HTML. */
  private val f20 = {
    import graft.etl.ProductExtract._
    val site = SiteConfig("shopx", "https://shop.example.com/",
      DetailSelectors(
        name = Some(".entry-title"),
        code = Some(".sku"),
        description = Seq(".short-desc"),
        unitPrice = Some("p.price span.amount bdi"),
        imageSelector = Some(".gallery"),
        detailImage = Some(".slide"),
        originalCategory = Some(".posted_in"),
        categoryTag = Some("a")))
    GraftQuery(
      "f20_html_extract",
      (s, dir) => {
        val part = Tables(s, dir, "part")
        val url = concat(lit("https://shop.example.com/"),
          lower(col("p_type")), lit("/item-"), col("p_partkey"), lit("/"))
        val caturl = concat(lit("https://shop.example.com/collections/"),
          lower(col("p_type")))
        val price = (col("p_partkey") * 100 + 99).cast("long")
        val catBlock = concat(
          lit("""<span class="posted_in">"""),
          lit("<a>Sản phẩm nổi bật</a>"),
          concat_ws("", transform(split(col("p_name"), " "),
            w => concat(lit("<a>"), w, lit("</a>")))),
          lit("</span>"))
        val fullHtml = concat(
          lit("""<html><body><h1 class="entry-title"> """),
          col("p_name"), lit(" </h1>"),
          lit("""<div class="short-desc">"""), col("p_type"),
          lit(" &amp; "), col("p_name"), lit("</div>"),
          lit("""<p class="price"><span class="amount"><bdi>"""),
          price, lit(""" &#8363;</bdi></span></p>"""),
          lit("""<span class="sku">"""), col("p_brand"), lit("</span>"),
          lit("""<div class="gallery"><div class="slide">"""),
          lit("""<img src="//cdn.shop.example.com/img/item-"""),
          col("p_partkey"), lit("""_optimized.jpg" alt="item-"""),
          col("p_partkey"), lit("""_optimized.jpg"></div></div>"""),
          when(col("p_partkey") % 13 === 5, lit("")).otherwise(catBlock),
          lit("</body></html>"))
        val metaHtml = concat(
          lit("""<html><head><meta property="og:title" content="OG """),
          col("p_name"), lit("\">"),
          lit("""<meta property="og:price:amount" content=""""),
          (col("p_partkey") * 7 % 1000).cast("long"), lit(",500\">"),
          lit("""<meta property="og:image" content="https://cdn.shop.example.com/og/"""),
          col("p_partkey"), lit(""".png"></head><body></body></html>"""))
        val pages = part.select(
          url.as("url"), caturl.as("category_url"),
          when(col("p_partkey") % 97 === 0, lit("<p>broken</p>"))
            .when(col("p_partkey") % 10 === 0, metaHtml)
            .otherwise(fullHtml).as("html"))
          // one small parquet file -> one input partition -> 20k HTML
          // parses on a single core (the v13 lesson). One tiny hash
          // shuffle spreads the parse across the session's full width.
          // The partition count is EXPLICIT: AQE's advisory size (64MB)
          // would coalesce a few-MB shuffle right back to one partition
          // — for a CPU-bound per-row stage the right parallelism
          // follows cores, not bytes. Real crawled corpora arrive
          // pre-split across many files and don't need this.
          .repartition(s.sparkContext.defaultParallelism, col("url"))
        // The typed Dataset[ProductInfo] keeps its list fields; the
        // REGISTRY row flattens them to '|'-joined strings — exactly
        // the reference's CSV write shape (SURVEY §1.1: pandas
        // to_csv pipe-joins list columns) and the only shape the
        // driver's pandas canonicalizer can sort/hash (r11's f20
        // failure: `unhashable type: 'numpy.ndarray'`).
        productsFromHtml(pages, site,
            categoryUrlCol = Some("category_url"))
          .toDF()
          .withColumn("category_name", concat_ws("|", col("category_name")))
          .withColumn("product_image", concat_ws("|", col("product_image")))
          .withColumn("product_image_name",
            concat_ws("|", col("product_image_name")))
      },
      Some("""WITH p AS (
        SELECT p_partkey AS pk, p_name, p_type, p_brand,
          'https://shop.example.com/' || lower(p_type) || '/item-' ||
            CAST(p_partkey AS VARCHAR) || '/' AS url,
          lower(p_type) AS cat_slug
        FROM part WHERE p_partkey % 97 <> 0)
      SELECT * FROM (
        SELECT
          'OG ' || p_name AS product_name,
          url AS product_url,
          'shopx' AS product_band,
          cat_slug AS category_name,
          'https://cdn.shop.example.com/og/' || CAST(pk AS VARCHAR)
            || '.png' AS product_image,
          'og ' || p_name AS product_image_name,
          '' AS product_code,
          '' AS product_description,
          CAST(pk * 7 % 1000 AS BIGINT) * 1000 + 500
            AS product_unit_price
        FROM p WHERE pk % 10 = 0
        UNION ALL
        SELECT
          p_name AS product_name,
          url AS product_url,
          'shopx' AS product_band,
          CASE WHEN pk % 13 = 5 THEN cat_slug
               ELSE array_to_string(string_split(p_name, ' '), '|')
               END AS category_name,
          'https://cdn.shop.example.com/img/item-' ||
            CAST(pk AS VARCHAR) || '_optimized.jpg' AS product_image,
          'item-' || CAST(pk AS VARCHAR) AS product_image_name,
          p_brand AS product_code,
          p_type || ' & ' || p_name AS product_description,
          CAST(pk AS BIGINT) * 100 + 99 AS product_unit_price
        FROM p WHERE pk % 10 <> 0)"""))
  }

  /** f21 — menu/category-URL extraction
    * ([[graft.etl.ProductExtract.menuUrls]], ref `menus_crawling.py:
    * 22-57`) oracle-paired like f20: one nav page per region built
    * relationally from `nation`, then parsed back by the real
    * operator. Covers class-regex container matching (with a decoy
    * `menu`-class list that must NOT match the `sub-menu` pattern),
    * the `#`-href → data-url fallback, keyword filtering, root-
    * relative urljoin, and the absolute-http:// pass-through. */
  private val f21 = GraftQuery(
    "f21_menu_extract",
    (s, dir) => {
      val nat = Tables(s, dir, "nation")
      val link = concat(lit("<li><a href=\"/product-category/"),
        regexp_replace(lower(col("n_name")), " ", "-"),
        lit("/\">"), col("n_name"), lit("</a></li>"))
      val pages = nat
        .groupBy(col("n_regionkey").as("rk"))
        .agg(concat_ws("", sort_array(collect_list(link))).as("links"))
        .select(
          concat(lit("https://shop.example.com/menu/r"), col("rk"))
            .as("url"),
          concat(
            lit("<nav><ul class=\"sub-menu extra\">"), col("links"),
            lit("<li><a href=\"#\" data-url=\"https://ext.example.com/" +
              "product-category/special-"), col("rk"),
            lit("\">S</a></li>"),
            lit("<li><a href=\"/about\">About</a></li>"),
            lit("<li><a href=\"http://legacy.example.com/" +
              "product-category/old-"), col("rk"), lit("\">Old</a></li>"),
            lit("</ul></nav><ul class=\"menu\"><li>" +
              "<a href=\"/product-category/decoy/\">D</a></li></ul>"))
            .as("html"))
      graft.etl.ProductExtract.menuUrlsFromPages(
        pages, "ul", "sub-menu", Some("product-category"))
    },
    Some("""WITH regions AS (SELECT DISTINCT n_regionkey AS rk FROM nation),
      base AS (SELECT 'https://shop.example.com/menu/r' ||
        CAST(rk AS VARCHAR) AS url, rk FROM regions)
    SELECT b.url,
      'https://shop.example.com/product-category/' ||
        replace(lower(n.n_name), ' ', '-') || '/' AS category_url
    FROM base b JOIN nation n ON n.n_regionkey = b.rk
    UNION ALL
    SELECT url, 'https://ext.example.com/product-category/special-' ||
      CAST(rk AS VARCHAR) FROM base
    UNION ALL
    SELECT url, 'http://legacy.example.com/product-category/old-' ||
      CAST(rk AS VARCHAR) FROM base"""))

  /** f22 — listing-page product-card URL harvest
    * ([[graft.etl.ProductExtract.productCardUrls]], ref
    * `products_scraping.py:316-360`), oracle-paired like f20/f21:
    * listing pages built relationally from `supplier` (one per
    * nation). Covers dot-stripped class-regex card matching, the
    * card-own-href vs inner-anchor fallback, hrefless-card skip,
    * skip_url_patterns, and root-relative absolutization. */
  private val f22 = GraftQuery(
    "f22_card_extract",
    (s, dir) => {
      val sup = Tables(s, dir, "supplier")
      val card = concat(
        lit("<div class=\"product-block\"><a href=\"/product/s-"),
        col("s_suppkey"), lit("/\">"), col("s_name"), lit("</a></div>"))
      val pages = sup
        .groupBy(col("s_nationkey").as("nk"))
        .agg(concat_ws("", sort_array(collect_list(card))).as("cards"))
        .select(
          concat(lit("https://shop.example.com/list/n"), col("nk"))
            .as("url"),
          concat(
            lit("<main>"), col("cards"),
            // skip-pattern card, hrefless card (no output), and a
            // card whose OWN href attribute is taken before any
            // inner anchor
            lit("<div class=\"product-block\">" +
              "<a href=\"/danh-muc/all/\">all</a></div>"),
            lit("<div class=\"product-block\">no link</div>"),
            lit("<div class=\"product-block\" " +
              "href=\"https://vip.example.com/s/n"), col("nk"),
            lit("\"><a href=\"/ignored\">v</a></div></main>"))
            .as("html"))
      graft.etl.ProductExtract.productCardUrlsFromPages(
        pages, "div", ".product-block", Some("danh-muc"),
        "https://shop.example.com/")
    },
    Some("""WITH pages AS (
      SELECT DISTINCT s_nationkey AS nk FROM supplier),
    base AS (SELECT 'https://shop.example.com/list/n' ||
      CAST(nk AS VARCHAR) AS url, nk FROM pages)
    SELECT b.url,
      'https://shop.example.com/product/s-' ||
        CAST(s.s_suppkey AS VARCHAR) || '/' AS product_url
    FROM base b JOIN supplier s ON s.s_nationkey = b.nk
    UNION ALL
    SELECT url, 'https://vip.example.com/s/n' || CAST(nk AS VARCHAR)
    FROM base"""))

  /** f23 — pagination next-link follow
    * ([[graft.etl.ProductExtract.nextPageUrlsFromPages]], ref
    * `products_scraping.py:216-244`), the last of S6's four parse
    * surfaces (detail/menu/card/pagination) and the only one that was
    * spec-only through r11. One listing page per nation; five shapes
    * cover every loop-end condition plus first-match precedence, all
    * against the igloo-style `a.page-link:contains(Next)` selector:
    * %5=0 class-match but text lacks "Next" (selector miss → no row),
    * %5=1 a single real next link (raw relative href, NOT
    * absolutized — the reference feeds it straight to requests.get),
    * %5=2 a matching anchor with no href (loop ends), %5=3 decoys
    * (text-no-class, class-wrong-text) before TWO real matches —
    * document-order selectOne must take the first — and %5=4 no
    * anchor at all. */
  private val f23 = GraftQuery(
    "f23_next_page",
    (s, dir) => {
      val nat = Tables(s, dir, "nation")
      val nk = col("n_nationkey")
      val realNext = concat(
        lit("""<a class="page-link" href="/danh-muc/page/"""),
        nk + 1, lit("""/">Next »</a>"""))
      val firstWins = concat(
        lit("""<a href="/no-class">Next</a>"""),
        lit("""<a class="page-link" href="/decoy">Older</a>"""),
        lit("""<a class="page-link" href="?page="""), nk,
        lit("""-s2">Next page</a>"""),
        lit("""<a class="page-link" href="/page/999/">Next</a>"""))
      val pages = nat.select(
        concat(lit("https://shop.example.com/list/p"), nk).as("url"),
        concat(lit("<nav>"),
          when(nk % 5 === 0,
            lit("""<a class="page-link" href="/prev">Prev</a>"""))
          .when(nk % 5 === 1, realNext)
          .when(nk % 5 === 2, lit("""<a class="page-link">Next</a>"""))
          .when(nk % 5 === 3, firstWins)
          .otherwise(lit("<p>last page</p>")),
          lit("</nav>")).as("html"))
      graft.etl.ProductExtract.nextPageUrlsFromPages(
        pages, "a.page-link:contains(Next)")
    },
    Some("""SELECT
      'https://shop.example.com/list/p' ||
        CAST(n_nationkey AS VARCHAR) AS url,
      CASE WHEN n_nationkey % 5 = 1
        THEN '/danh-muc/page/' || CAST(n_nationkey + 1 AS VARCHAR) || '/'
        ELSE '?page=' || CAST(n_nationkey AS VARCHAR) || '-s2' END
        AS next_url
    FROM nation WHERE n_nationkey % 5 IN (1, 3)"""))

  override val suite: Seq[GraftQuery] = Seq(
    f01, f02, f03, f04, f05, f06, f07, f08, f09, f10, f11, f12, f13, f14,
    f15, f16, f17, f18, f19, f20, f21, f22, f23)
}
