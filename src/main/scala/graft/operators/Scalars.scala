package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2.2 f01-f08). One query per family,
  * exercising the representative functions over testdata; every function
  * here is a codegen'd Catalyst builtin (no UDFs in these paths — the whole
  * projection stays inside WholeStageCodegen).
  *
  * Cross-engine notes: Spark's floor/ceil(double)→BIGINT vs DuckDB's
  * →DOUBLE (we cast), size()→INT vs len()→BIGINT (we cast), pmod has no
  * DuckDB builtin (((a % b) + b) % b in the oracle), xxhash64/crc32 have no
  * DuckDB equivalent (covered by unit tests in ScalarsSpec, not oracled).
  */
object Scalars extends QueryModule {

  def f01(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 8).as("name8"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        trim(lit("  pad  ")).as("trimmed"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        regexp_replace(col("p_name"), "a", "@").as("name_repl"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_first"),
        col("p_name").like("%gre%").as("has_gre"),
        length(col("p_name")).cast("long").as("name_len"),
        instr(col("p_type"), "ED").cast("long").as("ed_pos"))
      .orderBy("p_partkey")

  def f02(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2mo"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        (Tables.epochMs(col("o_orderdate")) / 1000L).cast("long").as("epoch_s"))
      .orderBy("o_orderkey")

  // the math projection is the per-row-heavy stage and the final
  // order-by-ALL's range sampler executes it TWICE (bounds sample +
  // output) — on the fixture's 3-split scan that was 2 × 3-task jobs.
  // Spreading the base rows ahead of the projection (§2.5; at-scale
  // no-op) parallelizes BOTH evaluations; the sort keys are untouched.
  def f03(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.lineitem(spark, dir), "l_orderkey")
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        round(pow(col("l_quantity"), 2.0), 6).as("qty_sq"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        round(log(col("l_extendedprice")), 9).as("price_ln"),
        round(log10(col("l_extendedprice")), 9).as("price_log10"),
        pmod(col("l_orderkey"), lit(7L)).as("key_mod7"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
        least(col("l_quantity"), col("l_discount") * 100).as("le"))
      .transform(Tables.orderAll)

  /** Higher-order array functions over the embedding column — the building
    * blocks of l03's cosine similarity, oracled here in isolation. */
  def f04(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        round(expr("aggregate(slice(transform(embedding, x -> CAST(x AS DOUBLE)), 1, 8), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"), 6).as("head8_sum"),
        round(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"), 6).as("norm_sq"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
        round(expr("array_max(transform(embedding, x -> CAST(x AS DOUBLE)))"), 6).as("mx"))
      .orderBy("vec_id")

  def f05(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        map_from_arrays(array(lit("et"), lit("uid")),
          array(col("event_type"), col("user_id").cast("string"))).as("m"))
      .select(
        col("event_id"),
        size(col("m")).cast("long").as("n_keys"),
        element_at(col("m"), "et").as("et"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"),
        element_at(col("m"), "uid").as("uid_str"))
      .orderBy("event_id")

  def f06(spark: SparkSession, dir: String): DataFrame =
    // spread (§2.5): two JSON parses per row on the single-split events
    // scan, evaluated twice by the order-by bounds sampler (f03's
    // shape; measured ~1.2 s serial). At-scale no-op.
    Tables.spread(Tables.events(spark, dir), "event_id")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_gjo"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k_struct"),
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
      .orderBy("event_id")

  /** md5/sha2 oracled; sha1/xxhash64/crc32 (no DuckDB builtin in this
    * install) are computed but dropped from the oracle projection — the
    * oracle covers md5+sha256, ScalarsSpec golden-vectors the rest. */
  def f07(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("h_md5"),
        sha2(col("text").cast("binary"), 256).as("h_sha256"))
      .orderBy("doc_id")

  /** The R8 tx-type inheritance chain, relationally: child value, else
    * parent's, else the snapshot default. */
  def f08(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        coalesce(expr("nullif(c_mktsegment, 'BUILDING')"),
          expr("nullif(c_name, 'none')"), lit("insert")).as("inherited"),
        expr("nvl(nullif(c_mktsegment, 'BUILDING'), 'fallback')").as("nvl_seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_acctbal"), lit(5000.0)).as("bal_cap"))
      .orderBy("c_custkey")

  def f09(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        levenshtein(col("p_brand"), lit("Brand#33")).cast("long").as("lev_b33"),
        translate(col("p_type"), "AEIOU", "aeiou").as("type_tr"),
        repeat(lit("ab"), 3).as("rep"),
        reverse(col("p_brand")).as("brand_rev"),
        substring(col("p_name"), 1, 3).as("left3"),
        col("p_name").substr(length(col("p_name")) - 1, lit(2)).as("right2"),
        ascii(col("p_brand")).cast("long").as("first_ascii"),
        col("p_type").startsWith("STANDARD").as("is_std"),
        col("p_type").endsWith("ED").as("ends_ed"),
        col("p_name").contains("gre").as("has_gre"))
      .orderBy("p_partkey")

  def f10(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).as("q"),
        (dayofweek(col("o_orderdate")) - 1).as("dow0"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_trunc("week", col("o_orderdate")).cast("date").as("week_start"))
      .orderBy("o_orderkey")

  /** f11: bitwise family — the partitioner/bucketizer primitives (masking,
    * shifts, popcount) every hash-distribution scheme builds on. DuckDB
    * spells xor as xor() (its ^ is exponentiation) and NOT as ~ like Spark. */
  def f11(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        expr("o_orderkey & 2047").as("k_and"),
        expr("o_orderkey | 15").as("k_or"),
        expr("o_orderkey ^ o_custkey").as("k_xor"),
        expr("~o_orderkey").as("k_not"),
        expr("shiftleft(o_orderkey, 3)").as("k_shl"),
        expr("shiftright(o_orderkey, 2)").as("k_shr"),
        expr("CAST(bit_count(o_orderkey) AS BIGINT)").as("k_bits"))
      .orderBy("o_orderkey")


  /** f12: the remaining higher-order array functions — exists, forall,
    * aggregate-with-finish (reduce+divide = mean), zip_with — closing the
    * HOF family f04 opened (transform/filter/aggregate). Functionality
    * surface only: HOFs are CodegenFallback, so hot paths use native
    * expressions instead (vec_dot), per SURVEY.md §9. */
  def f12(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        expr("exists(embedding, x -> x > 2.0)").as("has_gt2"),
        expr("forall(embedding, x -> x > -4.0)").as("all_gt_m4"),
        round(expr(
          """aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),
            |  CAST(0.0 AS DOUBLE), (a, x) -> a + x,
            |  a -> a / size(embedding))""".stripMargin), 6).as("mean_val"),
        round(expr(
          """aggregate(zip_with(slice(embedding, 1, 8),
            |    slice(reverse(embedding), 1, 8),
            |    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
            |  CAST(0.0 AS DOUBLE), (a, v) -> a + v)""".stripMargin), 6).as("revdot8"))
      .orderBy("vec_id")

  /** f13: URL family — the domain-extraction / query-param surface a
    * web-corpus pipeline needs (URL dedup keys, domain blocklists,
    * per-domain frequency caps). URLs are synthesized from part columns
    * so every branch is exercised; Spark parses with the real
    * parse_url/url_encode/url_decode, the oracle re-derives each piece
    * with regexes over the same synthesized string (no shared code
    * path). DuckDB 1.0 has no url_encode, so the oracle replicates
    * form-encoding for THIS data's charset (letters/space/# only) with
    * replaces — documented, data-domain-scoped equivalence. */
  def f13(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .withColumn("url", concat(
        lit("https://w"), pmod(col("p_partkey"), lit(5)), lit(".example.com/"),
        lower(col("p_type")), lit("/"), expr("url_encode(p_brand)"),
        lit("?id="), col("p_partkey"), lit("&size="), col("p_size")))
      .select(
        col("p_partkey"), col("url"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("qs"),
        expr("parse_url(url, 'QUERY', 'id')").as("pid"),
        expr("substring_index(parse_url(url, 'HOST'), '.', -2)").as("domain"),
        expr("url_encode(p_name)").as("enc_name"),
        expr("url_decode(url_encode(p_name))").as("dec_name"))
      .orderBy("p_partkey")

  /** f14: regex scalar family — extract / extract-all-count / global
    * replace over document text. All patterns are in the dialect
    * intersection of Java regex (Spark, codegen'd) and RE2 (DuckDB):
    * plain character classes, no backrefs/lookarounds. Spark's
    * regexp_extract returns '' on no-match where engines differ on
    * NULL-vs-empty, so every extract is NULLIF-normalized on BOTH
    * sides. Map-only — the whole row stays in one WholeStageCodegen
    * span over the scan. */
  def f14(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nullif(regexp_extract(col("text"), "[0-9]+", 0), lit("")).as("first_num"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("bigint").as("n_nums"),
        nullif(regexp_extract(col("text"), "[A-Z][a-z]+", 0), lit("")).as("first_cap"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).cast("bigint").as("n_words"),
        regexp_replace(substring(col("text"), 1, 40), "[0-9]", "#").as("masked_prefix"),
        col("text").rlike("[0-9]{2,}").as("has_multidigit"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f14_regex" -> f14,
    "f13_url" -> f13,
    "f09_string_extended" -> f09,
    "f11_bitwise" -> f11,
    "f10_date_extended" -> f10,
    "f01_string" -> f01,
    "f02_date" -> f02,
    "f03_math" -> f03,
    "f04_array" -> f04,
    "f05_map" -> f05,
    "f06_json" -> f06,
    "f07_hash" -> f07,
    "f08_conditional" -> f08,
    "f12_hof" -> f12)

  val oracles: Map[String, String] = Map(
    "f14_regex" ->
      """SELECT doc_id,
        |       NULLIF(regexp_extract(text, '[0-9]+'), '') AS first_num,
        |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
        |       NULLIF(regexp_extract(text, '[A-Z][a-z]+'), '') AS first_cap,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
        |       regexp_replace(substr(text, 1, 40), '[0-9]', '#', 'g') AS masked_prefix,
        |       regexp_matches(text, '[0-9]{2,}') AS has_multidigit
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f13_url" ->
      """WITH u AS (
        |  SELECT p_partkey, p_name,
        |         'https://w' || (p_partkey % 5) || '.example.com/' || lower(p_type)
        |           || '/' || replace(p_brand, '#', '%23')
        |           || '?id=' || p_partkey || '&size=' || p_size AS url
        |  FROM part)
        |SELECT p_partkey, url,
        |       regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '\?(.*)$', 1) AS qs,
        |       regexp_extract(url, '[?&]id=([^&]*)', 1) AS pid,
        |       regexp_extract(regexp_extract(url, 'https://([^/]+)', 1),
        |                      '([^.]+\.[^.]+)$', 1) AS domain,
        |       replace(p_name, ' ', '+') AS enc_name,
        |       p_name AS dec_name
        |FROM u ORDER BY p_partkey""".stripMargin,
    "f11_bitwise" ->
      """SELECT o_orderkey,
        |       o_orderkey & 2047 AS k_and,
        |       o_orderkey | 15 AS k_or,
        |       xor(o_orderkey, o_custkey) AS k_xor,
        |       ~o_orderkey AS k_not,
        |       o_orderkey << 3 AS k_shl,
        |       o_orderkey >> 2 AS k_shr,
        |       CAST(bit_count(o_orderkey) AS BIGINT) AS k_bits
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f09_string_extended" ->
      """SELECT p_partkey,
        |       CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS lev_b33,
        |       translate(p_type, 'AEIOU', 'aeiou') AS type_tr,
        |       repeat('ab', 3) AS rep,
        |       reverse(p_brand) AS brand_rev,
        |       left(p_name, 3) AS left3,
        |       right(p_name, 2) AS right2,
        |       CAST(ascii(p_brand) AS BIGINT) AS first_ascii,
        |       starts_with(p_type, 'STANDARD') AS is_std,
        |       suffix(p_type, 'ED') AS ends_ed,
        |       contains(p_name, 'gre') AS has_gre
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f10_date_extended" ->
      """SELECT o_orderkey,
        |       CAST(date_part('quarter', o_orderdate) AS INTEGER) AS q,
        |       CAST(dayofweek(o_orderdate) AS INTEGER) AS dow0,
        |       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
        |       CAST(date_part('doy', o_orderdate) AS INTEGER) AS doy,
        |       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f01_string" ->
      """SELECT p_partkey,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       substring(p_name, 1, 8) AS name8,
        |       upper(p_brand) AS brand_up,
        |       lower(p_type) AS type_lo,
        |       trim('  pad  ') AS trimmed,
        |       lpad(p_brand, 12, '*') AS brand_pad,
        |       regexp_replace(p_name, 'a', '@', 'g') AS name_repl,
        |       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |       regexp_extract(p_type, '^(\w+)', 1) AS type_first,
        |       p_name LIKE '%gre%' AS has_gre,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       CAST(instr(p_type, 'ED') AS BIGINT) AS ed_pos
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f02_date" ->
      """SELECT o_orderkey,
        |       EXTRACT(year FROM o_orderdate) AS yr,
        |       EXTRACT(month FROM o_orderdate) AS mo,
        |       EXTRACT(day FROM o_orderdate) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |       CAST(o_orderdate AS DATE) + 30 AS plus30,
        |       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2mo,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       epoch_ms(o_orderdate) // 1000 AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f03_math" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |       round(l_extendedprice, 1) AS price_r1,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       abs(l_discount - 0.05) AS disc_dev,
        |       round(pow(l_quantity, 2.0), 6) AS qty_sq,
        |       sqrt(l_extendedprice) AS price_sqrt,
        |       round(ln(l_extendedprice), 9) AS price_ln,
        |       round(log10(l_extendedprice), 9) AS price_log10,
        |       ((l_orderkey % 7) + 7) % 7 AS key_mod7,
        |       CASE WHEN l_discount - 0.05 > 0 THEN 1.0
        |            WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign,
        |       greatest(l_quantity, l_discount * 100) AS gr,
        |       least(l_quantity, l_discount * 100) AS le
        |FROM lineitem ORDER BY ALL""".stripMargin,
    "f04_array" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        |       round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head8_sum,
        |       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm_sq,
        |       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |       round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS mx
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "f05_map" ->
      """SELECT event_id,
        |       CAST(2 AS BIGINT) AS n_keys,
        |       event_type AS et,
        |       'et,uid' AS keys_sorted,
        |       CAST(user_id AS VARCHAR) AS uid_str
        |FROM events ORDER BY event_id""".stripMargin,
    "f06_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_gjo,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,
    "f07_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f12_hof" ->
      """SELECT vec_id,
        |  list_bool_or(list_transform(embedding, x -> x > 2.0)) AS has_gt2,
        |  list_bool_and(list_transform(embedding, x -> x > -4.0)) AS all_gt_m4,
        |  round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |        (a, b) -> a + b) / len(embedding), 6) AS mean_val,
        |  round(list_reduce(list_transform(
        |          list_zip(embedding[1:8], list_reverse(embedding)[1:8]),
        |          s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)),
        |        (a, b) -> a + b), 6) AS revdot8
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "f08_conditional" ->
      """SELECT c_custkey,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), nullif(c_name, 'none'), 'insert') AS inherited,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'fallback') AS nvl_seg,
        |       greatest(c_acctbal, 0.0) AS bal_floor,
        |       least(c_acctbal, 5000.0) AS bal_cap
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
