package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._
import graft.util.Determinism._

/** SURVEY.md §2.H — scalar function families, one query per family, each
  * exercising the codegen'd built-ins (never UDFs — rule: functions stay
  * inside whole-stage codegen). Oracle SQL mirrors every Spark↔DuckDB
  * dialect rename (instr→strpos, split[i] 1-based both, datediff arg order,
  * pmod expansion, get_json_object→json_extract_string, 'g' flag on
  * regexp_replace); every construct was executed against DuckDB 1.0 before
  * being declared here.
  *
  * Spark 4 runs with ANSI mode on: overflow demonstrations go through
  * try_cast / try_element_at so both engines yield NULL, not errors.
  */
object Scalars {

  def fnString(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .select(col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_name")).as("lo"),
        substring(col("c_name"), 1, 8).as("sub"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("cw"),
        regexp_replace(col("c_name"), "0", "O").as("rep"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("lp"),
        length(col("c_name")).as("len"),
        instr(col("c_name"), "1").as("pos1"),
        element_at(split(col("c_name"), "#"), 1).as("prefix"))
      .orderBy(col("c_custkey"))

  def fnRegex(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .where(col("c_name").rlike("[13579]$"))
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"))
      .orderBy(col("c_custkey"))

  def fnDate(spark: SparkSession, sf: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    orders(spark, sf)
      .select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        year(d).as("y"), month(d).as("m"), dayofmonth(d).as("d"),
        date_add(d, 30).as("plus30"),
        datediff(d, lit("1995-01-01")).as("days_since"),
        last_day(d).as("month_end"))
      .orderBy(col("o_orderkey"))
  }

  def fnMath(spark: SparkSession, sf: String): DataFrame =
    part(spark, sf)
      .select(col("p_partkey"),
        abs(col("p_size") - 25).as("a"),
        ceil(col("p_retailprice")).as("ce"),
        floor(col("p_retailprice")).as("fl"),
        round(dec2(col("p_retailprice")), 1).cast("double").as("r1"),
        (col("p_partkey") % 7).as("m7"),
        pmod(col("p_partkey") - 100, lit(7)).as("pm7"),
        pow(lit(2), col("p_partkey") % 10).cast("long").as("p2"),
        signum(col("p_size") - 25).cast("int").as("sg"),
        greatest(col("p_size"), lit(10)).as("gr"),
        least(col("p_size"), lit(40)).as("le"))
      .orderBy(col("p_partkey"))

  def fnConditional(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(col("o_orderkey"),
        when(col("o_totalprice") < 100000.0, "low")
          .when(col("o_totalprice") < 300000.0, "mid")
          .otherwise("high").as("band"),
        nullif(col("o_orderstatus"), lit("O")).as("st_nullif"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st_filled"),
        coalesce(nullif(col("o_orderpriority"), lit("5-LOW")), lit("LOW")).as("pri_filled"))
      .orderBy(col("o_orderkey"))

  def fnCast(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
      .select(col("c_custkey"), col("digits"),
        col("digits").cast("bigint").as("as_int"),
        expr("try_cast(concat(digits, '99999999999999999') AS BIGINT)").as("overflow_null"),
        // NULL DATE columns materialize as pandas NaT on the oracle side but
        // None from parquet — ship the NULL through VARCHAR so both stringify
        // identically. (The try_cast→NULL semantics are what's under test.)
        expr("CAST(try_cast('2024-02-30' AS DATE) AS STRING)").as("bad_date"))
      .join(customer(spark, sf).select(col("c_custkey").as("ck"), col("c_acctbal")),
        col("c_custkey") === col("ck"))
      .select(col("c_custkey"), col("digits"), col("as_int"), col("overflow_null"),
        col("bad_date"),
        dec2(col("c_acctbal")).cast("string").as("bal_str"),
        dec2(col("c_acctbal")).cast("string").cast(Dec18_2).cast("double").as("bal_back"))
      .orderBy(col("c_custkey"))

  def fnArray(spark: SparkSession, sf: String): DataFrame = {
    val words = split(col("text"), " ")
    documents(spark, sf)
      .select(col("doc_id"),
        size(words).as("n_words"),
        array_contains(words, "filter").as("has_filter"),
        size(array_distinct(words)).as("n_distinct"),
        concat_ws(" ", slice(array_sort(words), 1, 5)).as("first5"),
        aggregate(words, lit(0), (acc, x) => acc + length(x)).as("total_chars"),
        size(filter(words, w => length(w) > 5)).as("n_long"))
      .orderBy(col("doc_id"))
  }

  /** Generator surface: 1 row in → N out with position (posexplode). */
  def fnExplode(spark: SparkSession, sf: String): DataFrame =
    documents(spark, sf)
      .where(col("doc_id") < 100)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "word")
      .select(col("doc_id"), col("pos").cast("int").as("pos"), col("word"))
      .orderBy(col("doc_id"), col("pos"))

  /** Map build + lookup. The map itself never leaves the plan (map value
    * ordering is engine-specific) — outputs are lookups and cardinalities. */
  def fnMap(spark: SparkSession, sf: String): DataFrame =
    documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("cnt")))).as("m"))
      .select(col("doc_id"),
        coalesce(expr("try_element_at(m, 'data')"), lit(0L)).as("data_cnt"),
        size(map_keys(col("m"))).as("n_keys"))
      .orderBy(col("doc_id"))

  def fnJson(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("event_type"))
      .orderBy(col("event_id"))

  /** Bitwise function family over integer keys (hash partitioning, flags,
    * bitmap-index arithmetic all live on these at scale). */
  def fnBitwise(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(col("o_orderkey"),
        (col("o_orderkey").bitwiseAND(lit(255L))).as("band"),
        (col("o_orderkey").bitwiseOR(lit(4096L))).as("bor"),
        (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("bxor"),
        expr("shiftleft(o_orderkey, 3)").as("shl"),
        expr("shiftright(o_orderkey, 2)").as("shr"),
        bit_count(col("o_orderkey")).as("popcnt"))
      .orderBy(col("o_orderkey"))

  /** PII redaction ([R1] telecom flavor): mask digit runs and anything
    * email-shaped in a synthesized free-text column; pure regex — the
    * codegen-friendly path for large-corpus scrubbing. */
  def textPiiRedact(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .select(col("c_custkey"),
        concat(lit("contact "), col("c_name"), lit(" at "),
          col("c_custkey").cast("string"), lit("@example.com or +1"),
          lpad(col("c_custkey").cast("string"), 10, "5")).as("raw"))
      .select(col("c_custkey"), col("raw"),
        regexp_replace(
          regexp_replace(col("raw"), "[A-Za-z0-9.]+@[A-Za-z0-9.]+", "<EMAIL>"),
          "[0-9]{7,}", "<PHONE>").as("redacted"))
      .orderBy(col("c_custkey"))

  /** URL field extraction over synthesized URLs — regex on BOTH engines
    * (not Spark's parse_url) so the expression trees are identical. */
  def fnUrlParse(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .select(col("c_custkey"),
        concat(lit("https://"), lower(col("c_mktsegment")),
          lit(".example.com/c/"), col("c_custkey").cast("string"),
          lit("?seg="), col("c_mktsegment"), lit("&page=2")).as("url"))
      .select(col("c_custkey"), col("url"),
        regexp_extract(col("url"), "https://([^/]+)", 1).as("host"),
        regexp_extract(col("url"), "://[^/]+(/[^?]*)", 1).as("path"),
        regexp_extract(col("url"), "seg=([A-Z]+)", 1).as("seg_param"))
      .orderBy(col("c_custkey"))

  /** Hash + binary-encoding family (content addressing, dedup keys, cache
    * keys at scale). md5/sha256 hex is lowercase on both engines; hex() is
    * uppercase on both, and hex(integer) drops leading zeros on both
    * (validated against DuckDB 1.x). One measured divergence: Spark 4's
    * base64 MIME-chunks payloads >76 chars with CRLF, DuckDB's to_base64
    * never chunks — stripping the CRLFs yields exactly the unchunked
    * encoding, so `b64_long` proves the byte-level equality and `rt_ok`
    * proves decode∘encode = id through a >76-char payload. */
  def fnHashEncode(spark: SparkSession, sf: String): DataFrame = {
    val longPayload = rpad(col("c_name"), 100, "x")
    def b64(c: Column): Column =
      regexp_replace(base64(c.cast("binary")), "\r\n", "")
    customer(spark, sf)
      .select(col("c_custkey"),
        md5(col("c_name")).as("md5_hex"),
        sha2(col("c_name"), 256).as("sha256_hex"),
        b64(col("c_name")).as("b64"),
        b64(longPayload).as("b64_long"),
        hex(col("c_name")).as("hex_str"),
        hex(col("c_custkey")).as("hex_key"),
        (decode(unbase64(base64(longPayload.cast("binary"))), "UTF-8")
          === longPayload).cast("int").as("rt_ok"))
      .orderBy(col("c_custkey"))
  }

  /** Struct construct/access: named_struct flows through a filter and sort,
    * then fields are projected back out. */
  def fnStruct(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(struct(col("o_orderkey").as("key"),
        dec2(col("o_totalprice")).as("price"),
        col("o_orderstatus").as("status")).as("s"))
      .where(col("s.status") === "F" && col("s.key") % 4 === 1)
      .select(col("s.key").as("k"), col("s.price").cast("double").as("price"),
        col("s.status").as("status"))
      .orderBy(col("k"))

  /** Spark 4 COLLATION surface: UTF8_LCASE equality as a real JOIN key —
    * the engine compares under the collation (a first-class engine
    * feature, not a lower() rewrite at the call site). The fact side gets
    * synthetic case noise by orderkey parity; the dim carries canonical
    * lowercase labels, so output rows are deterministic. The oracle IS the
    * lower() rewrite — proving the collation join equals it on ASCII.
    *
    * PLAN NOTE: Spark 4.1 supports ONLY SortMergeJoin on UTF8_LCASE keys
    * (hash joins — broadcast included — are rejected: collated strings
    * have no binary equality), so a raw fact-side collated join must
    * shuffle every fact row on the collation key. The scale fix is to
    * pre-aggregate the fact to its ~10 distinct raw values first (plain
    * binary grouping, map-side combinable): the collated SMJ then sees
    * O(distinct values) rows — at 100 TB the shuffle carries ~10 rows,
    * not the fact table — while the collation-aware equality under test
    * still executes in the join. */
  def fnCollateCi(spark: SparkSession, sf: String): DataFrame = {
    val noisy = when(col("o_orderkey") % 2 === 0, upper(col("o_orderpriority")))
      .otherwise(lower(col("o_orderpriority")))
    val fact = orders(spark, sf).select(noisy.as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val dim = orders(spark, sf)
      .select(lower(col("o_orderpriority")).as("label")).distinct()
    fact.join(dim,
        expr("collate(v, 'UTF8_LCASE')") === expr("collate(label, 'UTF8_LCASE')"))
      .groupBy(col("label"))
      .agg(sum(col("cnt")).as("n"))
      .orderBy(col("label"))
  }

  /** Spark 4 VARIANT type — the semi-structured engine surface that
    * replaces string-JSON reparsing: props parses ONCE into the binary
    * variant encoding, fields extract with `variant_get` path+type, and
    * the whole thing aggregates like any typed column (at 100 TB the win
    * is parse-once + shredded access instead of per-expression JSON
    * string scans). Oracle: DuckDB's JSON extraction — proving the
    * variant path agrees with the string-JSON semantics it supersedes. */
  def fnVariant(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf)
      .select(parse_json(col("props")).as("v"), col("event_type"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'int')").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"), col("k_mod"))

  /** Conditional aggregation via FILTER clauses — one scan, many
    * selectively-fed aggregates (the pivot-less pivot; at scale this is
    * the difference between one pass and one pass per condition). */
  def aggFiltered(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_all"),
        count_if(col("o_orderstatus") === "F").as("n_f"),
        count_if(col("o_totalprice") > 200000.0).as("n_big"),
        sum(when(col("o_orderstatus") === "O",
          floor(col("o_totalprice") * 100).cast("long")).otherwise(0L)).as("open_cents"),
        max(when(col("o_orderstatus") === "P", col("o_orderkey"))).as("max_p_key"))
      .orderBy(col("o_orderpriority"))

  /** ANSI-safe TRY_* arithmetic — the error-handling surface Spark 4's
    * ANSI mode makes load-bearing: division by zero, BIGINT overflow,
    * malformed casts, and out-of-bounds element access all yield NULL
    * through the try_ family instead of failing the 100 TB job at row
    * 3 billion. Each column mixes NULL and non-NULL outcomes so the
    * oracle pins both branches; overflow is emulated in DuckDB by the
    * equivalent bound check (DuckDB would raise, which is exactly the
    * behavior try_multiply exists to absorb). */
  def fnTryArith(spark: SparkSession, sf: String): DataFrame =
    lineitem(spark, sf)
      .where(pmod(col("l_orderkey"), lit(500)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("long").as("q"))
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(q, l_linenumber % 3)").as("td"),
        expr("try_multiply(q, 1000000000000000000L)").as("tm"),
        expr("try_cast(concat('x', l_linenumber) AS INT)").as("tc_bad"),
        expr("try_cast(cast(l_linenumber AS STRING) AS INT)").as("tc_ok"),
        expr("try_element_at(array(q), 5)").as("te"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** ARGMAX/ARGMIN + boolean aggregation: max_by/min_by pick the key of
    * the priciest/cheapest order per priority, bool_and/bool_or summarize
    * predicates (emitted as int flags per house style). The ordering value
    * is made UNIQUE (cents·1e8 + orderkey) before max_by sees it — with
    * ties max_by is explicitly nondeterministic in both engines, so
    * determinism comes from the value construction, not the function. */
  def aggArgmaxBool(spark: SparkSession, sf: String): DataFrame = {
    val u = floor(col("o_totalprice") * 100).cast("long") * 100000000L +
      col("o_orderkey")
    orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"), u.as("u"))
      .groupBy(col("o_orderpriority"))
      .agg(expr("max_by(o_orderkey, u)").as("best_key"),
        expr("min_by(o_orderkey, u)").as("worst_key"),
        expr("bool_and(o_totalprice > 900)").cast("int").as("all_above_900"),
        expr("bool_or(o_orderstatus = 'P')").cast("int").as("any_pending"))
      .orderBy(col("o_orderpriority"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_argmax_bool" -> aggArgmaxBool,
    "fn_try_arith" -> fnTryArith,
    "fn_variant" -> fnVariant,
    "agg_filtered" -> aggFiltered,
    "fn_collate_ci" -> fnCollateCi,
    "fn_bitwise" -> fnBitwise,
    "fn_hash_encode" -> fnHashEncode,
    "fn_url_parse" -> fnUrlParse,
    "fn_struct" -> fnStruct,
    "text_pii_redact" -> textPiiRedact,
    "fn_string" -> fnString,
    "fn_regex" -> fnRegex,
    "fn_date" -> fnDate,
    "fn_math" -> fnMath,
    "fn_conditional" -> fnConditional,
    "fn_cast" -> fnCast,
    "fn_array" -> fnArray,
    "fn_explode" -> fnExplode,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson
  )

  def oracle: Map[String, String] = Map(
    "agg_argmax_bool" ->
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, CAST(floor(o_totalprice*100) AS BIGINT)*100000000
        |                      + o_orderkey) AS best_key,
        |  arg_min(o_orderkey, CAST(floor(o_totalprice*100) AS BIGINT)*100000000
        |                      + o_orderkey) AS worst_key,
        |  CAST(bool_and(o_totalprice > 900) AS INT) AS all_above_900,
        |  CAST(bool_or(o_orderstatus = 'P') AS INT) AS any_pending
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "fn_try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_linenumber % 3 = 0 THEN NULL
        |       ELSE q / (l_linenumber % 3) END AS td,
        |  CASE WHEN q >= 10 THEN NULL
        |       ELSE q * 1000000000000000000 END AS tm,
        |  TRY_CAST('x' || l_linenumber AS INT) AS tc_bad,
        |  TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS tc_ok,
        |  ([q])[5] AS te
        |FROM (SELECT l_orderkey, l_linenumber,
        |        CAST(floor(l_quantity) AS BIGINT) AS q
        |      FROM lineitem WHERE l_orderkey % 500 = 0)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_variant" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(json_extract_string(props, '$.k') AS INT) AS k
        |  FROM events)
        |SELECT event_type, k % 10 AS k_mod,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "agg_filtered" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_all,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (WHERE o_totalprice > 200000.0) AS BIGINT) AS n_big,
        |  CAST(coalesce(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |    FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS open_cents,
        |  max(o_orderkey) FILTER (WHERE o_orderstatus = 'P') AS max_p_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "fn_collate_ci" ->
      """WITH fact AS (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
        |              ELSE lower(o_orderpriority) END AS v FROM orders),
        |dim AS (SELECT DISTINCT lower(o_orderpriority) AS label FROM orders)
        |SELECT label, CAST(count(*) AS BIGINT) AS n
        |FROM fact JOIN dim ON lower(v) = label
        |GROUP BY label ORDER BY label""".stripMargin,

    "fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 4096 AS bor,
        |  xor(o_orderkey, o_custkey) AS bxor,
        |  o_orderkey << 3 AS shl,
        |  o_orderkey >> 2 AS shr,
        |  CAST(bit_count(o_orderkey) AS INT) AS popcnt
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_hash_encode" ->
      """SELECT c_custkey,
        |  md5(c_name) AS md5_hex,
        |  sha256(c_name) AS sha256_hex,
        |  to_base64(encode(c_name)) AS b64,
        |  to_base64(encode(rpad(c_name, 100, 'x'))) AS b64_long,
        |  hex(c_name) AS hex_str,
        |  hex(c_custkey) AS hex_key,
        |  CAST(decode(from_base64(to_base64(encode(rpad(c_name, 100, 'x')))))
        |       = rpad(c_name, 100, 'x') AS INT) AS rt_ok
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_url_parse" ->
      """SELECT c_custkey, url,
        |  regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |  regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, 'seg=([A-Z]+)', 1) AS seg_param
        |FROM (
        |  SELECT c_custkey,
        |    'https://' || lower(c_mktsegment) || '.example.com/c/' ||
        |    CAST(c_custkey AS VARCHAR) || '?seg=' || c_mktsegment || '&page=2' AS url
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "fn_struct" ->
      """SELECT s.key AS k, CAST(s.price AS DOUBLE) AS price, s.status AS status FROM (
        |  SELECT struct_pack(key := o_orderkey,
        |                     price := CAST(o_totalprice AS DECIMAL(18,2)),
        |                     status := o_orderstatus) AS s
        |  FROM orders)
        |WHERE s.status = 'F' AND s.key % 4 = 1
        |ORDER BY k""".stripMargin,

    "text_pii_redact" ->
      """SELECT c_custkey, raw,
        |  regexp_replace(
        |    regexp_replace(raw, '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<PHONE>', 'g') AS redacted
        |FROM (
        |  SELECT c_custkey,
        |    'contact ' || c_name || ' at ' || CAST(c_custkey AS VARCHAR) ||
        |    '@example.com or +1' || lpad(CAST(c_custkey AS VARCHAR), 10, '5') AS raw
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "fn_string" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo,
        |  substring(c_name, 1, 8) AS sub,
        |  concat_ws('-', c_mktsegment, c_name) AS cw,
        |  replace(c_name, '0', 'O') AS rep,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS lp,
        |  CAST(length(c_name) AS INT) AS len,
        |  CAST(strpos(c_name, '1') AS INT) AS pos1,
        |  str_split(c_name, '#')[1] AS prefix
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_regex" ->
      """SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        |FROM customer WHERE regexp_matches(c_name, '[13579]$')
        |ORDER BY c_custkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT p_partkey,
        |  abs(p_size - 25) AS a,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(round(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r1,
        |  p_partkey % 7 AS m7,
        |  ((p_partkey - 100) % 7 + 7) % 7 AS pm7,
        |  CAST(power(2, p_partkey % 10) AS BIGINT) AS p2,
        |  CAST(sign(p_size - 25) AS INT) AS sg,
        |  greatest(p_size, 10) AS gr,
        |  least(p_size, 40) AS le
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 100000.0 THEN 'low'
        |       WHEN o_totalprice < 300000.0 THEN 'mid'
        |       ELSE 'high' END AS band,
        |  nullif(o_orderstatus, 'O') AS st_nullif,
        |  COALESCE(nullif(o_orderstatus, 'O'), 'OPEN') AS st_filled,
        |  COALESCE(nullif(o_orderpriority, '5-LOW'), 'LOW') AS pri_filled
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_cast" ->
      """SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS as_int,
        |  TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) || '99999999999999999' AS BIGINT) AS overflow_null,
        |  CAST(TRY_CAST('2024-02-30' AS DATE) AS VARCHAR) AS bad_date,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS bal_str,
        |  CAST(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS bal_back
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_array" ->
      """SELECT doc_id,
        |  CAST(len(str_split(text, ' ')) AS INT) AS n_words,
        |  list_contains(str_split(text, ' '), 'filter') AS has_filter,
        |  CAST(len(list_distinct(str_split(text, ' '))) AS INT) AS n_distinct,
        |  array_to_string(list_sort(str_split(text, ' '))[1:5], ' ') AS first5,
        |  CAST(list_aggregate(list_transform(str_split(text, ' '), x -> length(x)), 'sum') AS INT) AS total_chars,
        |  CAST(len(list_filter(str_split(text, ' '), w -> length(w) > 5)) AS INT) AS n_long
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_explode" ->
      """SELECT doc_id, CAST(generate_subscripts(words, 1) - 1 AS INT) AS pos,
        |       unnest(words) AS word
        |FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents WHERE doc_id < 100)
        |ORDER BY doc_id, pos""".stripMargin,

    "fn_map" ->
      """SELECT doc_id,
        |  count(*) FILTER (WHERE word = 'data') AS data_cnt,
        |  CAST(count(DISTINCT word) AS INT) AS n_keys
        |FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  event_type
        |FROM events ORDER BY event_id""".stripMargin
  )
}
