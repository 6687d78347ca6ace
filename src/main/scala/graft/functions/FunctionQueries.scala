package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{FlinkFunctions => F}

/** Scalar-function batteries (SURVEY.md §2.8 — the reference's
  * BuiltInFunctionDefinitions.java catalog). One query per function
  * family, each column exercising one function, hash-checked against
  * DuckDB computing the same value in its own dialect.
  *
  * Everything here is a narrow projection over one scan — the plan is
  * a single WholeStageCodegen span with the filter pushed to parquet.
  */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** String functions (BuiltInFunctionDefinitions.java:507-961). */
  def fnString(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      length(col("p_name")).as("len"),
      upper(col("p_name")).as("up"),
      lower(col("p_name")).as("lo"),
      substring(col("p_name"), 3, 5).as("sub"),
      regexp_replace(col("p_name"), "a", "X").as("rep"),
      trim(col("p_name")).as("tr"),
      lpad(col("p_name"), 15, "*").as("lp"),
      rpad(col("p_name"), 15, "*").as("rp"),
      instr(col("p_name"), "an").as("pos"),
      substring(col("p_name"), 1, 4).as("lft"),
      reverse(col("p_name")).as("rev"),
      regexp_extract(col("p_name"), "([a-z]+)", 1).as("re1"),
      translate(col("p_name"), "ae", "43").as("tl"),
      F.splitIndex(col("p_name"), " ", 1).as("spl"),
      base64(col("p_name").cast("binary")).as("b64"),
      ascii(col("p_name")).as("asc"),
      concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
      repeat(substring(col("p_name"), 1, 3), 2).as("rpt"))

  /** String/misc catalog tail (BuiltInFunctionDefinitions 507-961 +
    * logic rows): OVERLAY, POSITION, LEFT/RIGHT, BIN, HEX,
    * GREATEST/LEAST, NULLIF, ENCODE/DECODE round-trip, STR_TO_MAP,
    * PARSE_URL(HOST/QUERY) — each against a DuckDB twin (OVERLAY via
    * substr splice, PARSE_URL/STR_TO_MAP via their algebraic result).
    */
  def fnString2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      overlay(col("p_name"), lit("_"), lit(3)).as("ov"),
      expr("position('an' in p_name)").as("pos"),
      expr("left(p_name, 4)").as("lf"),
      expr("right(p_name, 4)").as("rt"),
      bin(col("p_partkey")).as("bn"),
      hex(col("p_partkey")).as("hx"),
      greatest(col("p_size"), lit(25), (col("p_partkey") % 50).cast("int")).as("gr"),
      least(col("p_size"), lit(25), (col("p_partkey") % 50).cast("int")).as("ls"),
      nullif(col("p_size"), lit(25)).as("nf"),
      decode(encode(col("p_name"), "UTF-8"), "UTF-8").as("ed"),
      element_at(
        str_to_map(concat(lit("b:"), col("p_brand"), lit(",t:"), col("p_type")),
          lit(","), lit(":")),
        "b").as("m1"),
      // the query value must be URL-safe: '#' in p_brand would start
      // a fragment and silently truncate the QUERY component
      parse_url(
        concat(lit("https://example.com/p/"), col("p_partkey"), lit("?b="), col("p_partkey")),
        lit("HOST")).as("uh"),
      parse_url(
        concat(lit("https://example.com/p/"), col("p_partkey"), lit("?b="), col("p_partkey")),
        lit("QUERY"), lit("b")).as("uq"))

  /** Math functions (:966-1431), incl. composed COT / SINH / COSH /
    * TANH / TRUNCATE gap-fillers.
    */
  def fnMath(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_quantity") - 25).as("ab"),
      ceil(col("l_quantity") / 7).as("cl"),
      floor(col("l_quantity") / 7).as("fl"),
      exp(col("l_quantity") / 50).as("ex"),
      log(col("l_quantity") + 1).as("lnv"),
      log10(col("l_quantity") + 1).as("lg10"),
      log2(col("l_quantity") + 1).as("lg2"),
      sqrt(col("l_quantity")).as("sq"),
      pow(col("l_quantity"), 2).as("pw"),
      (col("l_linenumber") % 3).as("md"),
      signum(col("l_quantity") - 25).as("sg"),
      sin(col("l_quantity")).as("snv"),
      cos(col("l_quantity")).as("csv"),
      atan2(col("l_quantity"), lit(10.0)).as("at2"),
      degrees(col("l_discount")).as("dg"),
      radians(col("l_quantity")).as("rd"),
      F.cot(col("l_quantity") + 1).as("ctv"),
      F.sinh(col("l_discount")).as("snh"),
      F.cosh(col("l_discount")).as("csh"),
      F.truncateNum(col("l_extendedprice") / 7, 1).as("tc1"))

  /** Temporal functions (:1445-1618). */
  def fnDatetime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      quarter(col("o_orderdate")).as("qtr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dy"),
      weekofyear(col("o_orderdate")).as("wk"),
      dayofweek(col("o_orderdate")).as("dow"),
      date_trunc("month", col("o_orderdate")).as("mstart"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
      unix_timestamp(col("o_orderdate")).as("ep"),
      (col("o_orderdate") + expr("INTERVAL '3' DAY")).as("dplus"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("ld"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("dd"))

  /** Temporal battery 2: day-of-year, day/month names, week
    * truncation, date construction, month arithmetic with end-of-month
    * clamping (both engines clamp), date subtraction — date-valued
    * results emitted as strings so the engines compare textually.
    */
  private val dayNames = Seq("Sunday", "Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday")
  private val monthNames = Seq("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")

  def fnDatetime2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      dayofyear(col("o_orderdate")).as("doy"),
      // array lookups, not date_format EEEE/MMMM: pattern names follow
      // the JVM default locale, while DuckDB's dayname is English-only
      element_at(array(dayNames.map(lit): _*), dayofweek(col("o_orderdate"))).as("dname"),
      element_at(array(monthNames.map(lit): _*), month(col("o_orderdate"))).as("mname"),
      date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("wstart"),
      date_format(make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)),
        "yyyy-MM-dd").as("mfirst"),
      date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("am2"),
      date_format(date_sub(col("o_orderdate"), 10), "yyyy-MM-dd").as("dsub"))

  /** Conditionals (:192-364): CASE/COALESCE/NULLIF/GREATEST/LEAST/IN. */
  def fnCond(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "low")
        .otherwise("high").as("bal_bucket"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
      greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
      least(col("c_acctbal"), lit(1000.0)).as("bal_cap"),
      col("c_mktsegment").isin("MACHINERY", "AUTOMOBILE").cast("int").as("is_mach_auto"),
      col("c_acctbal").between(100, 200).cast("int").as("in_band"),
      col("c_name").isNull.cast("int").as("name_null"))

  /** Crypto/hash (:1699-1755): MD5 / SHA-256 (SHA-224/384/512 exist
    * via sha2 but DuckDB 1.0 lacks them, so they are spec-tested
    * instead).
    */
  def fnHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("h_md5"),
      sha2(col("text").cast("binary"), 256).as("h_sha256"))

  /** JSON functions (:1883-2017) over the events.props JSON column.
    * Measured at sf0.1: three get_json_object probes beat one
    * from_json struct parse on short documents (3.8s vs 7.7s) — the
    * SIMD-ish path scanner wins until documents grow; revisit if the
    * corpus carries large JSON payloads.
    */
  def fnJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k_int"),
      get_json_object(col("props"), "$.missing").as("miss"),
      get_json_object(col("props"), "$.k").isNotNull.cast("int").as("has_k"))

  /** SQL:2016 JSON constructors/extractors
    * (BuiltInFunctionDefinitions.java:1883-1961): JSON_OBJECT with
    * NULL ON NULL, JSON_ARRAY, JSON_VALUE, JSON_EXISTS over
    * events.props.
    */
  def fnJson2(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{FlinkFunctions => F}
    t(s, dir, "events").select(
      col("event_id"),
      F.jsonObject(
        "k" -> get_json_object(col("props"), "$.k").cast("int"),
        "u" -> col("user_id")).as("obj"),
      F.jsonArray(col("event_id"), col("user_id")).as("arr"),
      F.jsonValue(col("props"), "$.k").as("jv"),
      F.jsonExists(col("props"), "$.k").cast("int").as("je"))
  }

  /** JSON_OBJECTAGG / JSON_ARRAYAGG (:1969-2017): per-user object of
    * event-type counts and sorted count array.
    */
  def fnJsonAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{FlinkFunctions => F}
    val sub = t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    sub.groupBy(col("user_id")).agg(
      F.jsonObjectAgg(col("event_type"), col("n")).as("obj"),
      F.jsonArrayAgg(col("n")).as("arr"))
  }

  /** Collection functions (BuiltInFunctionDefinitions ARRAY/MAP/ROW
    * block + AT/CARDINALITY/ELEMENT): constructors, 1-based element
    * access, cardinality, membership/position, slice, sort/distinct,
    * map construction + extraction, ROW field access — the dedicated
    * battery the round-1 coverage exercised only indirectly.
    */
  def fnCollections(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("p_name"), " ")
    t(s, dir, "part").select(
      col("p_partkey"),
      size(toks).as("card"),
      element_at(toks, 1).as("el1"),
      array_contains(toks, "green").cast("int").as("has_green"),
      array_position(toks, "green").as("pos_green"),
      array_join(sort_array(toks), "|").as("sorted_join"),
      array_join(slice(toks, 2, 2), "|").as("sl"),
      array_max(toks).as("tok_max"),
      array_min(toks).as("tok_min"),
      array_join(sort_array(array_distinct(toks)), "|").as("dist"),
      element_at(
        map_from_arrays(array(lit("a"), lit("b")), array(lit(1.5), col("p_retailprice"))),
        "b").as("mval"),
      size(map_from_arrays(array(lit("a"), lit("b")),
        array(lit(1), lit(2)))).as("mcard"),
      struct(col("p_brand").as("b"), col("p_size").as("sz"))
        .getField("sz").as("row_field"))
  }

  /** Regexp predicates + remaining string catalog rows
    * (BuiltInFunctionDefinitions REGEXP / INITCAP / CHR / LOCATE,
    * :507-961): REGEXP is Flink's boolean full-scan match (Spark
    * rlike), INITCAP capitalizes word heads (DuckDB lacks it — the
    * oracle rebuilds it from upper/substring), CHR maps codepoints,
    * LOCATE is 1-based-0-if-missing like the reference.
    */
  def fnString3(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      col("c_name").rlike("[0-9]{3}$").cast("int").as("re_match"),
      initcap(lower(col("c_mktsegment"))).as("seg_cap"),
      chr(lit(65) + col("c_custkey") % 26).as("bucket_chr"),
      expr("locate('8', c_name)").as("loc8"),
      regexp_extract(col("c_name"), "#([0-9]+)", 1).as("cust_num"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("masked"))

  /** Temporal arithmetic (BuiltInFunctionDefinitions TIMESTAMPADD /
    * TIMESTAMPDIFF / CONVERT_TZ / UNIX_TIMESTAMP / FROM_UNIXTIME /
    * TO_TIMESTAMP / TO_DATE, :1069-1360). TIMESTAMPDIFF counts
    * complete units, which equals DuckDB's boundary-crossing
    * date_diff because the anchor sits on an hour boundary.
    * CONVERT_TZ goes through the registered Flink-name function
    * (string in/out, wrapping Spark's convert_timezone).
    */
  def fnDatetime3(s: SparkSession, dir: String): DataFrame = {
    F.registerAll(s)
    t(s, dir, "events").select(
      col("event_id"),
      date_format(expr("timestampadd(MINUTE, 90, ts)"),
        "yyyy-MM-dd HH:mm:ss").as("ta_min"),
      date_format(expr("timestampadd(MONTH, 2, ts)"),
        "yyyy-MM-dd HH:mm:ss").as("ta_mon"),
      expr("timestampdiff(HOUR, timestamp'2000-01-01 00:00:00', ts)").as("td_hour"),
      expr("convert_tz(date_format(ts, 'yyyy-MM-dd HH:mm:ss'), " +
        "'UTC', 'America/New_York')").as("tz_ny"),
      unix_timestamp(col("ts")).as("unixsec"),
      from_unixtime(unix_timestamp(col("ts"))).as("fu"),
      date_format(to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
        "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss").as("tots"),
      date_format(to_date(date_format(col("ts"), "yyyy-MM-dd")), "yyyy-MM-dd").as("tod"))
  }

  /** Battery 4: character classification + JSON_STRING +
    * TO_TIMESTAMP_LTZ (BuiltInFunctionDefinitions IS_ALPHA/IS_DIGIT/
    * IS_DECIMAL/JSON_STRING/TO_TIMESTAMP_LTZ), all through the
    * registered Flink-name SQL surface.
    */
  def fnClassify(s: SparkSession, dir: String): DataFrame = {
    F.registerAll(s)
    t(s, dir, "customer").select(
      col("c_custkey"),
      expr("is_alpha(substring(c_name, 1, 8))").cast("int").as("ia_word"),
      expr("is_alpha(c_name)").cast("int").as("ia_mixed"),
      expr("is_digit(regexp_extract(c_name, '([0-9]+)', 1))").cast("int").as("id_digits"),
      expr("is_digit(c_mktsegment)").cast("int").as("id_seg"),
      expr("is_decimal(cast(c_custkey AS string))").cast("int").as("dec_int"),
      expr("is_decimal(c_name)").cast("int").as("dec_name"),
      expr("json_string(c_mktsegment)").as("js_str"),
      expr("json_string(c_nationkey)").as("js_num"),
      date_format(expr("to_timestamp_ltz(c_custkey * 86400000, 3)"),
        "yyyy-MM-dd HH:mm:ss").as("ltz3"),
      date_format(expr("to_timestamp_ltz(c_custkey * 86400, 0)"),
        "yyyy-MM-dd HH:mm:ss").as("ltz0"))
  }

  /** Remaining BuiltInFunctionDefinitions rows not in the earlier
    * batteries (round-4 diff against the reference's catalog):
    * TRY_CAST, TYPEOF, CHAR_LENGTH, LTRIM/RTRIM, REPLACE, MOD, POWER,
    * PI, ACOS/ASIN/ATAN, FLATTEN, UUID (shape-checked — the value is
    * random by definition).
    */
  def fnMisc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      expr("try_cast(p_name AS INT)").as("tc_bad"),
      expr("try_cast(cast(p_partkey AS STRING) AS INT)").as("tc_ok"),
      expr("typeof(p_retailprice)").as("ty_dbl"),
      expr("typeof(p_name)").as("ty_str"),
      expr("char_length(p_name)").as("clen"),
      expr("ltrim(concat('  ', p_name))").as("lt"),
      expr("rtrim(concat(p_name, '  '))").as("rt"),
      expr("replace(p_type, 'BRUSHED', 'X')").as("repl"),
      expr("mod(p_partkey, 7)").as("md"),
      expr("power(p_size, 2)").as("pw"),
      round(expr("pi()"), 6).as("pi_r"),
      round(expr("acos(least(p_size, 50) / 50.0)"), 6).as("ac"),
      round(expr("asin(least(p_size, 50) / 50.0)"), 6).as("asn"),
      round(expr("atan(p_size)"), 6).as("at"),
      // joined to a string so the driver's pandas comparator can hash
      // the column (it cannot sort ARRAY cells)
      array_join(
        flatten(array(array(col("p_size")), array((col("p_partkey") % 10).cast("int"))))
          .cast("array<string>"), ",").as("fl"),
      expr("uuid() rlike '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$'")
        .cast("int").as("uq"))

  /** FIRST_VALUE/LAST_VALUE (BuiltInFunctionDefinitions firstValue/
    * lastValue), EXTRACT, LOCALTIMESTAMP — the value-semantics slice
    * over the orders table, oracle-checked.
    */
  def fnWindowVal(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      expr("""first_value(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""").as("fv"),
      expr("""last_value(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""").as("lv"),
      expr("extract(YEAR FROM o_orderdate)").cast("int").as("ey"),
      expr("extract(MONTH FROM o_orderdate)").cast("int").as("em"),
      expr("extract(DAY FROM o_orderdate)").cast("int").as("ed"),
      // LOCALTIMESTAMP is wall clock — pin only its sanity, which both
      // engines evaluate at their own run time
      (year(expr("localtimestamp()")) >= 2024).cast("int").as("lt_ok"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_misc"     -> (fnMisc _),
    "q_fn_windowval" -> (fnWindowVal _),
    "q_fn_classify" -> (fnClassify _),
    "q_fn_string3"  -> (fnString3 _),
    "q_fn_datetime3" -> (fnDatetime3 _),
    "q_fn_collections" -> (fnCollections _),
    "q_fn_string"   -> (fnString _),
    "q_fn_string2"  -> (fnString2 _),
    "q_fn_math"     -> (fnMath _),
    "q_fn_datetime" -> (fnDatetime _),
    "q_fn_datetime2" -> (fnDatetime2 _),
    "q_fn_cond"     -> (fnCond _),
    "q_fn_hash"     -> (fnHash _),
    "q_fn_json"     -> (fnJson _),
    "q_fn_json2"    -> (fnJson2 _),
    "q_fn_jsonagg"  -> (fnJsonAgg _))

  val oracle: Map[String, String] = Map(
    // typeof returns engine-specific spellings — the oracle pins the
    // EXPECTED Spark spellings as literals, so a wrong type still fails
    "q_fn_misc" ->
      """SELECT p_partkey,
        |  TRY_CAST(p_name AS INT) AS tc_bad,
        |  TRY_CAST(p_partkey::VARCHAR AS INT) AS tc_ok,
        |  'double' AS ty_dbl,
        |  'string' AS ty_str,
        |  length(p_name) AS clen,
        |  ltrim('  ' || p_name) AS lt,
        |  rtrim(p_name || '  ') AS rt,
        |  replace(p_type, 'BRUSHED', 'X') AS repl,
        |  mod(p_partkey, 7) AS md,
        |  power(p_size, 2) AS pw,
        |  round(pi(), 6) AS pi_r,
        |  round(acos(least(p_size, 50) / 50.0), 6) AS ac,
        |  round(asin(least(p_size, 50) / 50.0), 6) AS asn,
        |  round(atan(p_size), 6) AS at,
        |  array_to_string(flatten([[p_size], [(p_partkey % 10)::INT]]), ',') AS fl,
        |  1 AS uq
        |FROM part""".stripMargin,
    "q_fn_windowval" ->
      """SELECT o_orderkey,
        |  first_value(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS fv,
        |  last_value(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
        |  extract(YEAR FROM o_orderdate)::INT AS ey,
        |  extract(MONTH FROM o_orderdate)::INT AS em,
        |  extract(DAY FROM o_orderdate)::INT AS ed,
        |  (extract(YEAR FROM localtimestamp) >= 2024)::INT AS lt_ok
        |FROM orders""".stripMargin,
    "q_fn_classify" ->
      """SELECT c_custkey,
        |  regexp_matches(substring(c_name, 1, 8), '^[a-zA-Z]+$')::INT AS ia_word,
        |  regexp_matches(c_name, '^[a-zA-Z]+$')::INT AS ia_mixed,
        |  regexp_matches(regexp_extract(c_name, '([0-9]+)', 1), '^[0-9]+$')::INT AS id_digits,
        |  regexp_matches(c_mktsegment, '^[0-9]+$')::INT AS id_seg,
        |  1 AS dec_int,
        |  0 AS dec_name,
        |  to_json(c_mktsegment) AS js_str,
        |  to_json(c_nationkey) AS js_num,
        |  strftime(to_timestamp(c_custkey * 86400), '%Y-%m-%d %H:%M:%S') AS ltz3,
        |  strftime(to_timestamp(c_custkey * 86400), '%Y-%m-%d %H:%M:%S') AS ltz0
        |FROM customer""".stripMargin,
    "q_fn_string3" ->
      """SELECT c_custkey,
        |  regexp_matches(c_name, '[0-9]{3}$')::INT AS re_match,
        |  concat(upper(substring(lower(c_mktsegment), 1, 1)),
        |         substring(lower(c_mktsegment), 2)) AS seg_cap,
        |  chr(65 + (c_custkey % 26)::INT) AS bucket_chr,
        |  instr(c_name, '8') AS loc8,
        |  regexp_extract(c_name, '#([0-9]+)', 1) AS cust_num,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
        |FROM customer""".stripMargin,
    "q_fn_datetime3" ->
      """SELECT event_id,
        |  strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS ta_min,
        |  strftime(ts + INTERVAL 2 MONTH, '%Y-%m-%d %H:%M:%S') AS ta_mon,
        |  date_diff('hour', TIMESTAMP '2000-01-01 00:00:00', ts) AS td_hour,
        |  strftime(timezone('America/New_York', ts::TIMESTAMPTZ),
        |           '%Y-%m-%d %H:%M:%S') AS tz_ny,
        |  floor(epoch(ts))::BIGINT AS unixsec,
        |  strftime(to_timestamp(floor(epoch(ts))::BIGINT),
        |           '%Y-%m-%d %H:%M:%S') AS fu,
        |  strftime(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
        |           '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS tots,
        |  strftime(ts, '%Y-%m-%d') AS tod
        |FROM events""".stripMargin,
    "q_fn_string" ->
      """SELECT p_partkey,
        |  length(p_name) AS len, upper(p_name) AS up, lower(p_name) AS lo,
        |  substring(p_name, 3, 5) AS sub,
        |  regexp_replace(p_name, 'a', 'X', 'g') AS rep,
        |  trim(p_name) AS tr,
        |  CASE WHEN length(p_name) >= 15 THEN p_name[:15]
        |       ELSE repeat('*', 15 - length(p_name)) || p_name END AS lp,
        |  CASE WHEN length(p_name) >= 15 THEN p_name[:15]
        |       ELSE p_name || repeat('*', 15 - length(p_name)) END AS rp,
        |  instr(p_name, 'an') AS pos,
        |  substring(p_name, 1, 4) AS lft,
        |  reverse(p_name) AS rev,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS re1,
        |  translate(p_name, 'ae', '43') AS tl,
        |  split_part(p_name, ' ', 2) AS spl,
        |  base64(p_name::BLOB) AS b64,
        |  ascii(p_name) AS asc,
        |  p_brand || '-' || p_type AS cw,
        |  repeat(substring(p_name, 1, 3), 2) AS rpt
        |FROM part""".stripMargin,
    "q_fn_string2" ->
      """SELECT p_partkey,
        |  substr(p_name, 1, 2) || '_' || substr(p_name, 4) AS ov,
        |  position('an' IN p_name) AS pos,
        |  left(p_name, 4) AS lf,
        |  right(p_name, 4) AS rt,
        |  bin(p_partkey) AS bn,
        |  hex(p_partkey) AS hx,
        |  greatest(p_size, 25, (p_partkey % 50)::INT) AS gr,
        |  least(p_size, 25, (p_partkey % 50)::INT) AS ls,
        |  nullif(p_size, 25) AS nf,
        |  p_name AS ed,
        |  p_brand AS m1,
        |  'example.com' AS uh,
        |  p_partkey::VARCHAR AS uq
        |FROM part""".stripMargin,
    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS ab,
        |  ceil(l_quantity / 7)::BIGINT AS cl,
        |  floor(l_quantity / 7)::BIGINT AS fl,
        |  exp(l_quantity / 50) AS ex,
        |  ln(l_quantity + 1) AS lnv,
        |  log10(l_quantity + 1) AS lg10,
        |  log2(l_quantity + 1) AS lg2,
        |  sqrt(l_quantity) AS sq,
        |  pow(l_quantity, 2) AS pw,
        |  l_linenumber % 3 AS md,
        |  sign(l_quantity - 25)::DOUBLE AS sg,
        |  sin(l_quantity) AS snv,
        |  cos(l_quantity) AS csv,
        |  atan2(l_quantity, 10.0) AS at2,
        |  degrees(l_discount) AS dg,
        |  radians(l_quantity) AS rd,
        |  cot(l_quantity + 1) AS ctv,
        |  (exp(l_discount) - exp(-l_discount)) / 2 AS snh,
        |  (exp(l_discount) + exp(-l_discount)) / 2 AS csh,
        |  floor(l_extendedprice / 7 * 10) / 10 AS tc1
        |FROM lineitem""".stripMargin,
    "q_fn_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  quarter(o_orderdate) AS qtr,
        |  month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dy,
        |  weekofyear(o_orderdate) AS wk,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        |  epoch(o_orderdate)::BIGINT AS ep,
        |  o_orderdate + INTERVAL '3 days' AS dplus,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS ld,
        |  date_diff('day', DATE '1995-01-01', o_orderdate) AS dd
        |FROM orders""".stripMargin,
    "q_fn_datetime2" ->
      """SELECT o_orderkey,
        |  dayofyear(o_orderdate) AS doy,
        |  dayname(o_orderdate) AS dname,
        |  monthname(o_orderdate) AS mname,
        |  strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS wstart,
        |  strftime(make_date(year(o_orderdate)::INT, month(o_orderdate)::INT, 1), '%Y-%m-%d') AS mfirst,
        |  strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS am2,
        |  strftime(o_orderdate - INTERVAL 10 DAY, '%Y-%m-%d') AS dsub
        |FROM orders""".stripMargin,
    "q_fn_cond" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_bucket,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  greatest(c_acctbal, 0.0) AS bal_floor,
        |  least(c_acctbal, 1000.0) AS bal_cap,
        |  CAST(c_mktsegment IN ('MACHINERY', 'AUTOMOBILE') AS INT) AS is_mach_auto,
        |  CAST(c_acctbal BETWEEN 100 AND 200 AS INT) AS in_band,
        |  CAST(c_name IS NULL AS INT) AS name_null
        |FROM customer""".stripMargin,
    "q_fn_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents""".stripMargin,
    "q_fn_collections" ->
      """SELECT p_partkey,
        |  len(string_split(p_name, ' ')) AS card,
        |  (string_split(p_name, ' '))[1] AS el1,
        |  list_contains(string_split(p_name, ' '), 'green')::INT AS has_green,
        |  list_position(string_split(p_name, ' '), 'green') AS pos_green,
        |  array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_join,
        |  array_to_string(list_slice(string_split(p_name, ' '), 2, 3), '|') AS sl,
        |  list_max(string_split(p_name, ' ')) AS tok_max,
        |  list_min(string_split(p_name, ' ')) AS tok_min,
        |  array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), '|') AS dist,
        |  (map(['a','b'], [1.5, p_retailprice])['b'])[1]::DOUBLE AS mval,
        |  cardinality(map(['a','b'], [1, 2])) AS mcard,
        |  struct_pack(b := p_brand, sz := p_size).sz AS row_field
        |FROM part""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  json_extract_string(props, '$.missing') AS miss,
        |  CAST(json_extract_string(props, '$.k') IS NOT NULL AS INT) AS has_k
        |FROM events""".stripMargin,
    // DuckDB's json_object emits the same compact text as Spark's
    // to_json ({"k":3,"u":5}); nulls render as "k":null on both sides
    "q_fn_json2" ->
      """SELECT event_id,
        |  json_object('k', CAST(json_extract_string(props, '$.k') AS INT),
        |              'u', user_id)::VARCHAR AS obj,
        |  json_array(event_id, user_id)::VARCHAR AS arr,
        |  json_extract_string(props, '$.k') AS jv,
        |  CAST(json_extract_string(props, '$.k') IS NOT NULL AS INT) AS je
        |FROM events""".stripMargin,
    // member order is implementation-defined in SQL:2016; both sides
    // sort (keys asc / values asc) so the text is deterministic
    "q_fn_jsonagg" ->
      """WITH sub AS (
        |  SELECT user_id, event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  '{' || string_agg('"' || event_type || '":' || n, ',' ORDER BY event_type) || '}' AS obj,
        |  '[' || string_agg(n::VARCHAR, ',' ORDER BY n) || ']' AS arr
        |FROM sub GROUP BY user_id""".stripMargin)
}
