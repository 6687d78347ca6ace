package graft

/** Remaining §2.8 catalog exceptions that DuckDB 1.0 cannot oracle:
  * PARSE_URL, OVERLAY, STR_TO_MAP, BIN/HEX/CONV, ENCODE/DECODE —
  * exact-value spec checks against the Spark built-ins that carry
  * their semantics.
  */
class ExtraFunctionsSpec extends SparkSpec {

  test("parse_url extracts host/path/query parts") {
    val r = spark.sql(
      """SELECT parse_url('https://example.com:8080/docs/a?x=1&y=2', 'HOST') AS h,
        |  parse_url('https://example.com:8080/docs/a?x=1&y=2', 'PATH') AS p,
        |  parse_url('https://example.com:8080/docs/a?x=1&y=2', 'QUERY', 'y') AS q""".stripMargin)
      .first()
    assert(r.getString(0) === "example.com")
    assert(r.getString(1) === "/docs/a")
    assert(r.getString(2) === "2")
  }

  test("overlay replaces a substring in place") {
    val r = spark.sql("SELECT overlay('SparkSQL' PLACING '_' FROM 6) AS o").first()
    assert(r.getString(0) === "Spark_QL")
  }

  test("str_to_map parses delimited pairs") {
    val r = spark.sql("SELECT str_to_map('a:1,b:2', ',', ':') AS m").first()
    assert(r.getMap[String, String](0) === Map("a" -> "1", "b" -> "2"))
  }

  test("bin/hex/conv number bases") {
    val r = spark.sql("SELECT bin(10) AS b, hex(255) AS h, conv('ff', 16, 10) AS c").first()
    assert(r.getString(0) === "1010")
    assert(r.getString(1) === "FF")
    assert(r.getString(2) === "255")
  }

  test("encode/decode round-trip") {
    val r = spark.sql("SELECT decode(encode('héllo', 'UTF-8'), 'UTF-8') AS s").first()
    assert(r.getString(0) === "héllo")
  }

  test("SQL:2016 JSON scalar functions by SQL name") {
    graft.functions.FlinkFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT json_value('{"a":{"b":2}}', '$.a.b') AS jv,
        |  json_query('{"a":{"b":2}}', '$.a') AS jq,
        |  CAST(json_exists('{"a":1}', '$.a') AS INT) AS je,
        |  CAST(json_exists('{"a":1}', '$.z') AS INT) AS jn,
        |  json_object('k', 1, 'm', CAST(NULL AS INT)) AS jo,
        |  json_array(3, 1, 2) AS ja""".stripMargin).first()
    assert(r.getString(0) === "2")
    assert(r.getString(1) === """{"b":2}""")
    assert(r.getInt(2) === 1)
    assert(r.getInt(3) === 0)
    assert(r.getString(4) === """{"k":1,"m":null}""") // NULL ON NULL
    assert(r.getString(5) === "[3,1,2]")
  }

  test("IS_JSON and PROCTIME by SQL name") {
    graft.functions.FlinkFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT CAST(is_json('{"a":1}') AS INT) AS j1,
        |  CAST(is_json('not json') AS INT) AS j2,
        |  proctime() IS NOT NULL AS pt""".stripMargin).first()
    assert(r.getInt(0) === 1)
    assert(r.getInt(1) === 0)
    assert(r.getBoolean(2))
  }

  test("sha384/sha512 match MessageDigest; classification edges; json_string; to_timestamp_ltz") {
    graft.functions.FlinkFunctions.registerAll(spark)
    def md(alg: String, s: String): String =
      java.security.MessageDigest.getInstance(alg).digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val r = spark.sql(
      """SELECT sha384('graft') AS h384, sha512('graft') AS h512,
        |  CAST(is_alpha('') AS INT) AS ia_empty,
        |  CAST(is_alpha(CAST(NULL AS STRING)) AS INT) AS ia_null,
        |  CAST(is_digit('007') AS INT) AS id_ok,
        |  CAST(is_decimal('-1.5e3') AS INT) AS dec_exp,
        |  CAST(is_decimal('1.2.3') AS INT) AS dec_bad,
        |  CAST(is_decimal(' 1.5 ') AS INT) AS dec_pad,
        |  CAST(is_decimal('0x1.8p1') AS INT) AS dec_hex,
        |  json_string('a"b') AS js_esc,
        |  json_string(CAST(NULL AS STRING)) AS js_null,
        |  json_string(named_struct('k', 1)) AS js_struct,
        |  date_format(to_timestamp_ltz(86400000, 3), 'yyyy-MM-dd') AS d3,
        |  date_format(to_timestamp_ltz(86400, 0), 'yyyy-MM-dd') AS d0,
        |  rand_integer(10) AS ri, rand_integer(42, 10) AS ris,
        |  current_watermark(TIMESTAMP'2020-01-01 00:00:00') IS NULL AS wm_null,
        |  current_row_timestamp() IS NOT NULL AS crt""".stripMargin).first()
    assert(r.getString(0) === md("SHA-384", "graft"))
    assert(r.getString(1) === md("SHA-512", "graft"))
    assert(r.getInt(2) === 0 && r.getInt(3) === 0) // empty + NULL -> FALSE
    assert(r.getInt(4) === 1)
    assert(r.getInt(5) === 1 && r.getInt(6) === 0)
    assert(r.getInt(7) === 1 && r.getInt(8) === 1) // parseDouble trims + hex-float
    assert(r.getString(9) === "\"a\\\"b\"")
    assert(r.isNullAt(10))
    assert(r.getString(11) === """{"k":1}""")
    assert(r.getString(12) === "1970-01-02" && r.getString(13) === "1970-01-02")
    assert(r.getInt(14) >= 0 && r.getInt(14) < 10)
    assert(r.getInt(15) >= 0 && r.getInt(15) < 10)
    assert(r.getBoolean(16) && r.getBoolean(17))
  }

  test("ELEMENT: sole element, NULL on empty, error on many") {
    graft.functions.FlinkFunctions.registerAll(spark)
    val row = spark.sql(
      "SELECT element(array(42)) AS one, element(cast(array() AS ARRAY<INT>)) AS none")
      .first()
    assert(row.getInt(0) === 42)
    assert(row.isNullAt(1))
    val e = intercept[Exception] {
      spark.sql("SELECT element(array(1, 2))").collect()
    }
    assert(e.getMessage.contains("more than one element"))
  }

  test("SQL:2016 JSON aggregate functions by SQL name") {
    graft.functions.FlinkFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT g, json_objectagg(k, v) AS jo, json_arrayagg(v) AS ja
        |FROM VALUES (1, 'b', 20), (1, 'a', 10), (2, 'c', 30) AS t(g, k, v)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r(0).getString(1) === """{"a":10,"b":20}""") // keys sorted
    assert(r(0).getString(2) === "[10,20]")
    assert(r(1).getString(1) === """{"c":30}""")
  }
}
