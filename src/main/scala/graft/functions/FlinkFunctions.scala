package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._

/** Function registry: the reference's SQL function surface
  * (BuiltInFunctionDefinitions.java, 2112 LoC) re-expressed over
  * Spark. ~90% of the catalog maps 1:1 onto
  * org.apache.spark.sql.functions (SURVEY.md §2.8); this object
  * provides the gap-fillers — composed from codegen'd built-ins where
  * semantics allow (preference (a)), native Catalyst expressions
  * where they don't (preference (b): [[Fingerprint64]],
  * [[SimHash64]], [[CosineSimilarity]], …).
  */
object FlinkFunctions {

  private def toCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def toExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(c)

  // ---- native-expression wrappers -----------------------------------

  // AbstractDataType/ImplicitCastInputTypes are private[sql], so the
  // wrappers coerce explicitly with Cast nodes.
  private def asLong(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    if (e.dataType == org.apache.spark.sql.types.LongType) e
    else org.apache.spark.sql.catalyst.expressions.Cast(e, org.apache.spark.sql.types.LongType)

  def fingerprint64(c: Column): Column = toCol(Fingerprint64(toExpr(c)))
  def nfcNormalize(c: Column): Column = toCol(NfcNormalize(toExpr(c)))
  def charEntropy(c: Column): Column = toCol(CharEntropy(toExpr(c)))
  def tokenEntropy(c: Column): Column = toCol(TokenEntropy(toExpr(c)))
  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))
  def cosineSimilarity(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))
  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))
  def lshBucket(c: Column, nBits: Int): Column = toCol(LshBucket(toExpr(c), nBits))
  def lshBucket(c: Column, nBits: Int, seed: Int): Column = toCol(LshBucket(toExpr(c), nBits, seed))
  def lshSignature(c: Column, nBits: Int): Column = toCol(LshSignature(toExpr(c), nBits))
  def rpProject(c: Column, dOut: Int): Column = toCol(RpProject(toExpr(c), dOut))
  def hammingSig(a: Column, b: Column): Column = toCol(HammingSignature(toExpr(a), toExpr(b)))
  def cmsEstimate(sketch: Column, item: Column): Column =
    toCol(CmsEstimate(toExpr(sketch), toExpr(item)))
  def hamming64(a: Column, b: Column): Column =
    toCol(HammingDistance64(asLong(toExpr(a)), asLong(toExpr(b))))

  // ---- composed gap-fillers (Flink semantics over Spark built-ins) --

  /** SPLIT_INDEX(str, delim, idx): 0-based element of the split, NULL
    * when out of range (BuiltInFunctionDefinitions.java:929,
    * SqlFunctionUtils.splitIndex). `get` gives the same NULL-on-OOB;
    * the delimiter is a literal, so it is regex-quoted.
    */
  def splitIndex(str: Column, delim: String, idx: Int): Column =
    get(split(str, Pattern.quote(delim)), lit(idx))

  /** COT (BuiltInFunctionDefinitions math block, :966-1431). */
  def cot(c: Column): Column = lit(1.0) / tan(c)

  def sinh(c: Column): Column = (exp(c) - exp(-c)) / 2.0
  def cosh(c: Column): Column = (exp(c) + exp(-c)) / 2.0
  def tanhG(c: Column): Column = sinh(c) / cosh(c)

  /** TEMPORAL_OVERLAPS(s1, e1, s2, e2)
    * (BuiltInFunctionDefinitions.java:1495): true iff the two periods
    * share at least one time point (inclusive endpoints).
    */
  def temporalOverlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    greatest(s1, s2) <= least(e1, e2)

  /** TRUNCATE(x, scale) — truncation toward zero at `scale` decimals
    * (Flink TRUNCATE; Spark's trunc is date-only).
    */
  def truncateNum(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    when(c >= 0, floor(c * p) / p).otherwise(-floor(-c * p) / p)
  }

  def ifNull(a: Column, b: Column): Column = coalesce(a, b)
  def sha224(c: Column): Column = sha2(c, 224)

  // ---- SQL:2016 JSON surface (BuiltInFunctionDefinitions.java:1883-2017) --

  /** JSON_OBJECT(k VALUE v, ...) with NULL ON NULL (the SQL:2016
    * default): null values serialize as `"k":null`, hence
    * ignoreNullFields=false.
    */
  def jsonObject(pairs: (String, Column)*): Column =
    to_json(struct(pairs.map { case (k, c) => c.as(k) }: _*),
      Map("ignoreNullFields" -> "false"))

  /** JSON_ARRAY(v, ...) with ABSENT ON NULL (the SQL:2016 default):
    * null elements are dropped.
    */
  def jsonArray(vs: Column*): Column =
    to_json(filter(array(vs: _*), _.isNotNull))

  /** JSON_VALUE(json, path): scalar extraction. */
  def jsonValue(c: Column, path: String): Column = get_json_object(c, path)

  /** JSON_QUERY(json, path): extraction of objects/arrays as JSON
    * text (get_json_object returns the serialized subtree for
    * non-scalar matches).
    */
  def jsonQuery(c: Column, path: String): Column = get_json_object(c, path)

  /** JSON_EXISTS(json, path). */
  def jsonExists(c: Column, path: String): Column =
    get_json_object(c, path).isNotNull

  /** JSON_OBJECTAGG(k VALUE v): one JSON object per group. SQL leaves
    * member order implementation-defined; keys sort ascending here so
    * results are deterministic (and oracle-comparable).
    */
  def jsonObjectAgg(k: Column, v: Column): Column =
    to_json(map_from_entries(sort_array(collect_list(struct(k, v)))))

  /** JSON_ARRAYAGG(v): one JSON array per group, elements sorted
    * ascending for determinism.
    */
  def jsonArrayAgg(v: Column): Column =
    to_json(sort_array(collect_list(v)))

  /** Register the SQL-name surface so `spark.sql` text can call the
    * Flink-only names directly. Registration goes through the
    * Catalyst function registry (expression builders), not
    * spark.udf — the registered functions stay codegen'd.
    */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.{expressions => expressions}
    val reg = spark.sessionState.functionRegistry
    // idempotent at the registerAll level: callers invoke this
    // defensively before every SQL-path query, and re-registering
    // each name would WARN ("replaced a previously registered
    // function") on every call. A per-NAME existence check is wrong
    // here — several registrations deliberately SHADOW Spark
    // builtins with the Flink signature (TO_TIMESTAMP_LTZ(millis,
    // precision) vs Spark's string form), and functionExists sees
    // the builtin and would skip the shadow. The sentinel marks
    // "this session already ran registerAll" and nothing else.
    val sentinel = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fns_registered")
    if (reg.functionExists(sentinel)) return
    val recorded = scala.collection.mutable.ListBuffer.empty[String]
    def reg1(name: String)(b: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression): Unit = {
      // the intentional builtin shadows (cot, to_timestamp_ltz) would
      // still WARN once on the replace; dropping the stale entry first
      // makes every registration a silent fresh insert
      reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name))
      reg.createOrReplaceTempFunction(name, b, "built-in")
      recorded += name
    }
    reg1(sentinel.funcName) { _ => expressions.Literal(true) }

    reg1("fingerprint64") { es => Fingerprint64(es.head) }
    // hashed-linear-model quality logit (the SelectionQueries
    // scoring) as a SQL scalar: the canonical SQL text parses once
    // per call site and the call's argument grafts onto the
    // placeholder, so the SQL surface and the DataFrame operator
    // share one definition
    reg1("quality_logit") { es =>
      spark.sessionState.sqlParser
        .parseExpression(graft.text.SelectionQueries.logitSparkSql("__ql_arg__"))
        .transformUp {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.name == "__ql_arg__" => es.head
        }
    }
    reg1("nfc_normalize") { es => NfcNormalize(es.head) }
    reg1("char_entropy") { es => CharEntropy(es.head) }
    reg1("token_entropy") { es => TokenEntropy(es.head) }
    reg1("simhash64") { es => SimHash64(es.head) }
    reg1("cosine_similarity") { es => CosineSimilarity(es(0), es(1)) }
    reg1("dot_product") { es => DotProduct(es(0), es(1)) }
    reg1("hamming64") { es => HammingDistance64(asLong(es(0)), asLong(es(1))) }
    reg1("cms_estimate") { es => CmsEstimate(es(0), es(1)) }
    // raw catalyst trees here: Column-built trees would smuggle
    // unresolved ColumnNodes past the analyzer
    reg1("cot") { es =>
      expressions.Divide(expressions.Literal(1.0), expressions.Tan(es.head))
    }
    reg1("split_index") { es =>
      expressions.GetArrayItem(
        expressions.StringSplit(es(0), es(1), expressions.Literal(-1)), es(2))
    }
    // Flink spellings of functions Spark has under other names
    // (BuiltInFunctionDefinitions TO_BASE64/FROM_BASE64/SHA224/TRUNCATE)
    reg1("to_base64") { es => expressions.Base64(expressions.Cast(es.head,
      org.apache.spark.sql.types.BinaryType)) }
    reg1("from_base64") { es => expressions.Cast(expressions.UnBase64(es.head),
      org.apache.spark.sql.types.StringType) }
    reg1("sha224") { es => expressions.Sha2(expressions.Cast(es.head,
      org.apache.spark.sql.types.BinaryType), expressions.Literal(224)) }
    reg1("sha384") { es => expressions.Sha2(expressions.Cast(es.head,
      org.apache.spark.sql.types.BinaryType), expressions.Literal(384)) }
    reg1("sha512") { es => expressions.Sha2(expressions.Cast(es.head,
      org.apache.spark.sql.types.BinaryType), expressions.Literal(512)) }
    // ELEMENT(array): the sole element of a single-element array,
    // NULL for empty, error for more than one
    // (BuiltInFunctionDefinitions ELEMENT). The error rides in the
    // index expression so the If branches keep the array's element
    // type.
    reg1("element") { es =>
      val arr = es.head
      val tooMany = expressions.Cast(expressions.RaiseError(expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "ELEMENT() on an array with more than one element"),
        org.apache.spark.sql.types.StringType)), org.apache.spark.sql.types.IntegerType)
      new expressions.GetArrayItem(arr,
        expressions.If(
          expressions.GreaterThan(expressions.Size(arr), expressions.Literal(1)),
          tooMany, expressions.Literal(0)),
        false) // out-of-bounds (empty array) -> NULL, not error
    }
    // character-classification predicates (SqlFunctionUtils.java:
    // isAlpha 982, isDigit 964, isDecimal 912): non-empty string of
    // letters / digits / a parseable number; NULL -> FALSE, not NULL.
    // isDecimal approximates the Java parse grammar with a regex
    // (accepts sign, decimal, exponent, NaN/Infinity, f/d suffix).
    def classify(name: String, pattern: String): Unit = reg1(name) { es =>
      expressions.If(expressions.IsNull(es.head), expressions.Literal(false),
        expressions.RLike(es.head, expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(pattern),
          org.apache.spark.sql.types.StringType)))
    }
    classify("is_alpha", "^\\p{L}+$")
    classify("is_digit", "^\\p{Nd}+$")
    // Double.parseDouble trims whitespace and accepts hex-float
    // ("0x1.8p1") syntax, so the grammar includes both
    classify("is_decimal",
      "^\\s*[+-]?(NaN|Infinity|((\\p{Nd}+\\.?\\p{Nd}*|\\.\\p{Nd}+)([eE][+-]?\\p{Nd}+)?[fFdD]?)" +
        "|(0[xX]([0-9a-fA-F]+\\.?[0-9a-fA-F]*|\\.[0-9a-fA-F]+)[pP][+-]?\\p{Nd}+[fFdD]?))\\s*$")
    // JSON_STRING(v): serialize any value to a JSON text; NULL -> NULL
    // (BuiltInFunctionDefinitions JSON_STRING). to_json only accepts
    // container types, so wrap in a 1-element array and strip the
    // brackets — nested values serialize correctly inside.
    reg1("json_string") { es =>
      val arr = expressions.StructsToJson(Map("ignoreNullFields" -> "false"),
        expressions.CreateArray(Seq(es.head)))
      val stripped = expressions.Substring(arr, expressions.Literal(2),
        expressions.Subtract(expressions.Length(arr), expressions.Literal(2)))
      expressions.If(expressions.IsNull(es.head),
        expressions.Literal(null, org.apache.spark.sql.types.StringType), stripped)
    }
    // RAND_INTEGER([seed,] n): uniform int in [0, n)
    reg1("rand_integer") { es =>
      val (seed, n) = es match {
        case Seq(n0) => (expressions.Literal(scala.util.Random.nextLong()), n0)
        case Seq(s0, n0) => (s0, n0)
      }
      expressions.Cast(expressions.Floor(expressions.Multiply(
        new expressions.Rand(seed),
        expressions.Cast(n, org.apache.spark.sql.types.DoubleType))),
        org.apache.spark.sql.types.IntegerType)
    }
    // TO_TIMESTAMP_LTZ(numeric [, precision 0|3]): epoch seconds or
    // millis -> session-zone timestamp (default precision 3)
    reg1("to_timestamp_ltz") { es =>
      val p = es.lift(1).getOrElse(expressions.Literal(3))
      expressions.If(
        expressions.EqualTo(expressions.Cast(p,
          org.apache.spark.sql.types.IntegerType), expressions.Literal(0)),
        expressions.SecondsToTimestamp(expressions.Cast(es.head,
          org.apache.spark.sql.types.LongType)),
        expressions.MillisToTimestamp(expressions.Cast(es.head,
          org.apache.spark.sql.types.LongType)))
    }
    // CURRENT_ROW_TIMESTAMP(): per-row wall clock in the reference;
    // batch/micro-batch constant here (same caveat as PROCTIME)
    reg1("current_row_timestamp") { _ => expressions.CurrentTimestamp() }
    // CURRENT_WATERMARK(rowtime): NULL whenever no watermark has been
    // emitted — which is always true on the batch path; the streaming
    // operators track watermarks internally (StreamingOps) and don't
    // surface them as a per-row expression
    reg1("current_watermark") { _ =>
      expressions.Literal(null, org.apache.spark.sql.types.TimestampType) }
    // SQL:2016 JSON surface (BuiltInFunctionDefinitions.java:1883-2017).
    // json_object takes alternating key/value args (the KEY k VALUE v
    // SQL syntax is Flink-parser-only); aggregates nest a
    // CollectList AggregateExpression inside scalar JSON shaping,
    // which Spark plans as agg + project.
    // IS_JSON: get_json_object('$') returns null iff the text fails to
    // parse as a JSON document; the literal document `null` is valid
    // JSON but maps to SQL NULL, so it is special-cased. Known
    // divergence: trailing garbage after a valid root is accepted
    // (Spark's scanner stops at the root), where Flink rejects it.
    reg1("is_json") { es =>
      val strTpe = org.apache.spark.sql.types.StringType
      def str(s: String) = expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), strTpe)
      expressions.Or(
        expressions.IsNotNull(expressions.GetJsonObject(es.head, str("$"))),
        expressions.EqualTo(expressions.StringTrim(es.head), str("null")))
    }
    // PROCTIME(): processing-time attribute. NOTE: CurrentTimestamp is
    // batch/micro-batch constant (ComputeCurrentTime folds it), which
    // matches Flink's per-watermark granularity loosely but is NOT a
    // per-record wall clock.
    reg1("proctime") { _ => expressions.CurrentTimestamp() }
    // CONVERT_TZ(dateStr, tzFrom, tzTo) — Flink takes/returns strings
    // (BuiltInFunctionDefinitions CONVERT_TZ); Spark's native
    // convert_timezone works on TIMESTAMP_NTZ, so wrap with casts
    reg1("convert_tz") { es =>
      expressions.Cast(
        expressions.ConvertTimezone(es(1), es(2),
          expressions.Cast(es(0), org.apache.spark.sql.types.TimestampNTZType)),
        org.apache.spark.sql.types.StringType)
    }
    reg1("json_value") { es => expressions.GetJsonObject(es(0), es(1)) }
    reg1("json_query") { es => expressions.GetJsonObject(es(0), es(1)) }
    reg1("json_exists") { es => expressions.IsNotNull(expressions.GetJsonObject(es(0), es(1))) }
    reg1("json_object") { es =>
      expressions.StructsToJson(Map("ignoreNullFields" -> "false"),
        expressions.CreateNamedStruct(es))
    }
    reg1("json_array") { es =>
      expressions.StructsToJson(Map.empty[String, String], expressions.CreateArray(es))
    }
    reg1("json_objectagg") { es =>
      expressions.StructsToJson(Map.empty[String, String],
        expressions.MapFromEntries(expressions.SortArray(
          expressions.aggregate.CollectList(
            expressions.CreateStruct(Seq(es(0), es(1)))).toAggregateExpression(),
          expressions.Literal(true))))
    }
    reg1("json_arrayagg") { es =>
      expressions.StructsToJson(Map.empty[String, String],
        expressions.SortArray(
          expressions.aggregate.CollectList(es.head).toAggregateExpression(),
          expressions.Literal(true)))
    }
    reg1("truncate") { es =>
      val x = expressions.Cast(es(0), org.apache.spark.sql.types.DoubleType)
      val p = expressions.Pow(expressions.Literal(10.0),
        expressions.Cast(es(1), org.apache.spark.sql.types.DoubleType))
      val scaled = expressions.Multiply(x, p)
      // toward-zero truncation: floor(x*p)/p for x>=0, -floor(-x*p)/p otherwise
      expressions.Divide(
        expressions.If(
          expressions.GreaterThanOrEqual(x, expressions.Literal(0.0)),
          expressions.Cast(expressions.Floor(scaled), org.apache.spark.sql.types.DoubleType),
          expressions.UnaryMinus(expressions.Cast(expressions.Floor(
            expressions.UnaryMinus(scaled)), org.apache.spark.sql.types.DoubleType))),
        p)
    }
    if (allNames.isEmpty) allNames = recorded.toList
  }

  /** Every SQL name registerAll registers, captured on its first full
    * run (the surface is static, so one capture serves all sessions).
    * Drives the module system's UNLOAD path.
    */
  @volatile private var allNames: Seq[String] = Nil

  /** The registrations that deliberately SHADOW a Spark builtin with
    * the Flink signature. Module resolution ORDER decides who wins
    * these names (first used module wins, like the reference's
    * ModuleManager.getFunctionDefinition).
    */
  private[graft] val shadowNames: Seq[String] = Seq("cot", "to_timestamp_ltz")

  /** UNLOAD MODULE graft: drop every graft-registered SQL name and
    * restore the Spark builtin for any name that shadowed one, so the
    * session's function surface is exactly core-module Spark again.
    */
  def unregisterAll(spark: SparkSession): Unit = {
    if (allNames.isEmpty) registerAll(spark) // capture the name list
    val reg = spark.sessionState.functionRegistry
    allNames.foreach { n => dropAndRestoreBuiltin(reg, n) }
  }

  /** LOAD MODULE graft / USE MODULES graft, ...: (re-)register the
    * full graft surface, shadows included — drops the sentinel first
    * so registerAll runs even in a session it already initialized.
    */
  def reloadAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fns_registered"))
    registerAll(spark)
  }

  /** USE MODULES core, graft: graft names stay loaded but core wins
    * the conflicting (shadow) names — restore those builtins only.
    */
  def demoteShadows(spark: SparkSession): Unit =
    shadowNames.foreach(n =>
      dropAndRestoreBuiltin(spark.sessionState.functionRegistry, n))

  private def dropAndRestoreBuiltin(
      reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry,
      name: String): Unit = {
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    reg.dropFunction(ident)
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
    builtin.lookupFunctionBuilder(ident).foreach { b =>
      builtin.lookupFunction(ident).foreach { info =>
        reg.registerFunction(ident, info, b)
      }
    }
  }
}
