package graft.sql

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.{expr, unix_micros, col}
import org.apache.spark.sql.types._

import graft.cep.Nfa
import SqlLexer.{Tok, Ident, Str, Num}

/** SQL:2016 row-pattern recognition — the `MATCH_RECOGNIZE` clause of
  * the reference's SQL dialect (flink-sql-parser parserImpls.ftl
  * `SqlMatchRecognize`; runtime: flink-cep NFA + planner
  * MatchCodeGenerator.scala), parsed from SQL text and executed on
  * the [[graft.cep.Nfa]] core.
  *
  * Supported surface:
  *   PARTITION BY cols / ORDER BY exprs /
  *   MEASURES FIRST|LAST|COUNT|SUM|MIN|MAX|AVG(v.col) | COUNT(v.*) | v.col AS alias /
  *   AFTER MATCH SKIP {PAST LAST ROW | TO NEXT ROW | TO [FIRST|LAST] v} /
  *   PATTERN (concat, alternation `|`, grouping, quantifiers + * ? {m,n} and
  *   reluctant variants) [WITHIN INTERVAL] /
  *   DEFINE v AS <row predicate> (undefback vars match any row).
  *
  * Execution (scale design): DEFINE predicates are evaluated as
  * Catalyst boolean columns BEFORE the shuffle (codegen'd, pushed to
  * the scan side); the only shuffle is the PARTITION BY groupByKey;
  * per-key rows are sorted and run through the NFA with
  * O(match-length) state — the reference's per-key SharedBuffer bound.
  */
object MatchRecognizeSql {

  // pattern AST over variable names (materialized to Nfa.Pat[Row] at run time)
  sealed trait PatName
  final case class NSym(v: String) extends PatName
  final case class NCat(parts: List[PatName]) extends PatName
  final case class NAlt(choices: List[PatName]) extends PatName
  final case class NRep(inner: PatName, min: Int, max: Int, greedy: Boolean) extends PatName

  final case class Measure(alias: String, fn: String, variable: String, column: String)

  final case class MrSpec(
      table: String,
      partitionBy: Seq[String],
      orderBy: Seq[String],
      measures: Seq[Measure],
      skip: Nfa.Skip,
      pattern: PatName,
      withinMicros: Option[Long],
      defines: Map[String, String])

  // ---------- parsing ----------

  /** Parse the clause body between the parens of `MATCH_RECOGNIZE (...)`. */
  def parseSpec(table: String, toks: Vector[Tok]): MrSpec = {
    var i = 0
    def peek: Tok = toks(i)
    def has(s: String): Boolean = i < toks.length && toks(i).is(s)
    def eat(s: String): Unit = {
      require(i < toks.length && (toks(i).is(s) || toks(i).isPunct(s)),
        s"MATCH_RECOGNIZE: expected '$s' at token $i (${if (i < toks.length) toks(i).text else "<eof>"})")
      i += 1
    }
    def identText(): String = { val t = toks(i); require(t.kind == Ident, s"expected identifier, got ${t.text}"); i += 1; t.text }
    /** raw source span of tokens [from, until) re-joined with spaces */
    def spanText(from: Int, until: Int): String = toks.slice(from, until).map(_.text).mkString(" ")
    /** advance until a top-level comma or terminator keyword; returns end index */
    def exprEnd(stops: Set[String]): Int = {
      var depth = 0
      var j = i
      while (j < toks.length) {
        val t = toks(j)
        if (t.isPunct("(")) depth += 1
        else if (t.isPunct(")")) { if (depth == 0) return j; depth -= 1 }
        else if (depth == 0 && (t.isPunct(",") || (t.kind == Ident && stops.exists(t.is)))) return j
        j += 1
      }
      j
    }

    def parseMeasure(): Measure = {
      val fns = Set("FIRST", "LAST", "COUNT", "SUM", "MIN", "MAX", "AVG")
      val niladic = Set("CLASSIFIER", "MATCH_NUMBER")
      val t0 = identText()
      val m =
        if (niladic.contains(t0.toUpperCase) && i < toks.length && peek.isPunct("(")) {
          // CLASSIFIER() / MATCH_NUMBER() (FlinkSqlOperatorTable's
          // niladic row-pattern functions)
          eat("("); eat(")")
          Measure("", t0.toUpperCase, "", "")
        } else if (fns.contains(t0.toUpperCase) && i < toks.length && peek.isPunct("(")) {
          eat("(")
          val v = identText(); eat(".")
          val c = if (peek.isPunct("*")) { i += 1; "*" } else identText()
          eat(")")
          Measure("", t0.toUpperCase, v, c)
        } else {
          eat(".")
          Measure("", "VAR", t0, identText())
        }
      eat("AS")
      m.copy(alias = identText())
    }

    var partitionBy = Seq.empty[String]
    var orderBy = Seq.empty[String]
    var measures = Seq.empty[Measure]
    var skip: Nfa.Skip = Nfa.SkipPastLastRow
    var pattern: PatName = null
    var within: Option[Long] = None
    var defines = Map.empty[String, String]

    val clauseStarts = Set("ORDER", "MEASURES", "ONE", "ALL", "AFTER", "PATTERN", "WITHIN", "DEFINE")

    if (has("PARTITION")) { eat("PARTITION"); eat("BY")
      val cols = Seq.newBuilder[String]
      cols += identText()
      while (i < toks.length && peek.isPunct(",")) { i += 1; cols += identText() }
      partitionBy = cols.result()
    }
    if (has("ORDER")) { eat("ORDER"); eat("BY")
      val es = Seq.newBuilder[String]
      var done = false
      while (!done) {
        val e = exprEnd(clauseStarts)
        es += spanText(i, e); i = e
        if (i < toks.length && peek.isPunct(",")) i += 1 else done = true
      }
      orderBy = es.result()
    }
    if (has("MEASURES")) { eat("MEASURES")
      val ms = Seq.newBuilder[Measure]
      var done = false
      while (!done) {
        ms += parseMeasure()
        if (i < toks.length && peek.isPunct(",")) i += 1 else done = true
      }
      measures = ms.result()
    }
    if (has("ONE")) { eat("ONE"); eat("ROW"); eat("PER"); eat("MATCH") } // the only supported mode
    if (has("AFTER")) { eat("AFTER"); eat("MATCH"); eat("SKIP")
      if (has("PAST")) { eat("PAST"); eat("LAST"); eat("ROW"); skip = Nfa.SkipPastLastRow }
      else { eat("TO")
        if (has("NEXT")) { eat("NEXT"); eat("ROW"); skip = Nfa.SkipToNextRow }
        else if (has("FIRST")) { eat("FIRST"); skip = Nfa.SkipToFirst(identText()) }
        else { if (has("LAST")) eat("LAST"); skip = Nfa.SkipToLast(identText()) }
      }
    }
    require(has("PATTERN"), "MATCH_RECOGNIZE requires a PATTERN clause")
    eat("PATTERN"); eat("(")
    val close = {
      var depth = 1; var j = i
      while (depth > 0) {
        if (toks(j).isPunct("(")) depth += 1
        else if (toks(j).isPunct(")")) depth -= 1
        if (depth > 0) j += 1
      }
      j
    }
    pattern = parsePattern(toks.slice(i, close))
    i = close + 1
    if (has("WITHIN")) { eat("WITHIN"); eat("INTERVAL")
      val lit = peek; require(lit.kind == Str, "WITHIN INTERVAL expects a quoted literal"); i += 1
      val unit = identText()
      val v = lit.text.stripPrefix("'").stripSuffix("'").trim.toLong
      val micros = unit.toUpperCase match {
        case "SECOND" | "SECONDS" => v * 1000000L
        case "MINUTE" | "MINUTES" => v * 60000000L
        case "HOUR" | "HOURS" => v * 3600000000L
        case "DAY" | "DAYS" => v * 86400000000L
        case u => sys.error(s"unsupported WITHIN unit $u")
      }
      within = Some(micros)
    }
    if (has("DEFINE")) { eat("DEFINE")
      var done = false
      while (!done) {
        val v = identText(); eat("AS")
        val e = exprEnd(Set.empty)
        defines += (v -> spanText(i, e)); i = e
        if (i < toks.length && peek.isPunct(",")) i += 1 else done = true
      }
    }

    MrSpec(table, partitionBy, orderBy, measures, skip, pattern, within, defines)
  }

  /** `(A | B C+ D{2,3}? (E F)*)` — '|' has lowest precedence. */
  def parsePattern(toks: Vector[Tok]): PatName = {
    var i = 0
    def parseAlt(): PatName = {
      val first = parseSeq()
      var choices = List(first)
      while (i < toks.length && toks(i).isPunct("|")) { i += 1; choices = choices :+ parseSeq() }
      if (choices.length == 1) first else NAlt(choices)
    }
    def parseSeq(): PatName = {
      val parts = List.newBuilder[PatName]
      while (i < toks.length && !toks(i).isPunct("|") && !toks(i).isPunct(")")) parts += parseFactor()
      val ps = parts.result()
      if (ps.length == 1) ps.head else NCat(ps)
    }
    def parseFactor(): PatName = {
      val prim: PatName =
        if (toks(i).isPunct("(")) {
          val close = SqlLexer.matchParen(toks, i)
          val inner = parsePattern(toks.slice(i + 1, close))
          i = close + 1
          inner
        } else { val t = toks(i); require(t.kind == Ident, s"bad pattern token ${t.text}"); i += 1; NSym(t.text) }
      if (i >= toks.length) prim
      else toks(i) match {
        case t if t.isPunct("+") => i += 1; NRep(prim, 1, Int.MaxValue, greedy = !reluctant())
        case t if t.isPunct("*") => i += 1; NRep(prim, 0, Int.MaxValue, greedy = !reluctant())
        case t if t.isPunct("?") => i += 1; NRep(prim, 0, 1, greedy = !reluctant())
        case t if t.isPunct("{") =>
          i += 1
          val mn = if (toks(i).kind == Num) { val v = toks(i).text.toInt; i += 1; v } else 0
          var mx = mn
          if (toks(i).isPunct(",")) {
            i += 1
            mx = if (toks(i).kind == Num) { val v = toks(i).text.toInt; i += 1; v } else Int.MaxValue
          }
          require(toks(i).isPunct("}"), "expected } in quantifier"); i += 1
          NRep(prim, mn, mx, greedy = !reluctant())
        case _ => prim
      }
    }
    def reluctant(): Boolean =
      if (i < toks.length && toks(i).isPunct("?")) { i += 1; true } else false
    val p = parseAlt()
    require(i == toks.length, s"trailing pattern tokens at $i")
    p
  }

  private def patternVars(p: PatName): List[String] = p match {
    case NSym(v) => List(v)
    case NCat(ps) => ps.flatMap(patternVars).distinct
    case NAlt(ps) => ps.flatMap(patternVars).distinct
    case NRep(inner, _, _, _) => patternVars(inner)
  }

  // ---------- execution ----------

  def execute(spark: SparkSession, spec: MrSpec): DataFrame = {
    val base = spark.table(spec.table)
    val vars = patternVars(spec.pattern)

    // DEFINE predicates become codegen'd boolean columns before the
    // shuffle; an undefined variable matches every row (SQL default)
    var df = base
    vars.zipWithIndex.foreach { case (v, vi) =>
      val cond = spec.defines.getOrElse(v, "true")
      df = df.withColumn(s"__def_$vi", expr(cond))
    }
    spec.orderBy.zipWithIndex.foreach { case (o, oi) =>
      df = df.withColumn(s"__ord_$oi", expr(o))
    }
    if (spec.withinMicros.isDefined)
      df = df.withColumn("__mr_ts", unix_micros(expr(spec.orderBy.head).cast(TimestampType)))

    val schema = df.schema
    val defIdx = vars.indices.map(vi => schema.fieldIndex(s"__def_$vi"))
    val ordIdx = spec.orderBy.indices.map(oi => schema.fieldIndex(s"__ord_$oi"))
    val tsIdx = if (spec.withinMicros.isDefined) schema.fieldIndex("__mr_ts") else -1
    val partIdx = spec.partitionBy.map(schema.fieldIndex)

    val varToDef = vars.zipWithIndex.toMap
    def materialize(p: PatName): Nfa.Pat[Row] = p match {
      case NSym(v) =>
        val di = defIdx(varToDef(v))
        Nfa.Sym[Row](v, r => !r.isNullAt(di) && r.getBoolean(di))
      case NCat(ps) => Nfa.Cat(ps.map(materialize))
      case NAlt(ps) => Nfa.Alt(ps.map(materialize))
      case NRep(inner, mn, mx, g) => Nfa.Rep(materialize(inner), mn, mx, g)
    }
    val pat = materialize(spec.pattern)
    val within = spec.withinMicros.map(w => ((r: Row) => r.getLong(tsIdx), w))
    val skip = spec.skip

    // output schema: PARTITION BY columns ++ measures
    val outFields = spec.partitionBy.map(c => schema(schema.fieldIndex(c))) ++
      spec.measures.map(m => StructField(m.alias, measureType(schema, m), nullable = true))
    val outSchema = StructType(outFields.toArray)
    val measureEvals = spec.measures.map(m => measureEval(schema, m)).toArray

    implicit val rowEnc = Encoders.row(outSchema)
    import spark.implicits._

    val keyOf = (r: Row) => partIdx.map(pi => String.valueOf(r.get(pi))).mkString(" ")
    val nOrd = ordIdx.length

    df.groupByKey(keyOf)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.toIndexedSeq.sortWith { (a, b) =>
          var c = 0; var k = 0
          while (c == 0 && k < nOrd) {
            val x = a.get(ordIdx(k)); val y = b.get(ordIdx(k))
            c = compareAny(x, y); k += 1
          }
          c < 0
        }
        Nfa.matchAllPat(rows, pat, skip, within).iterator.zipWithIndex.map {
          case (m, mi) =>
            val head = rows(m.start)
            // MATCH_NUMBER() is 1-based and sequential per partition
            val vals = partIdx.map(head.get) ++ measureEvals.map(_(m, mi + 1L))
            Row.fromSeq(vals)
        }
      }
  }

  private def compareAny(x: Any, y: Any): Int = (x, y) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (a: Comparable[_], b) => a.asInstanceOf[Comparable[Any]].compareTo(b)
    case _ => 0
  }

  private def colType(schema: StructType, m: Measure): DataType =
    if (m.column == "*") LongType else schema(schema.fieldIndex(m.column)).dataType

  private def measureType(schema: StructType, m: Measure): DataType = m.fn match {
    case "CLASSIFIER" => StringType
    case "MATCH_NUMBER" => LongType
    case "COUNT" => LongType
    case "AVG" => DoubleType
    case "SUM" => colType(schema, m) match {
      case ByteType | ShortType | IntegerType | LongType => LongType
      case _ => DoubleType
    }
    case _ => colType(schema, m)
  }

  /** Compile one measure to a function over a completed match and its
    * 1-based sequence number within the partition.
    */
  private def measureEval(schema: StructType, m: Measure): (Nfa.PatMatch[Row], Long) => Any = {
    val ci = if (m.fn == "CLASSIFIER" || m.fn == "MATCH_NUMBER" || m.column == "*") -1
      else schema.fieldIndex(m.column)
    def vals(pm: Nfa.PatMatch[Row]): List[Any] =
      pm.caps.getOrElse(m.variable, Nil).map(r => if (ci < 0) 1L else r.get(ci))
    m.fn match {
      // ONE ROW PER MATCH: CLASSIFIER() is the variable that mapped
      // the LAST row of the match (SQL:2016 / the reference's
      // MatchCodeGenerator ClassifierValue for final state)
      case "CLASSIFIER" => (pm, _) => Nfa.classifier(pm, pm.end - 1).orNull
      case "MATCH_NUMBER" => (_, no) => no
      case "FIRST" => (pm, _) => vals(pm).headOption.orNull
      // SQL:2016 ONE ROW PER MATCH: a bare `V.col` means the LAST row
      // mapped to V (same as Flink/Oracle), not the first
      case "VAR" | "LAST" => (pm, _) => vals(pm).lastOption.orNull
      case "COUNT" => (pm, _) =>
        if (ci < 0) pm.caps.getOrElse(m.variable, Nil).length.toLong
        else vals(pm).count(_ != null).toLong
      case "SUM" => colType(schema, m) match {
        case ByteType | ShortType | IntegerType | LongType =>
          (pm, _) => { val vs = vals(pm).filter(_ != null); if (vs.isEmpty) null else vs.map(numLong).sum }
        case _ =>
          (pm, _) => { val vs = vals(pm).filter(_ != null); if (vs.isEmpty) null else vs.map(numDouble).sum }
      }
      case "AVG" => (pm, _) => {
        val vs = vals(pm).filter(_ != null)
        if (vs.isEmpty) null else vs.map(numDouble).sum / vs.length
      }
      case "MIN" => (pm, _) => {
        val vs = vals(pm).filter(_ != null)
        if (vs.isEmpty) null else vs.reduceLeft((a, b) => if (compareAny(a, b) <= 0) a else b)
      }
      case "MAX" => (pm, _) => {
        val vs = vals(pm).filter(_ != null)
        if (vs.isEmpty) null else vs.reduceLeft((a, b) => if (compareAny(a, b) >= 0) a else b)
      }
      case other => sys.error(s"unsupported measure function $other")
    }
  }

  private def numLong(a: Any): Long = a match {
    case b: Byte => b.toLong; case s: Short => s.toLong
    case i: Int => i.toLong; case l: Long => l
    case other => sys.error(s"not an integral value: $other")
  }
  private def numDouble(a: Any): Double = a match {
    case b: Byte => b.toDouble; case s: Short => s.toDouble
    case i: Int => i.toDouble; case l: Long => l.toDouble
    case f: Float => f.toDouble; case d: Double => d
    case d: java.math.BigDecimal => d.doubleValue
    case other => sys.error(s"not a numeric value: $other")
  }
}
