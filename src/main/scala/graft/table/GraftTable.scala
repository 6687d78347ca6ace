package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.sql.SqlLexer
import graft.sql.SqlLexer.{Ident, Num, Punct, Str, Tok}

/** Fluent Table API facade (SURVEY §3.2 — the reference's
  * `Table` interface, flink-table-api-java Table.java, with the
  * classic STRING expression DSL its ITCases use:
  * `t.groupBy("b").select("b, a.sum as s")`,
  * `t.filter("a === 1 && b.like('%x%')")`). Each call parses the
  * expression strings with [[TableExpr]] and declares the equivalent
  * DataFrame transformation — the plan stays fully Catalyst-visible,
  * nothing is interpreted per row.
  */
final class GraftTable private[table] (val df: DataFrame) {

  private def t(d: DataFrame) = new GraftTable(d)

  /** `select("a, b.sum as total, c.upperCase()")` */
  def select(fields: String): GraftTable =
    t(df.select(TableExpr.parseList(fields): _*))

  /** `filter("a > 2 && b === 'Hello'")` (old DSL spelling kept) */
  def filter(predicate: String): GraftTable =
    t(df.filter(TableExpr.parse(predicate)))

  def where(predicate: String): GraftTable = filter(predicate)

  /** `as("x, y, z")` — positional rename of every column. */
  def as(names: String): GraftTable = {
    val ns = names.split(",").map(_.trim).filter(_.nonEmpty)
    require(ns.length == df.columns.length,
      s"as() got ${ns.length} names for ${df.columns.length} columns")
    t(df.toDF(ns.toIndexedSeq: _*))
  }

  def groupBy(keys: String): GroupedGraftTable =
    new GroupedGraftTable(df, TableExpr.parseList(keys))

  /** Group windows (Table.window(Tumble/Slide/Session ... as "w") —
    * GroupWindowITCase shapes): the window alias becomes a grouping
    * key; `w.start` / `w.end` surface in the select.
    */
  def window(w: WindowSpec): WindowedGraftTable = new WindowedGraftTable(df, w)

  /** Over windows (Table.window(Over partitionBy ... orderBy ... as
    * "o") — OverWindowITCase shapes): measures spell `a.sum over o`.
    */
  def window(o: OverSpec): OverWindowedGraftTable = new OverWindowedGraftTable(df, o)

  /** `join(t2).where("a === d")` — the reference's unconditioned join
    * is a cross product until the predicate narrows it; Catalyst
    * turns where-over-cross into the equi hash join at plan time.
    */
  def join(other: GraftTable): GraftTable = t(df.crossJoin(other.df))
  def join(other: GraftTable, cond: String): GraftTable =
    t(df.join(other.df, TableExpr.parse(cond)))
  def leftOuterJoin(other: GraftTable, cond: String): GraftTable =
    t(df.join(other.df, TableExpr.parse(cond), "left_outer"))
  def rightOuterJoin(other: GraftTable, cond: String): GraftTable =
    t(df.join(other.df, TableExpr.parse(cond), "right_outer"))
  def fullOuterJoin(other: GraftTable, cond: String): GraftTable =
    t(df.join(other.df, TableExpr.parse(cond), "full_outer"))

  // set operations (Table.union/minus/intersect — ALL variants keep
  // duplicates, the plain forms dedup, like the reference)
  def union(other: GraftTable): GraftTable = t(df.unionByName(other.df).distinct())
  def unionAll(other: GraftTable): GraftTable = t(df.unionByName(other.df))
  def minus(other: GraftTable): GraftTable = t(df.except(other.df))
  def minusAll(other: GraftTable): GraftTable = t(df.exceptAll(other.df))
  def intersect(other: GraftTable): GraftTable = t(df.intersect(other.df))
  def intersectAll(other: GraftTable): GraftTable = t(df.intersectAll(other.df))
  def distinct(): GraftTable = t(df.distinct())

  /** `orderBy("a.asc, b.desc")` then `offset(n)` / `fetch(n)`. */
  def orderBy(fields: String): GraftTable =
    t(df.orderBy(TableExpr.parseList(fields): _*))
  def offset(n: Int): GraftTable = t(df.offset(n))
  def fetch(n: Int): GraftTable = t(df.limit(n))
  def limit(n: Int): GraftTable = fetch(n)

  /** `addColumns("a + 1 as a1")` / `renameColumns("a as a1")` /
    * `dropColumns("a, b")` (Table.addColumns family).
    */
  def addColumns(fields: String): GraftTable =
    t(df.select((df.columns.map(F.col).toSeq ++ TableExpr.parseList(fields)): _*))
  def renameColumns(renames: String): GraftTable = {
    val pairs = TableExpr.parseRenames(renames)
    t(pairs.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) })
  }
  def dropColumns(fields: String): GraftTable =
    t(df.drop(fields.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq: _*))

  def toDF: DataFrame = df
}

/** `groupBy(...)` result: only `select` makes sense next, like the
  * reference's GroupedTable. `windowAlias` is set by the group-window
  * path: items referencing the alias (`w.start`, `w.end`) are
  * key-derived and project AFTER the aggregate (they cannot resolve
  * inside agg(), where only the input relation's columns exist).
  */
final class GroupedGraftTable private[table] (df: DataFrame, keys: Seq[Column],
    windowAlias: Option[String] = None, windowKeyIdx: Int = -1) {
  def select(fields: String): GraftTable = {
    val raw = TableExpr.splitRaw(fields)
    def isWinRef(s: String): Boolean = windowAlias.exists { a =>
      val t = s.trim
      t == a || t.startsWith(a + ".") || t.startsWith(a + " ")
    }
    val aggRaw = raw.filterNot(isWinRef)
    require(aggRaw.nonEmpty, "groupBy().select() needs at least one aggregate")
    val aggItems = aggRaw.map(TableExpr.parse)
    // grouping expressions may appear plainly in the output list;
    // everything else must be an aggregate — Catalyst validates.
    // Spark prepends the grouping keys to agg() output; the
    // reference's GroupedTable.select emits EXACTLY the select list,
    // so project the key prefix back off (positionally — an item may
    // share a key's name) and re-weave the window refs in order.
    val out = df.groupBy(keys: _*).agg(aggItems.head, aggItems.tail: _*)
    val aggNames = out.columns.takeRight(aggItems.length).toSeq
    val tagged = out.toDF(out.columns.zipWithIndex.map { case (_, i) => s"__c$i" }.toIndexedSeq: _*)
    val keyIdxOfAlias = windowAlias.map { a =>
      require(windowKeyIdx >= 0, s"window alias '$a' not among grouping keys")
      windowKeyIdx
    }
    var ai = 0
    val finalCols = raw.map { r =>
      if (isWinRef(r)) {
        // re-parse with the alias pointed at the tagged key column;
        // substitute at TOKEN level (only Ident tokens equal to the
        // alias, not preceded by '.') so an alias word inside a string
        // literal or a dotted field path is left alone
        val a = windowAlias.get
        val toks = graft.sql.SqlLexer.tokenize(r)
        val sb = new StringBuilder
        var pos = 0
        toks.zipWithIndex.foreach { case (t, ti) =>
          // `w.start as w`: the trailing w is an output ALIAS, not a
          // reference — leave it (the old regex rewrote it too)
          val afterDot = ti > 0 && toks(ti - 1).isPunct(".")
          val afterAs = ti > 0 && toks(ti - 1).is("as")
          if (t.kind == graft.sql.SqlLexer.Ident && t.text == a && !afterDot && !afterAs) {
            sb.append(r.substring(pos, t.start)).append(s"__c${keyIdxOfAlias.get}")
            pos = t.end
          }
        }
        sb.append(r.substring(pos))
        TableExpr.parse(sb.toString)
      } else {
        val c = F.col(s"__c${keys.length + ai}").as(aggNames(ai))
        ai += 1
        c
      }
    }
    new GraftTable(tagged.select(finalCols: _*))
  }
}

object GraftTable {
  /** TableEnvironment.from: a registered (catalog or temp-view) table. */
  def from(spark: SparkSession, table: String): GraftTable =
    new GraftTable(spark.table(table))
  def of(df: DataFrame): GraftTable = new GraftTable(df)
}

/** A resolved group window: kind + durations + time column + alias.
  * Durations use the classic string-DSL spellings ("10.minutes",
  * "1.hour") or plain Spark interval strings ("10 minutes").
  */
final case class WindowSpec(kind: String, size: String, slide: Option[String],
    on: String, alias: String)

/** `Tumble over "1.hour" on "ts" as "w"` (flink-table-api Tumble). */
object Tumble {
  def over(size: String): TumbleBuilder = new TumbleBuilder(size)
}
final class TumbleBuilder private[table] (size: String) {
  def on(field: String): TumbleBuilder2 = new TumbleBuilder2(size, field)
}
final class TumbleBuilder2 private[table] (size: String, field: String) {
  def as(alias: String): WindowSpec = WindowSpec("tumble", size, None, field, alias)
}

/** `Slide over "1.hour" every "15.minutes" on "ts" as "w"` (Slide). */
object Slide {
  def over(size: String): SlideBuilder = new SlideBuilder(size)
}
final class SlideBuilder private[table] (size: String) {
  def every(slide: String): SlideBuilder2 = new SlideBuilder2(size, slide)
}
final class SlideBuilder2 private[table] (size: String, slide: String) {
  def on(field: String): SlideBuilder3 = new SlideBuilder3(size, slide, field)
}
final class SlideBuilder3 private[table] (size: String, slide: String, field: String) {
  def as(alias: String): WindowSpec = WindowSpec("slide", size, Some(slide), field, alias)
}

/** `Session withGap "10.minutes" on "ts" as "w"` (Session). */
object Session {
  def withGap(gap: String): SessionBuilder = new SessionBuilder(gap)
}
final class SessionBuilder private[table] (gap: String) {
  def on(field: String): SessionBuilder2 = new SessionBuilder2(gap, field)
}
final class SessionBuilder2 private[table] (gap: String, field: String) {
  def as(alias: String): WindowSpec = WindowSpec("session", gap, None, field, alias)
}

/** `Over partitionBy "k" orderBy "ts" [preceding "10.rows" |
  * "UNBOUNDED_ROW" | "UNBOUNDED_RANGE"] as "o"` (flink-table-api
  * Over). Default frame = the order-by default (range unbounded
  * preceding → current row), like the reference.
  */
final case class OverSpec(partitionKeys: Seq[String], orderBy: String,
    preceding: Option[String], alias: String)
object Over {
  def partitionBy(keys: String): OverBuilder =
    new OverBuilder(keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
  def orderBy(fields: String): OverBuilder2 = new OverBuilder2(Nil, fields)
}
final class OverBuilder private[table] (keys: Seq[String]) {
  def orderBy(fields: String): OverBuilder2 = new OverBuilder2(keys, fields)
}
final class OverBuilder2 private[table] (keys: Seq[String], ord: String,
    prec: Option[String] = None) {
  def preceding(p: String): OverBuilder2 = new OverBuilder2(keys, ord, Some(p))
  def as(alias: String): OverSpec = OverSpec(keys, ord, prec, alias)
}

/** Over-window select: measures carry the `<agg> over <alias>` infix
  * of the classic string DSL; plain items pass through.
  */
final class OverWindowedGraftTable private[table] (df: DataFrame, o: OverSpec) {
  def select(fields: String): GraftTable = {
    import org.apache.spark.sql.expressions.{Window => SWin}
    val base = (if (o.partitionKeys.nonEmpty)
        SWin.partitionBy(o.partitionKeys.map(F.col): _*)
      else SWin.partitionBy())
      .orderBy(TableExpr.parseList(o.orderBy): _*)
    val win = o.preceding.map(_.trim) match {
      case None => base // order-by default frame
      case Some(p) if p.equalsIgnoreCase("UNBOUNDED_RANGE") =>
        base.rangeBetween(SWin.unboundedPreceding, SWin.currentRow)
      case Some(p) if p.equalsIgnoreCase("UNBOUNDED_ROW") =>
        base.rowsBetween(SWin.unboundedPreceding, SWin.currentRow)
      case Some(p) if p.matches("(?i)\\d+\\.rows") =>
        base.rowsBetween(-p.takeWhile(_.isDigit).toLong, 0)
      case Some(other) => sys.error(s"unsupported OVER preceding spelling '$other'")
    }
    val overRe = "(?is)^(.*?)\\s+over\\s+(\\w+)(\\s+as\\s+(\\w+))?\\s*$".r
    val cols = TableExpr.splitRaw(fields).map {
      case overRe(lhs, alias, _, out) =>
        require(alias == o.alias,
          s"unknown over-window alias '$alias' (declared '${o.alias}')")
        val c = TableExpr.parse(lhs).over(win)
        if (out != null) c.as(out) else c
      case plain => TableExpr.parse(plain)
    }
    new GraftTable(df.select(cols: _*))
  }
}

/** `window(...)` result: only groupBy makes sense next (the window
  * alias must be among the keys, like the reference's WindowedTable).
  */
final class WindowedGraftTable private[table] (df: DataFrame, w: WindowSpec) {
  /** "10.minutes" / "1.hour" → "10 minutes" / "1 hour" */
  private def dur(s: String): String = {
    val parts = s.trim.split("\\.", 2)
    if (parts.length == 2 && parts(0).forall(_.isDigit)) s"${parts(0)} ${parts(1)}"
    else s
  }

  def groupBy(keys: String): GroupedGraftTable = {
    val names = keys.split(",").map(_.trim).filter(_.nonEmpty)
    require(names.contains(w.alias),
      s"window alias '${w.alias}' must appear in groupBy('$keys')")
    val winCol = w.kind match {
      case "tumble" => F.window(F.col(w.on), dur(w.size))
      case "slide" => F.window(F.col(w.on), dur(w.size), dur(w.slide.get))
      case "session" => F.session_window(F.col(w.on), dur(w.size))
    }
    val cols = names.toSeq.map { n =>
      if (n == w.alias) winCol.as(w.alias) else TableExpr.parse(n)
    }
    new GroupedGraftTable(df, cols, windowAlias = Some(w.alias),
      windowKeyIdx = names.indexOf(w.alias))
  }
}

/** The classic string expression DSL (flink-table-api ExpressionParser
  * semantics): suffix calls (`a.sum`, `b.upperCase()`, `c.cast(INT)`),
  * `===`/`!==` equality spellings, `&&`/`||` logic, infix `as`
  * aliases. Parsed once per call into Spark Columns — codegen'd like
  * any DataFrame expression.
  */
object TableExpr {

  /** Merge adjacent single-char puncts the SQL lexer splits
    * (`===`, `==`, `!==`, `&&`) using source offsets — only truly
    * adjacent characters fuse.
    */
  private def normalize(toks: Vector[Tok]): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val fusable = Set("===", "==", "!==", "&&", "||", "!=", "<=", ">=", "<>")
    while (i < toks.length) {
      var cur = toks(i)
      var j = i + 1
      while (j < toks.length && toks(j).kind == Punct && cur.kind == Punct &&
          toks(j).start == cur.end && fusable.contains(cur.text + toks(j).text)) {
        cur = Tok(Punct, cur.text + toks(j).text, cur.start, toks(j).end)
        j += 1
      }
      out += cur
      i = j
    }
    out.result()
  }

  /** Parse a comma-separated expression list (select/orderBy/keys). */
  def parseList(s: String): Seq[Column] = {
    val toks = normalize(SqlLexer.tokenize(s))
    val items = splitTop(toks)
    items.map(ts => new P(ts).parseItem())
  }

  /** Parse one expression (filter/join predicates). */
  def parse(s: String): Column = {
    val toks = normalize(SqlLexer.tokenize(s))
    new P(toks).parseItem()
  }

  /** Split a field list on TOP-LEVEL commas, returning raw source
    * spans (argument lists keep their commas).
    */
  def splitRaw(s: String): Seq[String] = {
    val toks = normalize(SqlLexer.tokenize(s))
    splitTop(toks).filter(_.nonEmpty)
      .map(ts => s.substring(ts.head.start, ts.last.end))
  }

  /** `"a as b, c as d"` → (from, to) pairs for renameColumns. */
  def parseRenames(s: String): Seq[(String, String)] =
    splitTop(normalize(SqlLexer.tokenize(s))).map { ts =>
      require(ts.length == 3 && ts(1).is("as"),
        s"renameColumns expects 'old as new', got '${ts.map(_.text).mkString(" ")}'")
      (ts(0).text, ts(2).text)
    }

  private def splitTop(toks: Vector[Tok]): Seq[Vector[Tok]] = {
    val out = Seq.newBuilder[Vector[Tok]]
    var depth = 0
    var start = 0
    toks.zipWithIndex.foreach { case (t, i) =>
      if (t.isPunct("(")) depth += 1
      else if (t.isPunct(")")) depth -= 1
      else if (t.isPunct(",") && depth == 0) { out += toks.slice(start, i); start = i + 1 }
    }
    if (start < toks.length) out += toks.slice(start, toks.length)
    out.result()
  }

  // recursive-descent parser over one item
  private final class P(toks: Vector[Tok]) {
    private var i = 0
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    private def eat(): Tok = { val t = toks(i); i += 1; t }
    private def isP(s: String) = peek.exists(_.isPunct(s))

    def parseItem(): Column = {
      var c = parseOr()
      // infix alias: `a.sum as total`
      if (peek.exists(_.is("as"))) {
        eat()
        val n = eat()
        require(n.kind == Ident, s"alias must be an identifier, got '${n.text}'")
        c = c.as(n.text)
      }
      require(i == toks.length,
        s"trailing tokens in table expression: '${toks.drop(i).map(_.text).mkString(" ")}'")
      c
    }

    private def parseOr(): Column = {
      var c = parseAnd()
      while (isP("||")) { eat(); c = c || parseAnd() }
      c
    }
    private def parseAnd(): Column = {
      var c = parseNot()
      while (isP("&&")) { eat(); c = c && parseNot() }
      c
    }
    private def parseNot(): Column =
      if (isP("!")) { eat(); !parseNot() } else parseCmp()

    private def parseCmp(): Column = {
      val l = parseAdd()
      peek match {
        case Some(t) if t.kind == Punct =>
          t.text match {
            case "===" | "==" | "=" => eat(); l === parseAdd()
            case "!==" | "!=" | "<>" => eat(); l =!= parseAdd()
            case "<=" => eat(); l <= parseAdd()
            case ">=" => eat(); l >= parseAdd()
            case "<" => eat(); l < parseAdd()
            case ">" => eat(); l > parseAdd()
            case _ => l
          }
        case _ => l
      }
    }
    private def parseAdd(): Column = {
      var c = parseMul()
      while (isP("+") || isP("-")) {
        val op = eat().text
        val r = parseMul()
        c = if (op == "+") c + r else c - r
      }
      c
    }
    private def parseMul(): Column = {
      var c = parseUnary()
      while (isP("*") || isP("/") || isP("%")) {
        val op = eat().text
        val r = parseUnary()
        c = op match { case "*" => c * r; case "/" => c / r; case _ => c % r }
      }
      c
    }
    private def parseUnary(): Column =
      if (isP("-")) { eat(); F.negate(parseSuffix()) } else parseSuffix()

    private def parseSuffix(): Column = {
      var c = parsePrimary()
      while (isP(".")) {
        eat()
        val fn = eat()
        require(fn.kind == Ident, s"expected suffix function after '.', got '${fn.text}'")
        // each argument keeps its raw source text too — .like() wants
        // the pattern string and .cast() a type NAME, not a column
        val args: Seq[(Column, String)] =
          if (isP("(")) {
            eat()
            val as = Seq.newBuilder[(Column, String)]
            def one(): Unit = {
              val s0 = i
              val col = parseOr()
              as += ((col, toks.slice(s0, i).map(_.text).mkString(" ")))
            }
            if (!isP(")")) {
              one()
              while (isP(",")) { eat(); one() }
            }
            require(isP(")"), s"unclosed argument list of .${fn.text}")
            eat()
            as.result()
          } else Nil
        c = suffix(c, fn.text, args)
      }
      c
    }

    private def unquote(s: String): String =
      s.trim.stripPrefix("'").stripSuffix("'").replace("''", "'")

    /** The suffix-call surface the reference ITCases use. */
    private def suffix(c: Column, fn: String, args: Seq[(Column, String)]): Column =
      fn.toLowerCase(java.util.Locale.ROOT) match {
        case "sum" => F.sum(c)
        case "sum0" => F.coalesce(F.sum(c), F.lit(0)) // SUM0: empty group = 0
        case "min" => F.min(c)
        case "max" => F.max(c)
        case "avg" => F.avg(c)
        case "count" => F.count(c)
        case "asc" => c.asc
        case "desc" => c.desc
        case "uppercase" => F.upper(c)
        case "lowercase" => F.lower(c)
        case "trim" => F.trim(c)
        case "abs" => F.abs(c)
        case "floor" => F.floor(c)
        case "ceil" => F.ceil(c)
        case "charlength" => F.length(c)
        case "round" =>
          require(args.length == 1, ".round takes the scale")
          F.round(c, unquote(args.head._2).toInt)
        case "like" =>
          require(args.length == 1, ".like takes one pattern")
          c.like(unquote(args.head._2))
        case "in" =>
          require(args.nonEmpty, ".in takes at least one value")
          val vals: Seq[Any] = args.map(_._2.trim).map { r =>
            if (r.startsWith("'")) unquote(r)
            else if (r.contains(".")) r.toDouble
            else if (r.equalsIgnoreCase("true") || r.equalsIgnoreCase("false")) r.toBoolean
            else r.toLong
          }
          c.isin(vals: _*)
        case "isnull" => c.isNull
        case "isnotnull" => c.isNotNull
        // group-window alias fields: w.start / w.end (WindowProperties)
        case "start" => c.getField("start")
        case "end" => c.getField("end")
        case "cast" =>
          require(args.length == 1, ".cast takes a type name")
          val ty = unquote(args.head._2).toLowerCase(java.util.Locale.ROOT) match {
            case "int" | "integer" => "int"
            case "long" | "bigint" => "bigint"
            case "double" => "double"
            case "float" => "float"
            case "string" | "varchar" => "string"
            case "boolean" => "boolean"
            case other => other // let Catalyst validate the rest
          }
          c.cast(ty)
        case other => sys.error(s"unsupported table-expression suffix .$other")
      }

    private def parsePrimary(): Column = {
      val t = eat()
      t.kind match {
        case Num => F.lit(if (t.text.contains(".")) t.text.toDouble else t.text.toLong)
        case Str => F.lit(t.text.stripPrefix("'").stripSuffix("'").replace("''", "'"))
        case Ident if t.is("true") => F.lit(true)
        case Ident if t.is("false") => F.lit(false)
        case Ident if t.is("null") => F.lit(null)
        case Ident => F.col(t.text)
        case Punct if t.text == "(" =>
          val c = parseOr()
          require(isP(")"), "unclosed parenthesis")
          eat()
          c
        case _ => sys.error(s"unexpected token '${t.text}' in table expression")
      }
    }
  }
}
