package graft.sql

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

import graft.catalog.GraftCatalog
import graft.changelog.{Changelog, ChangelogInference => CI}
import SqlLexer.{Tok, tokenize, Ident}

/** Changelog-mode inference from SQL TEXT — the front-door slice of
  * FlinkChangelogModeInferenceProgram.scala: a user writing plain SQL
  * over a DDL-declared upsert table gets the normalize / retract
  * adapters inserted automatically, without any operator-DSL calls.
  *
  * Two paths, both adapter-inserting:
  *  - the calc→agg slice (`SELECT g, count(*), sum(x) FROM upsert_t
  *    [WHERE p] GROUP BY g`) builds a CSource→CCalc→CAgg→CSink tree
  *    and lets [[CI.plan]] insert retract-derivation + retract-aware
  *    aggregation (GroupAggFunction with the count-sign algebra);
  *  - every other shape (joins, projections, nested queries)
  *    substitutes a ChangelogNormalize view for the table reference —
  *    the current-state materialization the reference plans in front
  *    of arbitrary consumers of an upsert source — and re-enters the
  *    front door.
  */
object UpsertSqlInference {

  private val viewCounter = new AtomicInteger(0)

  private def clean(name: String): String =
    name.stripPrefix("`").stripSuffix("`").stripPrefix("\"").stripSuffix("\"")

  private final case class AggItem(kind: String, arg: String, alias: String)

  /** A changelog-producing table declaration: an upsert table
    * (versions to derive retractions from) or a CDC-format table
    * (rowkinds already decoded by debezium-json/canal-json).
    */
  private final case class SrcSpec(spec: GraftCatalog.UpsertSpec, cdc: Boolean)
  private def specOf(name: String): Option[SrcSpec] =
    GraftCatalog.upsertOf(name).map(SrcSpec(_, cdc = false))
      .orElse(GraftCatalog.cdcOf(name).map(SrcSpec(_, cdc = true)))

  /** Returns Some(result) when the text references a declared upsert
    * table anywhere (adapters inserted), None when it doesn't and the
    * normal front door should proceed.
    */
  def infer(spark: SparkSession, text: String): Option[DataFrame] = {
    val toks = tokenize(text)
    if (toks.isEmpty) return None
    // TABLE-REF occurrences of a declared upsert table: an ident
    // directly after FROM or JOIN — a JOIN side, CTE body, subquery
    // or UNION branch all count (round-3 review caught the
    // single-FROM version silently serving raw history to those).
    // Column qualifiers are never rewritten: the substitution below
    // always leaves an alias in place for them to bind against.
    def isRef(i: Int): Boolean = {
      val t = toks(i)
      t.kind == Ident && specOf(t.text).isDefined &&
        i > 0 && (toks(i - 1).is("FROM") || toks(i - 1).is("JOIN"))
    }
    val refs = toks.indices.filter(isRef)
    // any OTHER occurrence in FROM-clause position (e.g. a comma-join
    // `FROM a, upsert_t`) would silently read raw version history —
    // reject loudly instead. The guard is clause-scoped so a COLUMN
    // that merely shares the table's name (select list, WHERE, ON)
    // never trips it.
    var inFrom = false
    val unhandled = toks.indices.filter { i =>
      val t = toks(i)
      if (t.is("FROM") || t.is("JOIN")) inFrom = true
      else if (Seq("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "ON",
          "SELECT", "UNION", "EXCEPT", "INTERSECT").exists(t.is)) inFrom = false
      inFrom && t.kind == Ident && specOf(t.text).isDefined &&
        !refs.contains(i) &&
        !(i > 0 && (toks(i - 1).isPunct(".") || toks(i - 1).is("AS"))) &&
        !(i + 1 < toks.length &&
          (toks(i + 1).isPunct(".") || toks(i + 1).isPunct("(")))
    }
    require(unhandled.isEmpty,
      s"upsert table '${toks(unhandled.headOption.getOrElse(0)).text}' referenced " +
        "outside FROM/JOIN position (e.g. a comma join) — use explicit JOIN syntax " +
        "so changelog normalization can be planned")
    if (refs.isEmpty) return None

    // fast path: `SELECT ... FROM upsert_t [WHERE p] GROUP BY g` with
    // sum/count items — plan retract adapters through the inference
    // engine; anything it cannot prove safe falls to the general path
    if (toks.head.is("SELECT") && refs.length == 1) {
      val fromIdx = refs.head - 1
      if (fromIdx > 0 && toks(fromIdx).is("FROM")) {
        val tableTok = toks(refs.head)
        val ss = specOf(tableTok.text).get
        // a CDC view is already a retract changelog; an upsert table
        // declares versions the planner derives retractions from
        val src =
          if (ss.cdc) CI.CSource(spark.table(clean(tableTok.text)), CI.Retract)
          else CI.CSource(spark.table(clean(tableTok.text)), CI.Upsert,
            keys = ss.spec.keys, orderCols = ss.spec.versionCols.map(col))
        parseAggSlice(text, toks, fromIdx) match {
          case Some((whereText, groupCols, items)) =>
            val valueCols = items.collect {
              case AggItem(k, a, _) if k != "group" && k != "count" => a
            }.distinct
            val avgCols = items.collect {
              case AggItem("avg", a, _) => a
            }.distinct
            val minMax = items.exists(i => i.kind == "min" || i.kind == "max")
            // MIN/MAX need the value-multiset state — the engine's
            // minmax node covers one value column; mixed-column
            // min/max fall to the normalize path below
            if (!minMax || valueCols.length == 1) try {
              val calc: DataFrame => DataFrame =
                d => whereText.map(w => d.filter(expr(w))).getOrElse(d)
              val calced = CI.CCalc(src, calc)
              val node =
                if (minMax) CI.CAggMinMax(calced, groupCols, valueCols.head,
                  withNonNullCount = avgCols.nonEmpty)
                else CI.CAgg(calced, groupCols, valueCols, avgCols)
              val planned = CI.plan(CI.CSink(node, CI.InsertOnly))
              val out: Seq[Column] = items.map {
                case AggItem("group", g, alias) => col(g).as(alias)
                case AggItem("count", _, alias) => col("cnt").as(alias)
                case AggItem("sum", a, alias)   => col(s"sum_$a").as(alias)
                // SQL AVG = sum / count(non-null); all-null (or empty)
                // live sets yield NULL, never a divide-by-zero
                case AggItem("avg", a, alias)   =>
                  expr(s"CASE WHEN nncnt_$a > 0 THEN sum_$a / nncnt_$a END").as(alias)
                case AggItem("min", a, alias)   => col(s"min_$a").as(alias)
                case AggItem("max", a, alias)   => col(s"max_$a").as(alias)
              }
              return Some(planned.df.select(out: _*))
            } catch {
              // e.g. a WHERE fragment Dataset.filter can't resolve —
              // the normalize-view path below handles it correctly
              case scala.util.control.NonFatal(_) =>
            }
          case None =>
        }
      }
    }

    // general path: substitute a ChangelogNormalize view for every
    // table ref and re-enter the front door (the substituted names
    // are not upsert tables, so this cannot recurse back here).
    // A ref with no alias gets `view AS <original-name>`, so
    // table-name-qualified columns (`upsert_t.c`) keep binding.
    val keywords = Set("WHERE", "GROUP", "ORDER", "ON", "JOIN", "LEFT",
      "RIGHT", "INNER", "FULL", "CROSS", "UNION", "EXCEPT", "INTERSECT",
      "LIMIT", "HAVING", "FOR", "MATCH_RECOGNIZE", "BY", "AND", "OR")
    val views = refs.map(toks(_).text).distinct.map { name =>
      val ss = specOf(name).get
      val view = s"__graft_upsert_norm_${viewCounter.incrementAndGet()}"
      val normalized =
        if (ss.cdc) {
          require(ss.spec.keys.nonEmpty && ss.spec.versionCols.nonEmpty,
            s"CDC table '$name' needs PRIMARY KEY and 'version-by' to be " +
              "queried in a non-aggregate shape (normalization order)")
          CI.traceLine(s"Source '$name': CDC retract changelog, " +
            s"changelogMode=${CI.kinds(CI.Retract)}, key=[${ss.spec.keys.mkString(", ")}]")
          CI.traceLine(s"ChangelogNormalize inserted: ${CI.kinds(CI.Retract)} -> " +
            s"${CI.kinds(CI.InsertOnly)} (current state per key)")
          Changelog.normalize(spark.table(clean(name)),
            ss.spec.keys, ss.spec.versionCols.map(col))
        } else
          CI.normalizeToSink(CI.CSource(spark.table(clean(name)), CI.Upsert,
            keys = ss.spec.keys, orderCols = ss.spec.versionCols.map(col)))
      normalized.createOrReplaceTempView(view)
      name -> view
    }.toMap
    val sb = new java.lang.StringBuilder
    var pos = 0
    refs.foreach { i =>
      val name = toks(i).text
      // `t FOR SYSTEM_TIME AS OF ... [AS a]` puts the alias AFTER the
      // clause — injecting one here would double-alias the relation
      val hasAlias = i + 1 < toks.length && (toks(i + 1).is("AS") ||
        toks(i + 1).is("FOR") ||
        (toks(i + 1).kind == Ident && !keywords.exists(toks(i + 1).is)))
      val replacement =
        if (hasAlias) views(name) else s"${views(name)} AS $name"
      sb.append(text, pos, toks(i).start).append(replacement)
      pos = toks(i).end
    }
    sb.append(text, pos, text.length)
    Some(GraftSql.sql(spark, sb.toString))
  }

  /** Parse `SELECT items FROM t [WHERE p] GROUP BY g[, ...]` where
    * every item is a group column, `count(*) AS a`, or
    * `sum|avg|min|max(col) AS a`. None = shape outside the slice.
    */
  private def parseAggSlice(text: String, toks: Vector[Tok], fromIdx: Int)
      : Option[(Option[String], Seq[String], Seq[AggItem])] = {
    // the table ref must be followed directly by WHERE / GROUP / end —
    // a table alias would leave the calc lambda's filter text with a
    // qualifier Dataset.filter cannot resolve
    if (fromIdx + 2 < toks.length &&
        !toks(fromIdx + 2).is("WHERE") && !toks(fromIdx + 2).is("GROUP")) return None
    // depth-0 clause positions after the table ref
    var whereIdx = -1
    var groupIdx = -1
    var depth = 0
    var i = fromIdx + 2
    while (i < toks.length) {
      val t = toks(i)
      if (t.isPunct("(")) depth += 1
      else if (t.isPunct(")")) depth -= 1
      else if (depth == 0) {
        if (t.is("WHERE")) whereIdx = i
        else if (t.is("GROUP")) groupIdx = i
        // anything beyond the slice (joins, set ops, HAVING, ORDER...)
        else if (t.isPunct(",") && groupIdx < 0) return None
        else if (Seq("JOIN", "HAVING", "ORDER", "LIMIT", "UNION",
            "EXCEPT", "INTERSECT", "WINDOW").exists(t.is)) return None
      }
      // qualified columns / subqueries inside WHERE: outside the slice
      if (whereIdx >= 0 && groupIdx < 0 && i > whereIdx &&
          (t.isPunct(".") || t.is("SELECT"))) return None
      i += 1
    }
    if (groupIdx < 0) return None
    val whereText =
      if (whereIdx >= 0)
        Some(text.substring(toks(whereIdx).end, toks(groupIdx).start).trim)
      else None
    // GROUP BY idents
    val groupCols = Seq.newBuilder[String]
    var j = groupIdx + 2 // skip GROUP BY
    var ok = true
    while (j < toks.length && ok) {
      if (toks(j).kind != Ident) return None
      groupCols += toks(j).text
      j += 1
      if (j < toks.length) {
        if (toks(j).isPunct(",")) j += 1 else ok = false
      }
    }
    if (ok && j < toks.length) return None // trailing tokens after GROUP BY
    val groups = groupCols.result()

    // SELECT list items (tokens 1 .. fromIdx), split on depth-0 commas
    val items = Seq.newBuilder[AggItem]
    var itemStart = 1
    var d2 = 0
    var k = 1
    while (k <= fromIdx) {
      val atEnd = k == fromIdx
      if (!atEnd && toks(k).isPunct("(")) d2 += 1
      else if (!atEnd && toks(k).isPunct(")")) d2 -= 1
      if (atEnd || (d2 == 0 && toks(k).isPunct(","))) {
        val span = toks.slice(itemStart, k)
        parseItem(span, groups) match {
          case Some(it) => items += it
          case None => return None
        }
        itemStart = k + 1
      }
      k += 1
    }
    Some((whereText, groups, items.result()))
  }

  private def parseItem(span: Vector[Tok], groups: Seq[String]): Option[AggItem] =
    span.toList match {
      case g :: Nil if g.kind == Ident && groups.exists(g.is) =>
        Some(AggItem("group", groups.find(g.is).get, g.text))
      case g :: a :: al :: Nil if g.kind == Ident && groups.exists(g.is) &&
          a.is("AS") && al.kind == Ident =>
        Some(AggItem("group", groups.find(g.is).get, al.text))
      case f :: o :: s :: c :: a :: al :: Nil if f.is("COUNT") &&
          o.isPunct("(") && s.isPunct("*") && c.isPunct(")") &&
          a.is("AS") && al.kind == Ident =>
        Some(AggItem("count", "*", al.text))
      case f :: o :: arg :: c :: a :: al :: Nil
          if Seq("SUM", "AVG", "MIN", "MAX").exists(f.is) &&
            o.isPunct("(") && arg.kind == Ident && c.isPunct(")") &&
            a.is("AS") && al.kind == Ident =>
        Some(AggItem(f.text.toLowerCase, arg.text, al.text))
      case _ => None
    }
}
