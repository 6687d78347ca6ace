package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Run PUBLISHED TPC-DS query texts — the public benchmark spec files
  * under resources/tpcds, the same instantiations the reference's e2e
  * gate executes (flink-end-to-end-tests/flink-tpcds-test/.../
  * TpcdsTestProgram.java:76-85) — near-verbatim on BOTH engines over
  * the generated star: Spark runs the text through the SQL front door
  * against the registered views, and the DuckDB oracle runs the SAME
  * text composed onto the star's file-reading CTE prefix. The only
  * transformations are the mechanical substitution table below,
  * applied uniformly to every query (never per-query structural
  * edits); the per-query classification lives in COVERAGE.md.
  *
  *  - money columns carry integer CENTS here and are suffixed `_c` —
  *    a pure global rename. Dollar-valued literals in published
  *    predicates then select against cents values, so selectivity
  *    shifts and a few queries return empty at these domains;
  *    COVERAGE.md flags each (they still run and hash-match — the
  *    adapted `q_tpcdsgen_*` twins keep the non-degenerate gate).
  *  - `cs_bill_customer_sk` → `cs_customer_sk` (key-name alias).
  *  - `customer` → `customer_dim` on the SPARK side only (the TPC-H
  *    table owns the bare name in shared sessions; the DuckDB prefix
  *    defines `customer` directly).
  *  - backtick-quoted identifiers (the Flink/Spark dialect the files
  *    target) → double-quoted for DuckDB.
  *  - `+ N days` (template interval shorthand) → `+ INTERVAL N DAYS`,
  *    which parses in both engines.
  *  - result-type canonicalization: integer SUMs surface as floats on
  *    the DuckDB side of the driver's pandas compare (HUGEINT) but as
  *    longs from Spark, so [[castSumColumns]] casts exactly those
  *    output columns to double — detected from the ANALYZED PLAN, not
  *    curated per query. The reference's own gate normalizes result
  *    text the same way before diffing (TpcdsResultComparator).
  */
object TpcdsPublished {

  /** Published money columns (dollars in the spec) → the generator's
    * integer-cents columns. Word-bounded pure renames. */
  private val MONEY: Seq[String] = Seq(
    "ss_ext_sales_price", "ss_list_price", "ss_sales_price",
    "ss_wholesale_cost", "ss_coupon_amt", "ss_net_paid", "ss_net_profit",
    "ss_ext_list_price", "ss_ext_tax", "ss_ext_discount_amt",
    "ss_ext_wholesale_cost",
    "sr_return_amt", "sr_net_loss",
    "cs_sales_price", "cs_ext_discount_amt", "cs_wholesale_cost",
    "cs_ext_sales_price", "cs_net_profit", "cs_list_price",
    "cs_ext_list_price", "cs_ext_wholesale_cost", "cs_coupon_amt",
    "cs_net_paid", "cs_net_paid_inc_tax", "cs_ext_ship_cost", "cs_ext_tax",
    "cr_net_loss", "cr_refunded_cash", "cr_return_amt_inc_tax",
    "cr_reversed_charge", "cr_store_credit",
    "ws_sales_price", "ws_ext_discount_amt", "ws_wholesale_cost",
    "ws_ext_sales_price", "ws_net_profit", "ws_list_price",
    "ws_ext_list_price", "ws_ext_wholesale_cost", "ws_ext_ship_cost",
    "ws_ext_tax", "ws_coupon_amt", "ws_net_paid", "ws_net_paid_inc_tax",
    "wr_return_amt", "wr_net_loss", "wr_fee", "wr_refunded_cash")

  private val RENAMES: Seq[(String, String)] =
    MONEY.map(m => m -> s"${m}_c") ++ Seq(
      "cr_return_amount" -> "cr_return_amt_c",
      "cs_bill_customer_sk" -> "cs_customer_sk",
      // the two item prices map to their DOLLAR-valued twins: the
      // published texts filter them against dollar literals, which
      // select ~nothing against integer cents (COVERAGE.md)
      "i_current_price" -> "i_current_price_d",
      "i_wholesale_cost" -> "i_wholesale_cost_d")

  /** Query-file keys runnable on both engines at these domains — the
    * curated include list (multi-part queries keep their a/b file
    * split), 100 of 103 files since r16 (q39a/b joined via the
    * positional duplicate-name dedup, q64 via the four added schema
    * columns). Still excluded, per COVERAGE.md's infeasibility notes:
    * q58/q72 (DuckDB rejects the published texts' ambiguous column
    * references that Spark resolves by first binding — an oracle-side
    * fix would be a structural edit) and q90 (ANSI Spark raises
    * DIVIDE_BY_ZERO on the empty pm denominator where DuckDB yields
    * NULL). The adapted `q_tpcdsgen_*` twins keep all three under the
    * gate. */
  val INCLUDED: Seq[String] = Seq(
    "1", "2", "3", "4", "5", "6", "7", "8", "9", "10", "11", "12", "13",
    "14a", "14b", "15", "16", "17", "18", "19", "20", "21", "22", "23a",
    "23b", "24a", "24b", "25", "26", "27", "28", "29", "30", "31", "32",
    "33", "34", "35", "36", "37", "38", "39a", "39b", "40", "41", "42",
    "43", "44", "45", "46", "47", "48", "49", "50", "51", "52", "53",
    "54", "55", "56", "57", "59", "60", "61", "62", "63", "64", "65", "66",
    "67", "68", "69", "70", "71", "73", "74", "75", "76", "77", "78",
    "79", "80", "81", "82", "83", "84", "85", "86", "87", "88", "89",
    "91", "92", "93", "94", "95", "96", "97", "98", "99")

  private def resourceText(key: String): String = {
    val in = getClass.getResourceAsStream(s"/tpcds/query$key.sql")
    require(in != null, s"missing resource tpcds/query$key.sql")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** The published text after the uniform mechanical substitutions
    * (comments stripped, trailing `;` dropped, money renames, interval
    * shorthand) — still one text for both engines. */
  /** Query keys whose published text runs hash-green on both engines
    * but returns ZERO rows at these value domains — pinned so a
    * NEWLY-empty published row fails the Verify gate loudly instead
    * of shipping as silent weak evidence. Each carries a written
    * selectivity analysis in COVERAGE.md: q64's two cross_sales year
    * legs hold 4 and 9 rows here with ~372 reachable (item, store)
    * combos (expected overlap ≈ 0.1 — the pairing needs ~20× the
    * sf0.01 ss⋈sr volume); q85's conjunction of a same-(marital,
    * education) cdemo PAIR (≈1/1225), a price band, a profit band, a
    * state list and a year multiplies to ~1e-5 per web-return row
    * against ~2.5k rows. */
  val PINNED_EMPTY: Set[String] =
    Set("q_tpcdsgen_q64_published", "q_tpcdsgen_q85_published")

  def publishedText(key: String): String = {
    var t = resourceText(key).replaceAll("--[^\n]*", "").trim
      .stripSuffix(";").trim
    guardLiterals(key, t)
    RENAMES.foreach { case (k, v) => t = t.replaceAll(s"\\b$k\\b", v) }
    t.replaceAll("([+-])\\s*(\\d+)\\s+days\\b", "$1 INTERVAL $2 DAYS")
  }

  /** Guard BEFORE rewriting (the r16 advisory): the comment strip,
    * word-bounded renames, interval rewrite and the nullsFirst
    * paren-depth scanner are not quote-aware — they are safe for
    * every current resource (verified: no literal contains '--',
    * parens, 'order by', or a rename key), and this require keeps a
    * future added/edited file from being silently corrupted into a
    * runnable-but-divergent query. */
  private[graft] def guardLiterals(key: String, t: String): Unit =
    "'[^']*'".r.findAllIn(t).foreach { lit =>
      require(!lit.contains("--") && !lit.contains("(") && !lit.contains(")") &&
        !"(?i)order by".r.findFirstIn(lit).isDefined &&
        !RENAMES.exists { case (k, _) => s"\\b$k\\b".r.findFirstIn(lit).isDefined },
        s"query$key: quoted literal $lit would be corrupted by the mechanical rewrites")
    }

  private val bareCustomer = "\\bcustomer\\b".r

  def sparkSql(key: String): String = {
    val t = publishedText(key)
    val quoted = "'[^']*'".r.findAllIn(t)
    require(!quoted.exists(l => bareCustomer.findFirstIn(l).isDefined),
      s"query$key: quoted literal contains bare 'customer' — rewrite unsafe")
    bareCustomer.replaceAllIn(t, "customer_dim")
  }

  /** DuckDB rounds `cast(DOUBLE AS INT)` half-away-from-zero where
    * Spark (and the TPC-DS reference results) TRUNCATE toward zero —
    * q54's `cast(revenue/50 as int)` segments land one apart on
    * boundary values. Make the truncation explicit on the oracle
    * side only: every `cast(<expr> as int)` → `cast(trunc(<expr>) as
    * int)` (balanced-paren scan; `trunc` is a no-op on integers). */
  private[graft] def truncIntCasts(sql: String): String = {
    val lower = sql.toLowerCase
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (lower.startsWith("cast", i) &&
        (i == 0 || !sql.charAt(i - 1).isLetterOrDigit)) {
        var j = i + 4
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
        if (j < sql.length && sql.charAt(j) == '(') {
          var depth = 1
          var k = j + 1
          while (k < sql.length && depth > 0) {
            sql.charAt(k) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ => ()
            }
            k += 1
          }
          val inner = sql.substring(j + 1, k - 1)
          val m = "(?is)^(.*\\s)as\\s+int(?:eger)?\\s*$".r
          inner match {
            case m(e) =>
              out.append("cast(trunc(").append(e.trim).append(") as int)")
              i = k
            case _ =>
              out.append(sql.charAt(i)); i += 1
          }
        } else { out.append(sql.charAt(i)); i += 1 }
      } else { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  def duckSql(key: String): String = {
    val body = truncIntCasts(nullsFirst(publishedText(key).replace("`", "\"")))
    val prefix = TpcdsGen.oracleGenSql
    // the prefix is itself a complete WITH list; a published text that
    // opens with its own WITH continues that list
    if (body.toLowerCase.startsWith("with"))
      prefix + "," + body.drop(4).trim
    else prefix + body
  }

  /** Make the FINAL (top-level) ORDER BY's null placement explicit on
    * the DuckDB side: Spark sorts ASC with NULLS FIRST by default,
    * DuckDB with NULLS LAST — at a LIMIT cut over ROLLUP grouping
    * columns the two engines would otherwise keep different rows.
    * (DESC agrees — NULLS LAST both — so desc items are untouched;
    * the text itself is unchanged for Spark.) */
  private[graft] def nullsFirst(sql: String): String = {
    val lower = sql.toLowerCase
    // last top-level (paren-depth-0) "order by"
    var depth = 0
    var at = -1
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && lower.startsWith("order by", i) => at = i
        case _ => ()
      }
      i += 1
    }
    if (at < 0) return sql
    val head = sql.substring(0, at)
    val tail = sql.substring(at + "order by".length)
    // the item list ends at a top-level LIMIT or at end-of-text
    var d2 = 0
    var end = tail.length
    var j = 0
    val tl = tail.toLowerCase
    while (j < tail.length && end == tail.length) {
      tail.charAt(j) match {
        case '(' => d2 += 1
        case ')' => d2 -= 1
        case _ if d2 == 0 && tl.startsWith("limit", j) &&
          (j == 0 || !tail.charAt(j - 1).isLetterOrDigit) => end = j
        case _ => ()
      }
      j += 1
    }
    val (items, rest) = (tail.substring(0, end), tail.substring(end))
    // split items on depth-0 commas
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var d3 = 0
    var last = 0
    items.zipWithIndex.foreach { case (ch, k) =>
      ch match {
        case '(' => d3 += 1
        case ')' => d3 -= 1
        case ',' if d3 == 0 => parts += items.substring(last, k); last = k + 1
        case _ => ()
      }
    }
    parts += items.substring(last)
    val fixed = parts.map { p =>
      val t = p.trim.toLowerCase
      if (t.isEmpty || t.endsWith(" desc") || t == "desc" ||
        t.contains("nulls ")) p
      else p.replaceAll("\\s+$", "") + " NULLS FIRST "
    }
    head + "order by" + fixed.mkString(",") + rest
  }

  /** Canonicalize result TYPES and auto-generated NAMES to what the
    * DuckDB side of the compare surfaces:
    *  - LongType columns derived from an integer SUM (transitively
    *    through aliases) → double (DuckDB HUGEINT → pandas float);
    *  - every DecimalType column → double (Spark 4's ANSI avg over
    *    integrals yields DECIMAL; DuckDB decimals land as floats);
    *  - the unaliased `count(*)` column name → DuckDB's spelling
    *    (`count(1)` vs `count_star()` — the engines auto-name it
    *    differently and the driver compares by name).
    * The published TEXT is untouched — this is the same normalize-
    * before-compare the reference applies (TpcdsResultComparator). */
  private[graft] def castSumColumns(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
    import org.apache.spark.sql.catalyst.plans.logical.{CTERelationDef, CTERelationRef}
    import org.apache.spark.sql.types.{DateType, DecimalType, LongType}
    val plan = df.queryExecution.analyzed
    val defs = scala.collection.mutable.Map.empty[Long, Expression]
    plan.foreach(node => node.expressions.foreach(_.foreach {
      case a: Alias => defs(a.exprId.id) = a.child
      case _ => ()
    }))
    // CTE references mint fresh exprIds per reference — link each
    // ref output back to its definition's output so the sum hunt can
    // cross WITH boundaries
    val cteOut = scala.collection.mutable.Map.empty[Long, Seq[Attribute]]
    plan.foreach {
      case d: CTERelationDef => cteOut(d.id) = d.child.output
      case _ => ()
    }
    plan.foreach {
      case r: CTERelationRef =>
        cteOut.get(r.cteId).foreach(defOut =>
          r.output.zip(defOut).foreach { case (ro, dr) =>
            // the first reference SHARES exprIds with the definition —
            // never overwrite an Alias entry with a self-reference
            if (!defs.contains(ro.exprId.id) && ro.exprId != dr.exprId)
              defs(ro.exprId.id) = dr
          })
      case _ => ()
    }
    def hasSum(e: Expression, seen: Set[Long]): Boolean =
      e.exists {
        case ae: AggregateExpression => ae.aggregateFunction.isInstanceOf[Sum]
        case _ => false
      } || e.collect { case at: Attribute => at }.exists(at =>
        !seen(at.exprId.id) &&
          defs.get(at.exprId.id).exists(hasSum(_, seen + at.exprId.id)))
    val toCast = plan.output
      .filter(o => o.dataType.isInstanceOf[DecimalType] ||
        (o.dataType == LongType &&
          defs.get(o.exprId.id).exists(hasSum(_, Set(o.exprId.id)))))
      .map(_.name).toSet
    // DATE surfaces as datetime on the DuckDB/pandas side — align
    val toTs = plan.output.filter(_.dataType == DateType).map(_.name).toSet
    df.select(df.columns.map { c0 =>
      val base =
        if (toCast(c0)) col(c0).cast("double")
        else if (toTs(c0)) col(c0).cast("timestamp")
        else col(c0)
      base.as(if (c0 == "count(1)") "count_star()" else c0)
    }: _*)
  }

  /** Positionally dedup repeated output names the way DuckDB's pandas
    * layer does (`cov`, `cov_1`, …): q39a/b emit two unaliased `cov`
    * and `mean` columns (one per month leg), and the driver's compare
    * keys on names — the reference's own comparator is positional
    * (TpcdsResultComparator.java:35), so a by-position rename is the
    * same normalization, applied on both engines' outputs. */
  private[graft] def dedupNames(df: DataFrame): DataFrame = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val named = df.columns.map { c0 =>
      val k = seen.getOrElse(c0, 0)
      seen(c0) = k + 1
      if (k == 0) c0 else s"${c0}_$k"
    }
    if (named.sameElements(df.columns)) df else df.toDF(named.toIndexedSeq: _*)
  }

  private def run(key: String)(s: SparkSession, dir: String): DataFrame = {
    TpcdsGen2.registerViews(s, dir)
    castSumColumns(dedupNames(graft.sql.GraftSql.sql(s, sparkSql(key))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    INCLUDED.map(k => s"q_tpcdsgen_q${k}_published" -> (run(k) _)).toMap

  def oracle: Map[String, String] =
    INCLUDED.map(k => s"q_tpcdsgen_q${k}_published" -> duckSql(k)).toMap
}
