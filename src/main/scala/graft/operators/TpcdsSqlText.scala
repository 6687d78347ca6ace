package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run the ENTIRE real TPC-DS battery as SQL TEXT through the front
  * door — the reference's e2e gate executes `query{N}.sql` files, not
  * DSL plans (flink-end-to-end-tests/flink-tpcds-test/.../
  * TpcdsTestProgram.java:76-85), so "expressible as a DataFrame twin"
  * is not the same claim as "the text runs". Every `q_tpcdsgen_*`
  * query already carries ONE shared SQL definition: its DuckDB oracle
  * body over the regenerated star schema. That body (minus the
  * generator CTE prefix, which the registered temp views replace) IS
  * the query text, and it executes on Spark after exactly two
  * mechanical dialect rewrites:
  *
  *   - `//` (DuckDB integer division) → `div` (Spark's operator, same
  *     precedence tier as `*`, so `a * 1000000 // b` keeps meaning);
  *   - the bare `customer` table name → the `customer_dim` view (the
  *     TPC-H `customer` table owns that name in the shared session).
  *
  * Everything else — `::TYPE` postfix casts, `||` concat, implicit
  * FROM-list joins, correlated [NOT] EXISTS, window frames, HAVING
  * on grouped aliases — parses identically in both engines, so one
  * string feeds both sides and the text battery can never drift from
  * the oracle battery. Each `*_sqltext` row registers the generated
  * views and hands the translated text to `spark.sql`, and its
  * oracle entry is the UNtranslated original.
  */
object TpcdsSqlText {

  /** The hand-written r13 text rows keep their existing entries. */
  private val handWritten = Set("q_tpcdsgen_q3", "q_tpcdsgen_q55", "q_tpcdsgen_q98")

  private def base: Map[String, String] =
    (TpcdsGen.oracle ++ TpcdsGen2.oracle ++ TpcdsGen3.oracle)
      .filter { case (k, _) => k.startsWith("q_tpcdsgen_") && !k.endsWith("_sqltext") }

  /** The Spark-executable text for a battery query: the shared SQL
    * body with the two dialect rewrites applied. The rewrites are
    * TEXTUAL over the whole body, so any quoted string literal
    * containing a rewritten token would be silently corrupted into a
    * query that still runs but diverges from the oracle (r14
    * advisory) — the require below turns that silent drift into a
    * loud failure at translation time. */
  def sparkText(name: String): String = {
    val full = base(name)
    val prefix = TpcdsGen.oracleGenSql
    require(full.startsWith(prefix), s"$name oracle does not start with the gen prefix")
    val body = full.stripPrefix(prefix).trim
    val bareCustomer = "\\bcustomer\\b".r
    val quoted = "'[^']*'".r.findAllIn(body)
    require(!quoted.exists(l =>
        l.contains("//") || bareCustomer.findFirstIn(l).isDefined),
      s"$name: a quoted literal contains a dialect-rewrite token ('//' or " +
        "bare 'customer') — the blind textual rewrite would corrupt it; " +
        "rename the literal or make the rewrite quote-aware")
    val standalone =
      if (body.startsWith(",")) "WITH " + body.drop(1).trim
      else body
    standalone
      .replace("//", " div ")
      .replaceAll("\\bcustomer\\b", "customer_dim")
  }

  private def run(name: String)(s: SparkSession, dir: String): DataFrame = {
    TpcdsGen2.registerViews(s, dir)
    // Through the front door — the pre-parser (SET/DDL/hint handling)
    // is a no-op on standard SQL text, and routing here proves it.
    graft.sql.GraftSql.sql(s, sparkText(name))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    base.keySet.diff(handWritten).map { name =>
      s"${name}_sqltext" -> (run(name) _)
    }.toMap

  def oracle: Map[String, String] =
    base.filterNot { case (k, _) => handWritten(k) }
      .map { case (name, sql) => s"${name}_sqltext" -> sql }
}
