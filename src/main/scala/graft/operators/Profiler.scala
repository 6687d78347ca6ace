package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact table profiler — the ANALYZE-style per-column census
  * (row count, null count, exact distinct count) a warehouse runs
  * before planning and a data pipeline runs as its ingest health
  * check. Schema-generic: the aggregate list derives from the
  * DataFrame's own schema, so any table profiles without
  * per-table code.
  *
  * Shape: ONE aggregate pass emits every column's counters as a
  * single row, then a `stack` generator melts it to one row per
  * column — the melt runs over the 1-row aggregate, never the
  * table. The exact distinct counts go through Catalyst's
  * multi-distinct rewrite (one Expand of width |columns|, the
  * honest cost of exactness); the at-scale variant swaps
  * `countDistinct` for `approx_count_distinct` and the Expand
  * disappears — one true streaming pass (the [[graft.operators
  * .AggQueries]] HLL battery covers that path).
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"null__${f.name}"),
        countDistinct(col(f.name)).as(s"dist__${f.name}"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields
      .map(f => s"'${f.name}', `null__${f.name}`, `dist__${f.name}`")
      .mkString(", ")
    row.select(col("n_rows"),
        expr(s"stack(${fields.length}, $stackArgs) AS (col_name, n_null, n_distinct)"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
  }

  /** Driver query: profile the orders table. */
  def profileOrders(s: SparkSession, dir: String): DataFrame =
    profile(Tables.load(s, dir, "orders"))

  private val orderCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_table" -> ((s: SparkSession, d: String) => profileOrders(s, d)))

  val oracle: Map[String, String] = Map(
    "q_profile_table" -> orderCols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n"))
}
