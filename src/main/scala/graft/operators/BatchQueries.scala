package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Batch relational operator battery.
  *
  * Each entry re-expresses one operator family from the reference's
  * physical-operator inventory (SURVEY.md §2; Flink ExecNodes under
  * flink-table-planner .../plan/nodes/exec/batch) as an idiomatic
  * Spark DataFrame plan. Each query has a matching DuckDB oracle in
  * [[BatchQueries.oracle]] with identical output column names.
  *
  * Scale notes are inline: every plan here is shuffle-minimal —
  * dimension joins broadcast, aggregations are partial+final
  * (HashAggregateExec does map-side combine automatically), filters
  * and projections reach the parquet scan via Catalyst pushdown.
  */
object BatchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** TPC-H Q1 shape — scan/filter/project/hash-agg/sort fused by
    * whole-stage codegen. Ref: BatchExecHashAggregate.java:52,
    * BatchExecCalc.java:38. Map-side partial agg keeps the shuffle at
    * |groups| = 6 rows regardless of input scale.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
