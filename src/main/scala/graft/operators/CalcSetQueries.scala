package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Calc (fused project+filter), Values, sort/limit, set operations
  * and UNNEST/correlate (SURVEY.md §2.2, §2.7;
  * BatchExecCalc.java:38, BatchExecValues.java:37,
  * BatchExecSortLimit.java:48, BatchExecUnion.java:35,
  * ReplaceIntersectWithSemiJoinRule / RewriteMinusAllRule,
  * LogicalUnnestRule.scala → UnnestRowsFunction.java).
  *
  * Calc/filter predicates here compile into parquet pushed filters +
  * whole-stage codegen; `orderBy.limit` plans as
  * TakeOrderedAndProject (no global sort — each partition keeps k
  * rows, the driver merges k·|partitions|); set ops plan as
  * hash-aggregate / semi-anti joins exactly like the reference's
  * rewrite rules.
  */
object CalcSetQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def calc(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_discount").between(0.02, 0.08) && col("l_returnflag") =!= "A")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net"),
        when(col("l_quantity") > 25, "big")
          .when(col("l_quantity") > 10, "mid")
          .otherwise("small").as("bucket"),
        concat_ws("/", col("l_returnflag"), col("l_linestatus")).as("rf"))

  def values(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", -1.0))
      .toDF("id", "tag", "score")
      .select(col("id"), upper(col("tag")).as("tag_up"), (col("score") * 2).as("score2"))
  }

  def sortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  def unionAll(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey").cast("int").as("nationkey"), lit("cust").as("side"))
    val sp = t(s, dir, "supplier")
      .select(col("s_nationkey").cast("int").as("nationkey"), lit("supp").as("side"))
    c.unionAll(sp).groupBy(col("nationkey"), col("side")).agg(count(lit(1)).as("n"))
  }

  def intersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))

  // both sides restricted to high-balance accounts: the unrestricted
  // nation sets each cover all 25 nations (EXCEPT provably empty on
  // this corpus); nations with a rich customer but no rich supplier
  // give the distinct-minus semantics real rows (18 at sf0.01)
  def except(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").where(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey"))
      .except(t(s, dir, "supplier").where(col("s_acctbal") > 9000)
        .select(col("s_nationkey").as("nationkey")))

  /** EXCEPT ALL — multiset minus (RewriteMinusAllRule.scala's
    * REPLICATE_ROWS shape, which Spark implements natively).
    */
  def exceptAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .exceptAll(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))

  def intersectAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_custkey").as("k"))
      .intersectAll(t(s, dir, "customer").select(col("c_custkey").as("k")))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))

  /** UNNEST / explode (Correlate): token explode of document text. */
  def unnest(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  /** Correlated explode + re-aggregate: per-doc distinct token count
    * (LATERAL + grouping — Correlate under Aggregate).
    */
  def lateralAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("tok")).as("nd_tok"), count(lit(1)).as("n_tok"))

  /** UNPIVOT (SQL:2016 / Calcite; Spark's `Dataset.unpivot`) — wide
    * measure columns melted to (id, measure, val) long form, the
    * inverse of conditional-aggregation pivoting. Runs as a
    * projection+Expand over the already-aggregated 3-row frame —
    * at scale the melt happens AFTER the aggregate, so the corpus
    * never replicates per measure. The values cast to one common
    * double type (unpivot's contract); the oracle re-derives the
    * melt as a UNION ALL so it runs on any engine.
    */
  /** PIVOT — UNPIVOT's inverse (SQL:2016 optional feature T431;
    * Spark's relational pivot): orders totals spread to one column
    * per priority class. The value list is EXPLICIT, which is the
    * scale contract — with values given, pivot is a single
    * partial+final aggregate over conditional sums (no
    * distinct-values pre-pass scanning the fact table, no driver
    * collect); the oracle is the equivalent CASE spread. Columns
    * renamed to identifier-safe names (parquet rejects the raw
    * '4-NOT SPECIFIED').
    */
  def pivotPriorities(s: SparkSession, dir: String): DataFrame = {
    val vals = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val names = Seq("p_urgent", "p_high", "p_medium", "p_notspec", "p_low")
    val wide = t(s, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy(col("yr"))
      .pivot("o_orderpriority", vals)
      .agg(sum(col("o_totalprice")))
    vals.zip(names).foldLeft(wide) { case (d, (v, n)) => d.withColumnRenamed(v, n) }
  }

  /** The same pivot through the SQL front door — Spark's SQL:2016
    * PIVOT clause with value aliases (explicit IN list, same
    * single-aggregate scale contract as [[pivotPriorities]]).
    */
  def sqlPivot(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_pivot_src")
    s.sql(
      """SELECT * FROM (
        |  SELECT year(o_orderdate) AS yr, o_orderpriority, o_totalprice
        |  FROM orders_pivot_src)
        |PIVOT (sum(o_totalprice) FOR o_orderpriority IN (
        |  '1-URGENT' AS p_urgent, '2-HIGH' AS p_high, '3-MEDIUM' AS p_medium,
        |  '4-NOT SPECIFIED' AS p_notspec, '5-LOW' AS p_low))""".stripMargin)
  }

  def unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice")).cast("double").as("sum_price"),
        avg(col("l_discount")).as("avg_disc"))
    wide.unpivot(
      Array(col("l_returnflag")),
      Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
      "measure", "val")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unpivot" -> (unpivot _),
    "q_pivot" -> (pivotPriorities _),
    "q_sql_pivot" -> (sqlPivot _),
    "q_calc"          -> (calc _),
    "q_values"        -> (values _),
    "q_sort_limit"    -> (sortLimit _),
    "q_union_all"     -> (unionAll _),
    "q_intersect"     -> (intersect _),
    "q_except"        -> (except _),
    "q_except_all"    -> (exceptAll _),
    "q_intersect_all" -> (intersectAll _),
    "q_unnest"        -> (unnest _),
    "q_lateral_agg"   -> (lateralAgg _))

  val oracle: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT year(o_orderdate) AS yr,
        |  sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) AS p_urgent,
        |  sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END) AS p_high,
        |  sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END) AS p_medium,
        |  sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END) AS p_notspec,
        |  sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END) AS p_low
        |FROM orders GROUP BY 1""".stripMargin,
    // the SQL-clause twin computes the identical spread
    "q_sql_pivot" ->
      """SELECT year(o_orderdate) AS yr,
        |  sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END) AS p_urgent,
        |  sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END) AS p_high,
        |  sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END) AS p_medium,
        |  sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END) AS p_notspec,
        |  sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END) AS p_low
        |FROM orders GROUP BY 1""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    sum(l_quantity)::DOUBLE AS sum_qty,
        |    sum(l_extendedprice)::DOUBLE AS sum_price,
        |    avg(l_discount) AS avg_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM wide
        |UNION ALL
        |SELECT l_returnflag, 'avg_disc', avg_disc FROM wide""".stripMargin,
    "q_calc" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net,
        |  CASE WHEN l_quantity > 25 THEN 'big'
        |       WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS bucket,
        |  l_returnflag || '/' || l_linestatus AS rf
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.02 AND 0.08 AND l_returnflag <> 'A'""".stripMargin,
    "q_values" ->
      """SELECT id, upper(tag) AS tag_up, score * 2 AS score2
        |FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', -1.0)) AS t(id, tag, score)""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_union_all" ->
      """SELECT nationkey, side, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey, 'cust' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supp' AS side FROM supplier)
        |GROUP BY nationkey, side""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000""".stripMargin,
    "q_except_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |GROUP BY nationkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  INTERSECT ALL
        |  SELECT c_custkey AS k FROM customer)
        |GROUP BY k""".stripMargin,
    "q_unnest" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |FROM documents WHERE doc_id < 50""".stripMargin,
    "q_lateral_agg" ->
      """SELECT doc_id, count(DISTINCT tok) AS nd_tok, count(*) AS n_tok
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY doc_id""".stripMargin)
}
