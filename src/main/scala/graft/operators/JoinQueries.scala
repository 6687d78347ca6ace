package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Join operator family (SURVEY.md §2.3).
  *
  * Covers every batch equi-join type the reference supports
  * (BatchExecHashJoin.java:55 — inner/left/right/full/semi/anti),
  * nested-loop theta joins (BatchExecNestedLoopJoin.java:46), and
  * cross joins. Scale stance: true dimension tables (region, nation,
  * literal band tables) are broadcast explicitly; fact-fact joins
  * shuffle on their equi keys and are AQE-planned. Nothing here
  * collects to the driver.
  */
object JoinQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Fact-to-dim join chain with per-nation revenue rollup. The
    * nation dim is broadcast; lineitem⋈orders shuffles on orderkey
    * (the natural co-partitioning key at 100 TB).
    */
  def joinInner(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        // per-term cast to DECIMAL(20,4): the per-row double product is
        // bit-identical in both engines, and a decimal SUM is exact and
        // accumulation-order independent — double sums flipped the
        // driver's 1e-2 rounding at .xx5 boundaries on some SFs
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(20,4)")).cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
  }

  /** Left outer join preserving customers with zero orders. */
  def joinLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice")), lit(0.0)).as("total_spent"))

  /** Right outer join preserving nations with no suppliers. */
  def joinRight(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"), "right")
      .groupBy(col("n_name"))
      .agg(count(col("s_suppkey")).as("n_suppliers"))

  /** Full outer join of two pre-aggregated sides (customer vs
    * supplier presence per nation). Pre-aggregating before the outer
    * join keeps the shuffled sides at |nations| rows — the
    * aggregate-below-join shape that survives any scale.
    */
  def joinFull(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = t(s, dir, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  /** Left-semi join = EXISTS (StreamingSemiAntiJoinOperator.java:34's
    * batch shape): customers holding at least one 'F'-status order.
    */
  def joinSemi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Left-anti join = NOT EXISTS: customers with no orders at all. */
  // anti against the RECENT order slice: the driver corpus gives every
  // customer at least one order ever, so a no-orders-ever anti join is
  // provably empty here — dormancy (no order in the corpus's final
  // seven months) keeps the same anti-join plan and selects ~615
  // customers at sf0.01
  def joinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_orderdate") >= "2001-01-01"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Pure theta join (broadcast nested loop): price-band bucketing of
    * parts against a literal band table. The band side is tiny and
    * broadcast, so the NLJ is a single pass over the fact side.
    */
  def joinTheta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (1, 900.0, 925.0), (2, 925.0, 950.0),
      (3, 950.0, 975.0), (4, 975.0, 1000.0)
    ).toDF("band_id", "lo", "hi")
    t(s, dir, "part")
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_parts"), avg(col("p_retailprice")).as("avg_price"))
  }

  /** Cross join of two dims (BatchExecNestedLoopJoin without a
    * condition) — only ever sane when at least one side is tiny.
    */
  def joinCross(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").crossJoin(t(s, dir, "nation"))
      .select(col("r_name"), col("n_name"))

  /** Key-less range join: purchases within ±5 min of each error
    * event, NO user equality — the shape Spark would otherwise plan
    * as a BroadcastNestedLoopJoin (O(n·m)). [[RangeJoin]] buckets the
    * time axis (10-min buckets ≈ the 10-min span → right side
    * replicates ≤2×) so it hash-joins and scales; the residual
    * re-check keeps exactness, which the DuckDB oracle verifies.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame =
    rangeJoinWidth(s, dir, 600000000L)

  /** Width-parameterized twin: the SCALE probe narrows `bucketWidth`
    * as event density grows (data multiplies into the SAME time span,
    * so per-bucket occupancy — and with it the L×R candidate volume —
    * otherwise rises quadratically with the multiplier). Narrower
    * buckets replicate each interval into more buckets (linear cost)
    * in exchange for holding per-bucket occupancy constant — the same
    * width-for-density dial as the simhash band scaling.
    */
  def rangeJoinWidth(s: SparkSession, dir: String, bucketWidth: Long): DataFrame = {
    val e = t(s, dir, "events")
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"),
        (unix_micros(col("ts")) - lit(300000000L)).as("lo"),
        (unix_micros(col("ts")) + lit(300000000L)).as("hi"))
    val pur = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("pts"))
    RangeJoin.pointInInterval(pur, "pts", err, "lo", "hi", bucketWidth)
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_purch"), min(col("p_id")).as("first_p"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> (rangeJoin _),
    "q_join_inner" -> (joinInner _),
    "q_join_left"  -> (joinLeft _),
    "q_join_right" -> (joinRight _),
    "q_join_full"  -> (joinFull _),
    "q_join_semi"  -> (joinSemi _),
    "q_join_anti"  -> (joinAnti _),
    "q_join_theta" -> (joinTheta _),
    "q_join_cross" -> (joinCross _))

  val oracle: Map[String, String] = Map(
    "q_range_join" ->
      """SELECT e.event_id AS err_id, count(*) AS n_purch,
        |       min(p.event_id) AS first_p
        |FROM events e JOIN events p
        |  ON p.event_type = 'purchase' AND e.event_type = 'error'
        | AND epoch_us(p.ts) BETWEEN epoch_us(e.ts) - 300000000
        |                        AND epoch_us(e.ts) + 300000000
        |GROUP BY e.event_id""".stripMargin,
    "q_join_inner" ->
      """SELECT n_name,
        |  sum((l_extendedprice * (1.0 - l_discount))::DECIMAL(20,4))::DOUBLE AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name,
        |  count(o_orderkey) AS n_orders,
        |  coalesce(sum(o_totalprice), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "q_join_right" ->
      """SELECT n_name, count(s_suppkey) AS n_suppliers
        |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_join_full" ->
      """SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust,
        |  coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) cn
        |FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) sn
        |  ON c_nationkey = s_nationkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= DATE '2001-01-01')""".stripMargin,
    "q_join_theta" ->
      """SELECT band_id, count(*) AS n_parts, avg(p_retailprice) AS avg_price
        |FROM part
        |JOIN (VALUES (1, 900.0, 925.0), (2, 925.0, 950.0),
        |             (3, 950.0, 975.0), (4, 975.0, 1000.0)) AS b(band_id, lo, hi)
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band_id""".stripMargin,
    "q_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation")
}
