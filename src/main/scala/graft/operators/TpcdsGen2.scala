package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{TpcdsGen => G}

/** Real TPC-DS queries over the extended deterministic star schema in
  * [[TpcdsGen]] — the web channel, ship/return dates, inventory and
  * the time/household dims unlock the shipping-latency, time-band,
  * returns-audit and inventory families of the published benchmark.
  * Same contract as TpcdsGen: every query is hash-checked end to end
  * because DuckDB regenerates the identical tables from closed-form
  * CTEs (the reference's own at-scale gate is the generated-TPC-DS
  * battery, flink-end-to-end-tests/flink-tpcds-test/.../
  * TpcdsTestProgram.java:76-85).
  *
  * Scale notes baked into every plan here: dims broadcast (fixed-size
  * by construction), facts scan exactly once per query, band/pivot
  * queries are ONE conditional-aggregate pass (never N filtered
  * subqueries cross-joined, which is how the published texts spell
  * them), and every threshold cut is cross-multiplied exact integers
  * so no float ever decides row membership.
  */
object TpcdsGen2 {

  /** TPC-DS q43: store revenue pivoted by day of week, one year. The
    * published text pivots via seven CASE sums over one scan — kept
    * verbatim; both dims broadcast.
    */
  def q43(s: SparkSession, dir: String): DataFrame =
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.store(s)), col("ss_store_sk") === col("s_store_sk"))
      .groupBy(col("s_store_sk"), col("s_state"))
      .agg(
        sum(when(col("d_dow") === 0, col("ss_ext_sales_price_c")).otherwise(0L)).as("sun_sales"),
        sum(when(col("d_dow") === 1, col("ss_ext_sales_price_c")).otherwise(0L)).as("mon_sales"),
        sum(when(col("d_dow") === 2, col("ss_ext_sales_price_c")).otherwise(0L)).as("tue_sales"),
        sum(when(col("d_dow") === 3, col("ss_ext_sales_price_c")).otherwise(0L)).as("wed_sales"),
        sum(when(col("d_dow") === 4, col("ss_ext_sales_price_c")).otherwise(0L)).as("thu_sales"),
        sum(when(col("d_dow") === 5, col("ss_ext_sales_price_c")).otherwise(0L)).as("fri_sales"),
        sum(when(col("d_dow") === 6, col("ss_ext_sales_price_c")).otherwise(0L)).as("sat_sales"))

  /** TPC-DS q88: how many store sales fell in each of eight half-hour
    * bands (8:30–12:30) for small-household shoppers. The published
    * text cross-joins eight filtered COUNT subqueries (s1×…×s8); a
    * single conditional-aggregate scan produces the identical row —
    * the fact is read ONCE instead of eight times, the 100 TB
    * difference.
    */
  def q88(s: SparkSession, dir: String): DataFrame =
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.householdDemographics(s)
        .where(col("hd_dep_count").isin(1L, 3L, 5L))),
        col("ss_hdemo_sk") === col("hd_demo_sk"))
      .join(broadcast(G.timeDim(s).where(col("t_hour").between(8, 12))),
        col("ss_sold_time_sk") === col("t_time_sk"))
      .agg(
        sum(when(col("t_hour") === 8 && col("t_minute") >= 30, 1L).otherwise(0L)).as("h8_30"),
        sum(when(col("t_hour") === 9 && col("t_minute") < 30, 1L).otherwise(0L)).as("h9_00"),
        sum(when(col("t_hour") === 9 && col("t_minute") >= 30, 1L).otherwise(0L)).as("h9_30"),
        sum(when(col("t_hour") === 10 && col("t_minute") < 30, 1L).otherwise(0L)).as("h10_00"),
        sum(when(col("t_hour") === 10 && col("t_minute") >= 30, 1L).otherwise(0L)).as("h10_30"),
        sum(when(col("t_hour") === 11 && col("t_minute") < 30, 1L).otherwise(0L)).as("h11_00"),
        sum(when(col("t_hour") === 11 && col("t_minute") >= 30, 1L).otherwise(0L)).as("h11_30"),
        sum(when(col("t_hour") === 12 && col("t_minute") < 30, 1L).otherwise(0L)).as("h12_00"))

  /** TPC-DS q96: count of store sales in one store's 20:30–21:00
    * rush for 7-dependent households — three broadcast dims onto one
    * fact scan, one COUNT out.
    */
  def q96(s: SparkSession, dir: String): DataFrame =
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.householdDemographics(s).where(col("hd_dep_count") === 7)),
        col("ss_hdemo_sk") === col("hd_demo_sk"))
      .join(broadcast(G.timeDim(s)
        .where(col("t_hour") === 20 && col("t_minute") >= 30)),
        col("ss_sold_time_sk") === col("t_time_sk"))
      .join(broadcast(G.store(s).where(col("s_state") === "ST2")),
        col("ss_store_sk") === col("s_store_sk"))
      .agg(count(lit(1)).as("cnt"))

  /** TPC-DS q90: ratio of morning (8–9h) to evening (19–20h) web
    * sales for mid-size households. Published: two scalar subqueries
    * divided; here one conditional pass and an integer-ppm floor-div
    * ratio so both engines emit the same long.
    */
  def q90(s: SparkSession, dir: String): DataFrame =
    G.webSales(s, G.nSales(s, dir))
      .join(broadcast(G.householdDemographics(s).where(col("hd_dep_count") === 6)),
        col("ws_hdemo_sk") === col("hd_demo_sk"))
      .join(broadcast(G.timeDim(s)
        .where(col("t_hour").between(8, 9) || col("t_hour").between(19, 20))),
        col("ws_sold_time_sk") === col("t_time_sk"))
      .agg(
        sum(when(col("t_hour").between(8, 9), 1L).otherwise(0L)).as("am_count"),
        sum(when(col("t_hour").between(19, 20), 1L).otherwise(0L)).as("pm_count"))
      .withColumn("am_pm_ratio_ppm", expr("am_count * 1000000 div pm_count"))

  /** TPC-DS q62: web-sales shipping latency banded per (warehouse,
    * ship mode, site) for one sold year — days-to-ship bands ≤30 /
    * 31–60 / 61–90 / 91–120 / >120 as one conditional pass (the
    * published text's five CASE sums, kept verbatim); all three dims
    * broadcast.
    */
  def q62(s: SparkSession, dir: String): DataFrame =
    G.webSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("ws_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.warehouse(s)), col("ws_warehouse_sk") === col("w_warehouse_sk"))
      .join(broadcast(G.shipMode(s)), col("ws_ship_mode_sk") === col("sm_ship_mode_sk"))
      .join(broadcast(G.webSite(s)), col("ws_web_site_sk") === col("web_site_sk"))
      .withColumn("lag_days", col("ws_ship_date_sk") - col("ws_sold_date_sk"))
      .groupBy(col("w_warehouse_name"), col("sm_type"), col("web_name"))
      .agg(
        sum(when(col("lag_days") <= 30, 1L).otherwise(0L)).as("d30"),
        sum(when(col("lag_days") > 30 && col("lag_days") <= 60, 1L).otherwise(0L)).as("d31_60"),
        sum(when(col("lag_days") > 60 && col("lag_days") <= 90, 1L).otherwise(0L)).as("d61_90"),
        sum(when(col("lag_days") > 90 && col("lag_days") <= 120, 1L).otherwise(0L)).as("d91_120"),
        sum(when(col("lag_days") > 120, 1L).otherwise(0L)).as("d120plus"))

  /** TPC-DS q99: the catalog-channel twin of q62 — latency bands per
    * (warehouse, ship mode, call center); catalog ships within 2–91
    * days so the top band is >90.
    */
  def q99(s: SparkSession, dir: String): DataFrame =
    G.catalogSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("cs_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.warehouse(s)), col("cs_warehouse_sk") === col("w_warehouse_sk"))
      .join(broadcast(G.shipMode(s)), col("cs_ship_mode_sk") === col("sm_ship_mode_sk"))
      .join(broadcast(G.callCenter(s)), col("cs_call_center_sk") === col("cc_call_center_sk"))
      .withColumn("lag_days", col("cs_ship_date_sk") - col("cs_sold_date_sk"))
      .groupBy(col("w_warehouse_name"), col("sm_type"), col("cc_name"))
      .agg(
        sum(when(col("lag_days") <= 30, 1L).otherwise(0L)).as("d30"),
        sum(when(col("lag_days") > 30 && col("lag_days") <= 60, 1L).otherwise(0L)).as("d31_60"),
        sum(when(col("lag_days") > 60 && col("lag_days") <= 90, 1L).otherwise(0L)).as("d61_90"),
        sum(when(col("lag_days") > 90, 1L).otherwise(0L)).as("d90plus"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpcdsgen_q43" -> (q43 _),
    "q_tpcdsgen_q88" -> (q88 _),
    "q_tpcdsgen_q96" -> (q96 _),
    "q_tpcdsgen_q90" -> (q90 _),
    "q_tpcdsgen_q62" -> (q62 _),
    "q_tpcdsgen_q99" -> (q99 _))

  val oracle: Map[String, String] = Map(
    "q_tpcdsgen_q43" -> (G.oracleGenSql +
      """SELECT s_store_sk, s_state,
        |  sum(CASE WHEN d_dow = 0 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS sun_sales,
        |  sum(CASE WHEN d_dow = 1 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS mon_sales,
        |  sum(CASE WHEN d_dow = 2 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS tue_sales,
        |  sum(CASE WHEN d_dow = 3 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS wed_sales,
        |  sum(CASE WHEN d_dow = 4 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS thu_sales,
        |  sum(CASE WHEN d_dow = 5 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS fri_sales,
        |  sum(CASE WHEN d_dow = 6 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS sat_sales
        |FROM store_sales
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |WHERE d_year = 2000
        |GROUP BY s_store_sk, s_state""".stripMargin),
    "q_tpcdsgen_q88" -> (G.oracleGenSql +
      """SELECT
        |  sum(CASE WHEN t_hour = 8 AND t_minute >= 30 THEN 1 ELSE 0 END)::BIGINT AS h8_30,
        |  sum(CASE WHEN t_hour = 9 AND t_minute < 30 THEN 1 ELSE 0 END)::BIGINT AS h9_00,
        |  sum(CASE WHEN t_hour = 9 AND t_minute >= 30 THEN 1 ELSE 0 END)::BIGINT AS h9_30,
        |  sum(CASE WHEN t_hour = 10 AND t_minute < 30 THEN 1 ELSE 0 END)::BIGINT AS h10_00,
        |  sum(CASE WHEN t_hour = 10 AND t_minute >= 30 THEN 1 ELSE 0 END)::BIGINT AS h10_30,
        |  sum(CASE WHEN t_hour = 11 AND t_minute < 30 THEN 1 ELSE 0 END)::BIGINT AS h11_00,
        |  sum(CASE WHEN t_hour = 11 AND t_minute >= 30 THEN 1 ELSE 0 END)::BIGINT AS h11_30,
        |  sum(CASE WHEN t_hour = 12 AND t_minute < 30 THEN 1 ELSE 0 END)::BIGINT AS h12_00
        |FROM store_sales
        |JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |WHERE hd_dep_count IN (1, 3, 5) AND t_hour BETWEEN 8 AND 12""".stripMargin),
    "q_tpcdsgen_q96" -> (G.oracleGenSql +
      """SELECT count(*) AS cnt
        |FROM store_sales
        |JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |JOIN time_dim ON ss_sold_time_sk = t_time_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |WHERE hd_dep_count = 7 AND t_hour = 20 AND t_minute >= 30
        |  AND s_state = 'ST2'""".stripMargin),
    "q_tpcdsgen_q90" -> (G.oracleGenSql +
      """SELECT am_count, pm_count, am_count * 1000000 // pm_count AS am_pm_ratio_ppm
        |FROM (
        |  SELECT
        |    sum(CASE WHEN t_hour BETWEEN 8 AND 9 THEN 1 ELSE 0 END)::BIGINT AS am_count,
        |    sum(CASE WHEN t_hour BETWEEN 19 AND 20 THEN 1 ELSE 0 END)::BIGINT AS pm_count
        |  FROM web_sales
        |  JOIN household_demographics ON ws_hdemo_sk = hd_demo_sk
        |  JOIN time_dim ON ws_sold_time_sk = t_time_sk
        |  WHERE hd_dep_count = 6
        |    AND (t_hour BETWEEN 8 AND 9 OR t_hour BETWEEN 19 AND 20))""".stripMargin),
    "q_tpcdsgen_q62" -> (G.oracleGenSql +
      """SELECT w_warehouse_name, sm_type, web_name,
        |  sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)::BIGINT AS d30,
        |  sum(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1 ELSE 0 END)::BIGINT AS d31_60,
        |  sum(CASE WHEN lag_days > 60 AND lag_days <= 90 THEN 1 ELSE 0 END)::BIGINT AS d61_90,
        |  sum(CASE WHEN lag_days > 90 AND lag_days <= 120 THEN 1 ELSE 0 END)::BIGINT AS d91_120,
        |  sum(CASE WHEN lag_days > 120 THEN 1 ELSE 0 END)::BIGINT AS d120plus
        |FROM (
        |  SELECT ws_warehouse_sk, ws_ship_mode_sk, ws_web_site_sk,
        |    ws_ship_date_sk - ws_sold_date_sk AS lag_days
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year = 2000)
        |JOIN warehouse ON ws_warehouse_sk = w_warehouse_sk
        |JOIN ship_mode ON ws_ship_mode_sk = sm_ship_mode_sk
        |JOIN web_site ON ws_web_site_sk = web_site_sk
        |GROUP BY w_warehouse_name, sm_type, web_name""".stripMargin),
    "q_tpcdsgen_q99" -> (G.oracleGenSql +
      """SELECT w_warehouse_name, sm_type, cc_name,
        |  sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)::BIGINT AS d30,
        |  sum(CASE WHEN lag_days > 30 AND lag_days <= 60 THEN 1 ELSE 0 END)::BIGINT AS d31_60,
        |  sum(CASE WHEN lag_days > 60 AND lag_days <= 90 THEN 1 ELSE 0 END)::BIGINT AS d61_90,
        |  sum(CASE WHEN lag_days > 90 THEN 1 ELSE 0 END)::BIGINT AS d90plus
        |FROM (
        |  SELECT cs_warehouse_sk, cs_ship_mode_sk, cs_call_center_sk,
        |    cs_ship_date_sk - cs_sold_date_sk AS lag_days
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE d_year = 2000)
        |JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
        |JOIN ship_mode ON cs_ship_mode_sk = sm_ship_mode_sk
        |JOIN call_center ON cs_call_center_sk = cc_call_center_sk
        |GROUP BY w_warehouse_name, sm_type, cc_name""".stripMargin))
}
