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
      .join(broadcast(G.store(s).where(col("s_state") === "GA")),
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

  /** TPC-DS q92: total web discount on rows whose discount exceeds
    * 1.3× their item's in-window average. The correlated scalar
    * subquery decorrelates to one item-grain (sum, count) aggregate
    * broadcast back onto the window slice, and the 1.3× cut is
    * cross-multiplied exact integers (amt·cnt·10 > sum·13).
    */
  def q92(s: SparkSession, dir: String): DataFrame = {
    val w = G.webSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s)
        .where(col("d_year") === 2000 && col("d_moy").between(1, 3))),
        col("ws_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s).where(col("i_manufact_id") === 35)),
        col("ws_item_sk") === col("i_item_sk"))
      .select(col("ws_item_sk"), col("ws_ext_discount_amt_c"))
    val perItem = w.groupBy(col("ws_item_sk").as("pi_item"))
      .agg(sum(col("ws_ext_discount_amt_c")).as("pi_sum"), count(lit(1)).as("pi_cnt"))
    w.join(broadcast(perItem), col("ws_item_sk") === col("pi_item"))
      .where(col("ws_ext_discount_amt_c") * col("pi_cnt") * 10 > col("pi_sum") * 13)
      .agg(sum(col("ws_ext_discount_amt_c")).as("excess_discount_c"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-DS q32: the catalog twin of q92 (manufacturer 77, Q2). */
  def q32(s: SparkSession, dir: String): DataFrame = {
    val w = G.catalogSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s)
        .where(col("d_year") === 2000 && col("d_moy").between(4, 6))),
        col("cs_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s).where(col("i_manufact_id") === 77)),
        col("cs_item_sk") === col("i_item_sk"))
      .select(col("cs_item_sk"), col("cs_ext_discount_amt_c"))
    val perItem = w.groupBy(col("cs_item_sk").as("pi_item"))
      .agg(sum(col("cs_ext_discount_amt_c")).as("pi_sum"), count(lit(1)).as("pi_cnt"))
    w.join(broadcast(perItem), col("cs_item_sk") === col("pi_item"))
      .where(col("cs_ext_discount_amt_c") * col("pi_cnt") * 10 > col("pi_sum") * 13)
      .agg(sum(col("cs_ext_discount_amt_c")).as("excess_discount_c"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-DS q94: web orders sold in 1999, shipped within 60 days from
    * an ST2 warehouse, and never returned — LEFT ANTI against
    * web_returns (returns are 1/11th of sales, the natural probe
    * side), one count + net-profit row out. The published EXISTS
    * "shipped from a second warehouse" clause is UNSATISFIABLE at
    * this one-row-per-order grain (always false — running the
    * verbatim text would return an empty result), so it is dropped
    * as a documented schema adaptation, listed with the declared
    * divergences in COVERAGE.md; q16's NOT-the-same-warehouse EXISTS
    * has the same adaptation.
    */
  def q94(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    G.webSales(s, n)
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1999)),
        col("ws_sold_date_sk") === col("d_date_sk"))
      .where(col("ws_ship_date_sk") - col("ws_sold_date_sk") <= 60)
      .join(broadcast(G.warehouse(s).where(col("w_state") === "GA")),
        col("ws_warehouse_sk") === col("w_warehouse_sk"))
      .join(G.webReturns(s, n), col("ws_order_number") === col("wr_order_number"),
        "left_anti")
      .agg(count(lit(1)).as("order_count"),
        sum(col("ws_net_profit_c")).as("total_net_profit_c"))
  }

  /** TPC-DS q16: the catalog twin of q94 — 2001 orders shipped within
    * 30 days through three call centers, NOT EXISTS catalog_returns.
    */
  def q16(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    G.catalogSales(s, n)
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2001)),
        col("cs_sold_date_sk") === col("d_date_sk"))
      .where(col("cs_ship_date_sk") - col("cs_sold_date_sk") <= 30)
      .join(broadcast(G.callCenter(s)
        .where(col("cc_name").isin("CC1", "CC2", "CC3"))),
        col("cs_call_center_sk") === col("cc_call_center_sk"))
      .join(G.catalogReturns(s, n), col("cs_order_number") === col("cr_order_number"),
        "left_anti")
      .agg(count(lit(1)).as("order_count"),
        sum(col("cs_net_profit_c")).as("total_net_profit_c"))
  }

  /** TPC-DS q26: per-item quantity/price/discount averages for
    * catalog sales to one birth-decade cohort on non-promoted
    * channels — the catalog twin of q7; averages are exact-integer
    * sums divided once so both engines emit identical doubles.
    */
  def q26(s: SparkSession, dir: String): DataFrame =
    G.catalogSales(s, G.nSales(s, dir))
      .join(broadcast(G.customer(s)), col("cs_customer_sk") === col("c_customer_sk"))
      .join(broadcast(G.promotion(s)), col("cs_promo_sk") === col("p_promo_sk"))
      .where(col("c_birth_year").between(1950, 1959) &&
        col("p_channel_email") === "N" && col("p_channel_event") === "N")
      .groupBy(col("cs_item_sk"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("cs_quantity")).cast("double") / count(lit(1))).as("agg1"),
        (sum(col("cs_sales_price_c")).cast("double") / count(lit(1))).as("agg2"),
        (sum(col("cs_ext_discount_amt_c")).cast("double") / count(lit(1))).as("agg3"))

  /** TPC-DS q61: promoted vs total store revenue for one (state,
    * category, month) — the published pair of filtered scalar
    * subqueries fused into ONE conditional pass; ratio in integer
    * ppm.
    */
  def q61(s: SparkSession, dir: String): DataFrame =
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s)
        .where(col("d_year") === 1998 && col("d_moy") === 11)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s).where(col("i_category_id") === 10)),
        col("ss_item_sk") === col("i_item_sk"))
      .join(broadcast(G.store(s).where(col("s_state") === "KY")),
        col("ss_store_sk") === col("s_store_sk"))
      .join(broadcast(G.promotion(s)), col("ss_promo_sk") === col("p_promo_sk"))
      .agg(
        sum(when(col("p_channel_email") === "Y" || col("p_channel_event") === "Y",
          col("ss_ext_sales_price_c")).otherwise(0L)).as("promotions_c"),
        sum(col("ss_ext_sales_price_c")).as("total_c"))
      .withColumn("promo_ratio_ppm", expr("promotions_c * 1000000 div total_c"))

  /** TPC-DS q21: per (warehouse, item) on-hand totals for the 30 days
    * either side of a pivot date, kept when the after/before ratio
    * stays inside [2/3, 3/2] — the before/after split is one
    * conditional pass over the date-pruned inventory scan, and the
    * ratio band is cross-multiplied exact integers.
    */
  def q21(s: SparkSession, dir: String): DataFrame =
    G.inventory(s)
      .where(col("inv_date_sk").between(970, 1030))
      .join(broadcast(G.item(s).where(col("i_current_price_c").between(100, 1500))),
        col("inv_item_sk") === col("i_item_sk"))
      .join(broadcast(G.warehouse(s)),
        col("inv_warehouse_sk") === col("w_warehouse_sk"))
      .groupBy(col("w_warehouse_name"), col("inv_item_sk"))
      .agg(
        sum(when(col("inv_date_sk") < 1000, col("inv_quantity_on_hand")).otherwise(0L))
          .as("inv_before"),
        sum(when(col("inv_date_sk") >= 1000, col("inv_quantity_on_hand")).otherwise(0L))
          .as("inv_after"))
      .where(col("inv_before") > 0 &&
        col("inv_after") * 3 >= col("inv_before") * 2 &&
        col("inv_after") * 2 <= col("inv_before") * 3)

  /** TPC-DS q37: items in a price band with 100–500 units on hand
    * during a 60-day window that actually sold on the catalog channel
    * — two EXISTS semi-joins onto the fixed-size item dim; the
    * catalog side collapses to distinct item keys before joining so
    * only keys cross the wire.
    */
  def q37(s: SparkSession, dir: String): DataFrame = {
    val invItems = G.inventory(s)
      .where(col("inv_date_sk").between(900, 960) &&
        col("inv_quantity_on_hand").between(100, 500))
      .select(col("inv_item_sk")).distinct()
    val soldItems = G.catalogSales(s, G.nSales(s, dir))
      .select(col("cs_item_sk")).distinct()
    G.item(s).where(col("i_current_price_c").between(2000, 5000))
      .join(invItems, col("i_item_sk") === col("inv_item_sk"), "left_semi")
      .join(soldItems, col("i_item_sk") === col("cs_item_sk"), "left_semi")
      .select(col("i_item_sk"), col("i_current_price_c"))
  }

  /** TPC-DS q82: the store-channel twin of q37. */
  def q82(s: SparkSession, dir: String): DataFrame = {
    val invItems = G.inventory(s)
      .where(col("inv_date_sk").between(400, 460) &&
        col("inv_quantity_on_hand").between(100, 500))
      .select(col("inv_item_sk")).distinct()
    val soldItems = G.storeSales(s, G.nSales(s, dir))
      .select(col("ss_item_sk")).distinct()
    G.item(s).where(col("i_current_price_c").between(5000, 8000))
      .join(invItems, col("i_item_sk") === col("inv_item_sk"), "left_semi")
      .join(soldItems, col("i_item_sk") === col("ss_item_sk"), "left_semi")
      .select(col("i_item_sk"), col("i_current_price_c"))
  }

  /** TPC-DS q39: (warehouse, item) pairs whose on-hand quantity is
    * high-variance in BOTH March and April 2000. The published cov =
    * stdev/mean > 1 never fires on uniform quantities, so the cut is
    * cov > 4/5, decided in exact integers from (n, Σx, Σx²):
    * den²·n·(n·Σx² − (Σx)²) > num²·(n−1)·(Σx)² — sample variance
    * cross-multiplied against the squared mean, no sqrt, no float.
    */
  def q39(s: SparkSession, dir: String): DataFrame = {
    val m = G.inventory(s)
      .join(broadcast(G.dateDim(s)
        .where(col("d_year") === 2000 && col("d_moy").isin(3, 4))),
        col("inv_date_sk") === col("d_date_sk"))
      .groupBy(col("inv_warehouse_sk"), col("inv_item_sk"), col("d_moy"))
      .agg(count(lit(1)).as("n"),
        sum(col("inv_quantity_on_hand")).as("qsum"),
        sum(col("inv_quantity_on_hand") * col("inv_quantity_on_hand")).as("qsumsq"))
      .where(col("qsum") > 0 &&
        col("n") * (col("n") * col("qsumsq") - col("qsum") * col("qsum")) * 25 >
          (col("n") - 1) * col("qsum") * col("qsum") * 16)
    val m1 = m.where(col("d_moy") === 3)
      .select(col("inv_warehouse_sk").as("w_sk"), col("inv_item_sk").as("i_sk"),
        col("qsum").as("mean1_sum"), col("n").as("n1"))
    val m2 = m.where(col("d_moy") === 4)
      .select(col("inv_warehouse_sk").as("w_sk2"), col("inv_item_sk").as("i_sk2"),
        col("qsum").as("mean2_sum"), col("n").as("n2"))
    m1.join(m2, col("w_sk") === col("w_sk2") && col("i_sk") === col("i_sk2"))
      .select(col("w_sk"), col("i_sk"), col("n1"), col("mean1_sum"),
        col("n2"), col("mean2_sum"))
  }

  /** Per-channel (item-key, revenue) slice for one month/quarter —
    * the shared building block of the q33/q56/q60 family: each
    * channel aggregates to item grain FIRST, then the union re-agg
    * runs over three item-sized frames (never raw fact rows).
    */
  private def channelItemRev(s: SparkSession, dir: String, dd: DataFrame)
      : Seq[DataFrame] = {
    val n = G.nSales(s, dir)
    val ddB = broadcast(dd)
    Seq(
      G.storeSales(s, n).join(ddB, col("ss_sold_date_sk") === col("d_date_sk"))
        .groupBy(col("ss_item_sk").as("item_sk"))
        .agg(sum(col("ss_ext_sales_price_c")).as("rev")),
      G.catalogSales(s, n).join(ddB, col("cs_sold_date_sk") === col("d_date_sk"))
        .groupBy(col("cs_item_sk").as("item_sk"))
        .agg(sum(col("cs_ext_sales_price_c")).as("rev")),
      G.webSales(s, n).join(ddB, col("ws_sold_date_sk") === col("d_date_sk"))
        .groupBy(col("ws_item_sk").as("item_sk"))
        .agg(sum(col("ws_ext_sales_price_c")).as("rev")))
  }

  /** TPC-DS q33: total revenue per manufacturer across all three
    * channels for one category and month — three per-channel
    * item-grain aggregates UNION ALL'd, then one re-aggregate; the
    * item dim broadcasts onto the aggregated (item, rev) frames, not
    * onto facts.
    */
  def q33(s: SparkSession, dir: String): DataFrame = {
    val dd = G.dateDim(s).where(col("d_year") === 1998 && col("d_moy") === 3)
    val it = broadcast(G.item(s).where(col("i_category_id") === 3))
    channelItemRev(s, dir, dd)
      .map(_.join(it, col("item_sk") === col("i_item_sk"))
        .select(col("i_manufact_id"), col("rev")))
      .reduce(_ unionAll _)
      .groupBy(col("i_manufact_id"))
      .agg(sum(col("rev")).as("total_sales_c"))
  }

  /** TPC-DS q60: the by-item variant of q33 (category 7, September). */
  def q60(s: SparkSession, dir: String): DataFrame = {
    val dd = G.dateDim(s).where(col("d_year") === 1999 && col("d_moy") === 9)
    val it = broadcast(G.item(s).where(col("i_category_id") === 7))
    channelItemRev(s, dir, dd)
      .map(_.join(it, col("item_sk") === col("i_item_sk"))
        .select(col("i_item_sk").as("item"), col("rev")))
      .reduce(_ unionAll _)
      .groupBy(col("item"))
      .agg(sum(col("rev")).as("total_sales_c"))
  }

  /** TPC-DS q58: items whose Q1-1998 revenue is BALANCED across the
    * three channels — every channel within ±50% of the three-channel
    * average (the published ±10% band never fires on uniform
    * multiplicative-hash revenue; the cut stays cross-multiplied
    * exact integers: 5·S ≤ 30·rev ≤ 15·S with S the channel sum).
    */
  def q58(s: SparkSession, dir: String): DataFrame = {
    val dd = G.dateDim(s).where(col("d_year") === 1998 && col("d_qoy") === 1)
    val Seq(ss, cs, ws) = channelItemRev(s, dir, dd).zip(Seq("ss", "cs", "ws"))
      .map { case (df, p) =>
        df.select(col("item_sk").as(s"${p}_item"), col("rev").as(s"${p}_rev"))
      }
    ss.join(cs, col("ss_item") === col("cs_item"))
      .join(ws, col("ss_item") === col("ws_item"))
      .withColumn("total3", col("ss_rev") + col("cs_rev") + col("ws_rev"))
      .where(
        col("ss_rev") * 30 >= col("total3") * 5 && col("ss_rev") * 30 <= col("total3") * 15 &&
        col("cs_rev") * 30 >= col("total3") * 5 && col("cs_rev") * 30 <= col("total3") * 15 &&
        col("ws_rev") * 30 >= col("total3") * 5 && col("ws_rev") * 30 <= col("total3") * 15)
      .select(col("ss_item").as("item"), col("ss_rev"), col("cs_rev"), col("ws_rev"))
  }

  /** TPC-DS q2: catalog+web weekly revenue pivoted by day of week,
    * compared against the same week one year out — the union collapses
    * to (week, dow) grain in one pass, the YoY comparison self-joins
    * the 104-row aggregate, ratios in NULL-guarded integer ppm.
    */
  def q2(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s))
    // ONE pass over the union: fold both years onto the same 52-row
    // week-in-year grain with per-(dow, half) conditional sums. The
    // earlier form aggregated the SAME union twice (y1/y2 filters on
    // one `wk` frame — Catalyst does not share the subtree, so the
    // plan scanned catalog+web FULLY twice and sort-merge self-joined;
    // r16 measured 2.1 s) — the YoY self-join collapses into the
    // aggregate, 2 fact scans → 1, the join's week-presence semantics
    // carried by max-flags per half.
    val dows = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    val wk = G.catalogSales(s, n)
      .select(col("cs_sold_date_sk").as("sold_sk"), col("cs_ext_sales_price_c").as("p"))
      .unionAll(G.webSales(s, n)
        .select(col("ws_sold_date_sk").as("sold_sk"), col("ws_ext_sales_price_c").as("p")))
      .join(dd, col("sold_sk") === col("d_date_sk"))
      .where(col("d_week_seq") <= 104)
      .withColumn("wk", when(col("d_week_seq") <= 52, col("d_week_seq"))
        .otherwise(col("d_week_seq") - 52))
      .groupBy(col("wk"))
      .agg(
        max(when(col("d_week_seq") <= 52, 1).otherwise(0)).as("has1"),
        dows.zipWithIndex.flatMap { case (d, i) => Seq(
          sum(when(col("d_week_seq") <= 52 && col("d_dow") === i, col("p"))
            .otherwise(0L)).as(s"${d}_sales"),
          sum(when(col("d_week_seq") > 52 && col("d_dow") === i, col("p"))
            .otherwise(0L)).as(s"${d}2"))
        } :+ max(when(col("d_week_seq") > 52, 1).otherwise(0)).as("has2"): _*)
    dows
      .foldLeft(wk.where(col("has1") === 1 && col("has2") === 1)) { (df, d) =>
        df.withColumn(s"${d}_ratio_ppm",
          expr(s"${d}_sales * 1000000 div nullif(${d}2, 0)"))
      }
      .select(col("wk").as("d_week_seq") +: dows.map(d => col(s"${d}_ratio_ppm")): _*)
  }

  /** TPC-DS q71: brand revenue in the breakfast (7–8h) and dinner
    * (19–20h) windows across all three channels for one manager's
    * items, one month — the three facts union as narrow (item, time,
    * price) projections BEFORE the broadcast time/item joins.
    */
  def q71(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val facts = G.storeSales(s, n)
      .select(col("ss_item_sk").as("item_sk"), col("ss_sold_time_sk").as("time_sk"),
        col("ss_sold_date_sk").as("sold_sk"), col("ss_ext_sales_price_c").as("p"))
      .unionAll(G.catalogSales(s, n)
        .select(col("cs_item_sk"), col("cs_sold_time_sk"), col("cs_sold_date_sk"),
          col("cs_ext_sales_price_c")))
      .unionAll(G.webSales(s, n)
        .select(col("ws_item_sk"), col("ws_sold_time_sk"), col("ws_sold_date_sk"),
          col("ws_ext_sales_price_c")))
    facts
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2001 && col("d_moy") === 12)),
        col("sold_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s).where(col("i_manager_id") === 1)),
        col("item_sk") === col("i_item_sk"))
      .join(broadcast(G.timeDim(s)
        .where(col("t_hour").isin(7L, 8L, 19L, 20L))),
        col("time_sk") === col("t_time_sk"))
      .groupBy(col("i_brand_id"), col("i_brand"), col("t_hour"))
      .agg(sum(col("p")).as("ext_price_c"))
  }

  /** TPC-DS q15: catalog revenue by customer zip for one quarter,
    * keeping low-band zips or big-ticket rows (the published zip
    * list / >$500 disjunction on this schema's closed-form zips).
    */
  def q15(s: SparkSession, dir: String): DataFrame =
    G.catalogSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000 && col("d_qoy") === 2)),
        col("cs_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.customer(s)), col("cs_customer_sk") === col("c_customer_sk"))
      .where(col("c_customer_sk") * 29 % 100 < 10 || col("cs_ext_sales_price_c") > 900000)
      .groupBy(col("c_zip"))
      .agg(sum(col("cs_sales_price_c")).as("total_sales_c"))

  /** TPC-DS q45: web revenue by customer zip for one quarter, keeping
    * a zip band or a small fixed item-key set (the published "zip in
    * list OR item in subquery list" disjunction).
    */
  def q45(s: SparkSession, dir: String): DataFrame =
    G.webSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1999 && col("d_qoy") === 3)),
        col("ws_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.customer(s)), col("ws_bill_customer_sk") === col("c_customer_sk"))
      .where(col("c_customer_sk") * 29 % 100 >= 90 ||
        col("ws_item_sk").isin(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L))
      .groupBy(col("c_zip"))
      .agg(sum(col("ws_ext_sales_price_c")).as("total_sales_c"))

  /** TPC-DS q22: average on-hand quantity rolled up the (category,
    * brand) hierarchy for one year of snapshots — one date-pruned
    * inventory pass into a ROLLUP aggregate; the average divides two
    * exact integer sums once at the end.
    */
  def q22(s: SparkSession, dir: String): DataFrame =
    G.inventory(s)
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2001)),
        col("inv_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("inv_item_sk") === col("i_item_sk"))
      .rollup(col("i_category"), col("i_brand"))
      .agg((sum(col("inv_quantity_on_hand")).cast("double") / count(lit(1))).as("qoh"))

  /** TPC-DS q29-shape: customers who returned a store purchase and
    * later bought on the catalog channel — ss⋈sr on (ticket, item),
    * then sr⋈cs keyed on CUSTOMER with the after-the-return residual
    * (the published item+customer key is vacuously sparse on
    * independent channel mixers; the customer chain is the query's
    * intent). Quantities sum per store.
    */
  def q29(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd99 = broadcast(G.dateDim(s).where(col("d_year") === 1999))
    val returned = G.storeSales(s, n)
      .join(dd99, col("ss_sold_date_sk") === col("d_date_sk"))
      .join(G.storeReturns(s, n),
        col("ss_ticket_number") === col("sr_ticket_number") &&
          col("ss_item_sk") === col("sr_item_sk"))
      .select(col("ss_store_sk"), col("ss_quantity"), col("sr_return_quantity"),
        col("sr_customer_sk"), col("sr_returned_date_sk"))
    val cs = G.catalogSales(s, n)
      .join(broadcast(G.dateDim(s).where(col("d_year").isin(1999, 2000))
        .select(col("d_date_sk").as("cd_sk"))),
        col("cs_sold_date_sk") === col("cd_sk"))
      .select(col("cs_customer_sk"), col("cs_quantity"), col("cs_sold_date_sk"))
    returned
      .join(cs, col("sr_customer_sk") === col("cs_customer_sk") &&
        col("cs_sold_date_sk") > col("sr_returned_date_sk"))
      .groupBy(col("ss_store_sk"))
      .agg(
        sum(col("ss_quantity")).as("store_sales_quantity"),
        sum(col("sr_return_quantity")).as("store_returns_quantity"),
        sum(col("cs_quantity")).as("catalog_sales_quantity"))
  }

  /** TPC-DS q40: catalog net revenue (sales minus any return) per
    * (warehouse, item) split before/after a pivot date — returns ride
    * a LEFT JOIN on the order key (1/17th of sales, the natural build
    * side), the split is one conditional pass.
    */
  def q40(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    G.catalogSales(s, n)
      .where(col("cs_sold_date_sk").between(470, 530))
      .join(broadcast(G.item(s).where(col("i_current_price_c").between(100, 1500))),
        col("cs_item_sk") === col("i_item_sk"))
      .join(broadcast(G.warehouse(s)), col("cs_warehouse_sk") === col("w_warehouse_sk"))
      .join(G.catalogReturns(s, n)
        .select(col("cr_order_number"), col("cr_return_amt_c")),
        col("cs_order_number") === col("cr_order_number"), "left")
      .withColumn("net_c", col("cs_ext_sales_price_c") - coalesce(col("cr_return_amt_c"), lit(0L)))
      .groupBy(col("w_warehouse_name"), col("cs_item_sk"))
      .agg(
        sum(when(col("cs_sold_date_sk") < 500, col("net_c")).otherwise(0L)).as("sales_before"),
        sum(when(col("cs_sold_date_sk") >= 500, col("net_c")).otherwise(0L)).as("sales_after"))
  }

  /** TPC-DS q5: per-channel sales / returns / profit report rolled up
    * the (channel, unit) hierarchy — each channel unions its sales
    * and returns facts as (channel, unit, sales, returns, profit)
    * deltas, one ROLLUP aggregate on top; returns book their refund
    * as negative profit.
    */
  def q5(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    def leg(channel: String, unit: org.apache.spark.sql.Column, sales: org.apache.spark.sql.Column,
        returns: org.apache.spark.sql.Column, profit: org.apache.spark.sql.Column)(df: DataFrame) =
      df.select(lit(channel).as("channel"), unit.as("unit_sk"),
        sales.as("sales_c"), returns.as("returns_c"), profit.as("profit_c"))
    val legs = Seq(
      leg("store channel", col("ss_store_sk"), col("ss_ext_sales_price_c"), lit(0L),
        col("ss_net_profit_c"))(G.storeSales(s, n)),
      leg("store channel", col("sr_store_sk"), lit(0L), col("sr_return_amt_c"),
        -col("sr_return_amt_c"))(G.storeReturns(s, n)),
      leg("catalog channel", col("cs_call_center_sk"), col("cs_ext_sales_price_c"), lit(0L),
        col("cs_net_profit_c"))(G.catalogSales(s, n)),
      leg("catalog channel", lit(0L), lit(0L), col("cr_return_amt_c"),
        -col("cr_return_amt_c"))(G.catalogReturns(s, n)),
      leg("web channel", col("ws_web_site_sk"), col("ws_ext_sales_price_c"), lit(0L),
        col("ws_net_profit_c"))(G.webSales(s, n)),
      leg("web channel", lit(0L), lit(0L), col("wr_return_amt_c"),
        -col("wr_return_amt_c"))(G.webReturns(s, n)))
    legs.reduce(_ unionAll _)
      .rollup(col("channel"), col("unit_sk"))
      .agg(sum(col("sales_c")).as("sales_c"), sum(col("returns_c")).as("returns_c"),
        sum(col("profit_c")).as("profit_c"))
  }

  /** TPC-DS q49: the ten worst-return-rate items per channel — each
    * channel inner-joins its returns (the 1/11–1/17 build side) to
    * sales on the order key, collapses to item grain, unions the
    * three item-sized frames, and ranks inside each channel; the
    * rank ≤ 10 cut plans as WindowGroupLimit so no channel ever
    * sorts item-wide, and the rate is integer ppm.
    */
  def q49(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = G.nSales(s, dir)
    def channel(name: String, sales: DataFrame, saleKey: String, saleItem: String,
        qty: String, rets: DataFrame, retKey: String, retQty: String): DataFrame =
      sales.join(rets, col(saleKey) === col(retKey) &&
          col(saleItem) === col(s"${retKey.take(3)}item_sk"))
        .groupBy(col(saleItem).as("item"))
        .agg(sum(col(retQty)).as("ret"), sum(col(qty)).as("sold"))
        .select(lit(name).as("channel"), col("item"),
          expr("ret * 1000000 div sold").as("return_ratio_ppm"))
    val store = channel("store", G.storeSales(s, n), "ss_ticket_number", "ss_item_sk",
      "ss_quantity", G.storeReturns(s, n), "sr_ticket_number", "sr_return_quantity")
    val cat = channel("catalog", G.catalogSales(s, n), "cs_order_number", "cs_item_sk",
      "cs_quantity", G.catalogReturns(s, n), "cr_order_number", "cr_return_quantity")
    val web = channel("web", G.webSales(s, n), "ws_order_number", "ws_item_sk",
      "ws_quantity", G.webReturns(s, n), "wr_order_number", "wr_return_quantity")
    store.unionAll(cat).unionAll(web)
      .withColumn("rnk", rank().over(
        Window.partitionBy(col("channel")).orderBy(col("return_ratio_ppm").desc)))
      .where(col("rnk") <= 10)
  }

  /** TPC-DS q63: manager months whose revenue strays more than 10%
    * from the manager's yearly monthly average — the deviation cut
    * |rev·n − S|·10 > S·n runs in exact integers over the manager-
    * sized aggregate (the window never sees fact rows).
    */
  def q63(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("ss_item_sk") === col("i_item_sk"))
      .groupBy(col("i_manager_id"), col("d_moy"))
      .agg(sum(col("ss_ext_sales_price_c")).as("sum_sales"))
      .withColumn("yearly_sum", sum(col("sum_sales")).over(
        Window.partitionBy(col("i_manager_id"))))
      .withColumn("n_months", count(lit(1)).over(
        Window.partitionBy(col("i_manager_id"))))
      .where(abs(col("sum_sales") * col("n_months") - col("yearly_sum")) * 10 >
        col("yearly_sum"))
      .select(col("i_manager_id"), col("d_moy"), col("sum_sales"), col("yearly_sum"))
  }

  /** TPC-DS q66: the warehouse shipping report — catalog+web volume
    * for two carriers pivoted into twelve monthly columns, one
    * conditional pass over the unioned narrow projections.
    */
  def q66(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val carriers = broadcast(G.shipMode(s)
      .where(col("sm_carrier").isin("BARIAN", "UPS")))
    val months = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep",
      "oct", "nov", "dec")
    G.webSales(s, n)
      .select(col("ws_warehouse_sk").as("wh_sk"), col("ws_ship_mode_sk").as("sm_sk"),
        col("ws_sold_date_sk").as("sold_sk"), col("ws_ext_sales_price_c").as("p"))
      .unionAll(G.catalogSales(s, n)
        .select(col("cs_warehouse_sk"), col("cs_ship_mode_sk"), col("cs_sold_date_sk"),
          col("cs_ext_sales_price_c")))
      .join(carriers, col("sm_sk") === col("sm_ship_mode_sk"))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("sold_sk") === col("d_date_sk"))
      .join(broadcast(G.warehouse(s)), col("wh_sk") === col("w_warehouse_sk"))
      .groupBy(col("w_warehouse_name"))
      .agg(
        sum(when(col("d_moy") === 1, col("p")).otherwise(0L)).as(s"${months.head}_sales"),
        months.zipWithIndex.tail.map { case (m, i) =>
          sum(when(col("d_moy") === i + 1, col("p")).otherwise(0L)).as(s"${m}_sales")
        }: _*)
  }

  /** TPC-DS q69: customers who bought in a store during one quarter
    * but on neither catalog nor web — distinct key sets per channel,
    * one semi and two anti joins (keys cross the wire, never fact
    * rows), counted per birth decade.
    */
  def q69(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year") === 2000 && col("d_qoy") === 1))
    val st = G.storeSales(s, n).join(dd, col("ss_sold_date_sk") === col("d_date_sk"))
      .select(col("ss_customer_sk")).distinct()
    val wb = G.webSales(s, n).join(dd, col("ws_sold_date_sk") === col("d_date_sk"))
      .select(col("ws_bill_customer_sk")).distinct()
    val ct = G.catalogSales(s, n).join(dd, col("cs_sold_date_sk") === col("d_date_sk"))
      .select(col("cs_customer_sk")).distinct()
    st
      .join(wb, col("ss_customer_sk") === col("ws_bill_customer_sk"), "left_anti")
      .join(ct, col("ss_customer_sk") === col("cs_customer_sk"), "left_anti")
      .join(broadcast(G.customer(s)), col("ss_customer_sk") === col("c_customer_sk"))
      .groupBy(expr("(c_birth_year div 10) * 10").as("birth_decade"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Distinct customer key set for one channel-year — the q38/q87
    * building block; only keys ever cross the wire. */
  private def custSet(s: SparkSession, dir: String, year: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year") === year))
    (G.storeSales(s, n).join(dd, col("ss_sold_date_sk") === col("d_date_sk"))
      .select(col("ss_customer_sk").as("c_sk")).distinct(),
     G.catalogSales(s, n).join(dd, col("cs_sold_date_sk") === col("d_date_sk"))
      .select(col("cs_customer_sk").as("c_sk")).distinct(),
     G.webSales(s, n).join(dd, col("ws_sold_date_sk") === col("d_date_sk"))
      .select(col("ws_bill_customer_sk").as("c_sk")).distinct())
  }

  /** TPC-DS q38: customers active on ALL three channels in one year —
    * INTERSECT of the three distinct key sets, one count out.
    */
  def q38(s: SparkSession, dir: String): DataFrame = {
    val (st, ct, wb) = custSet(s, dir, 2000)
    st.intersect(ct).intersect(wb).agg(count(lit(1)).as("cnt"))
  }

  /** TPC-DS q87: store customers on NEITHER other channel in one year
    * — the EXCEPT chain over the same key sets.
    */
  def q87(s: SparkSession, dir: String): DataFrame = {
    val (st, ct, wb) = custSet(s, dir, 2000)
    st.except(ct).except(wb).agg(count(lit(1)).as("cnt"))
  }

  /** TPC-DS q31: zip bands where web revenue grew FASTER than store
    * revenue across consecutive 2000 quarters — each channel collapses
    * to (zip, qoy) grain with the quarter pivot as conditional sums
    * (one pass per channel), and both growth comparisons cross-
    * multiply exact integers on the 100-row joined frame.
    */
  def q31(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s)
      .where(col("d_year") === 2000 && col("d_qoy").between(1, 3)))
    val cust = broadcast(G.customer(s))
    def quarters(df: DataFrame, dateK: String, custK: String, ext: String,
        p: String): DataFrame =
      df.join(dd, col(dateK) === col("d_date_sk"))
        .join(cust, col(custK) === col("c_customer_sk"))
        .groupBy(col("c_zip").as(s"${p}_zip"))
        .agg(
          sum(when(col("d_qoy") === 1, col(ext)).otherwise(0L)).as(s"${p}1"),
          sum(when(col("d_qoy") === 2, col(ext)).otherwise(0L)).as(s"${p}2"),
          sum(when(col("d_qoy") === 3, col(ext)).otherwise(0L)).as(s"${p}3"))
    val ss = quarters(G.storeSales(s, n), "ss_sold_date_sk", "ss_customer_sk",
      "ss_ext_sales_price_c", "ss")
    val ws = quarters(G.webSales(s, n), "ws_sold_date_sk", "ws_bill_customer_sk",
      "ws_ext_sales_price_c", "ws")
    ss.join(ws, col("ss_zip") === col("ws_zip"))
      .where(col("ss1") > 0 && col("ss2") > 0 && col("ws1") > 0 && col("ws2") > 0 &&
        col("ws2") * col("ss1") > col("ss2") * col("ws1") &&
        col("ws3") * col("ss2") > col("ss3") * col("ws2"))
      .select(col("ss_zip").as("zip"), col("ss1"), col("ss2"), col("ss3"),
        col("ws1"), col("ws2"), col("ws3"))
  }

  /** TPC-DS q75: brands in one category whose net unit sales (returns
    * subtracted) DECLINED more than 10% year over year (item grain; brand grain is 5 stationary rows on this schema) — every channel
    * nets its returns on the order key, the union collapses to item
    * grain in ONE pass (per-year conditional sums — r17 folded the
    * former year self-join, which evaluated the 6-fact-scan union
    * twice), and the decline cut is curr·10 < prev·9 in exact
    * integers.
    */
  def q75(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year").isin(1999, 2000)))
    val it = broadcast(G.item(s).where(col("i_category_id") === 4))
    def net(sales: DataFrame, dateK: String, itemK: String, qty: String,
        orderK: String, rets: DataFrame, retOrder: String, retItem: String,
        retQty: String): DataFrame =
      sales
        .join(rets.select(col(retOrder), col(retItem), col(retQty)),
          col(orderK) === col(retOrder) && col(itemK) === col(retItem), "left")
        .join(dd, col(dateK) === col("d_date_sk"))
        .join(it, col(itemK) === col("i_item_sk"))
        .select(col("d_year"), col("i_brand_id"), col("i_item_sk").as("item"),
          (col(qty) - coalesce(col(retQty), lit(0L))).as("net_qty"))
    val legs = Seq(
      net(G.storeSales(s, n), "ss_sold_date_sk", "ss_item_sk", "ss_quantity",
        "ss_ticket_number", G.storeReturns(s, n), "sr_ticket_number", "sr_item_sk",
        "sr_return_quantity"),
      net(G.catalogSales(s, n), "cs_sold_date_sk", "cs_item_sk", "cs_quantity",
        "cs_order_number", G.catalogReturns(s, n), "cr_order_number", "cr_item_sk",
        "cr_return_quantity"),
      net(G.webSales(s, n), "ws_sold_date_sk", "ws_item_sk", "ws_quantity",
        "ws_order_number", G.webReturns(s, n), "wr_order_number", "wr_item_sk",
        "wr_return_quantity"))
    // YoY pivot folded into ONE pass (r17 — the q2/q14 treatment,
    // guide §2.4/§1.2): the r16 plan evaluated the whole 6-fact-scan
    // union TWICE (Catalyst does not share the two-consumer byYear
    // aggregate between the prev/curr branches) and sort-merge-joined
    // the copies. One item-grain aggregate with per-year conditional
    // sums replaces the self-join: i_brand_id is functionally
    // dependent on item (a dim attribute), a conditional sum is NULL
    // exactly when the year had no rows (the inner join's presence
    // semantics — prev_cnt > 0 subsumes the 1999 side, the explicit
    // isNotNull reproduces the 2000 side), so the fold emits exactly
    // the joined rows.
    val byItem = legs.reduce(_ unionAll _)
      .groupBy(col("item"))
      .agg(max(col("i_brand_id")).as("i_brand_id"),
        sum(when(col("d_year") === 1999, col("net_qty"))).as("prev_cnt"),
        sum(when(col("d_year") === 2000, col("net_qty"))).as("curr_cnt"))
    byItem
      .where(col("curr_cnt").isNotNull &&
        col("prev_cnt") > 0 && col("curr_cnt") * 10 < col("prev_cnt") * 9)
      .select(col("i_brand_id"), col("item"),
        col("prev_cnt"), col("curr_cnt"),
        (col("curr_cnt") - col("prev_cnt")).as("sales_cnt_diff"))
  }

  /** TPC-DS q18: catalog quantity/price/discount averages rolled up
    * the (birth-decade, zip) hierarchy — exact integer sums divided
    * once per rollup cell.
    */
  def q18(s: SparkSession, dir: String): DataFrame =
    G.catalogSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1998)),
        col("cs_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.customer(s)), col("cs_customer_sk") === col("c_customer_sk"))
      .withColumn("birth_decade", expr("(c_birth_year div 10) * 10"))
      .rollup(col("birth_decade"), col("c_zip"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("cs_quantity")).cast("double") / count(lit(1))).as("agg1"),
        (sum(col("cs_sales_price_c")).cast("double") / count(lit(1))).as("agg2"),
        (sum(col("cs_ext_discount_amt_c")).cast("double") / count(lit(1))).as("agg3"))

  /** TPC-DS q12 (web) / q20 (catalog): per-item revenue share within
    * its class for a category slice — q98's share window on the other
    * two channels; the window runs over the item-sized aggregate and
    * the ratio is integer ppm.
    */
  private def shareWithinClass(fact: DataFrame, dateK: String, itemK: String,
      ext: String, s: SparkSession, cats: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    fact
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1999 && col("d_moy") === 2)),
        col(dateK) === col("d_date_sk"))
      .join(broadcast(G.item(s).where(col("i_category_id").isin(cats: _*))),
        col(itemK) === col("i_item_sk"))
      .groupBy(col("i_item_sk"), col("i_class"))
      .agg(sum(col(ext)).as("itemrevenue"))
      .withColumn("revenueratio_ppm",
        expr("itemrevenue * 1000000 div sum(itemrevenue) over (partition by i_class)"))
  }

  def q12(s: SparkSession, dir: String): DataFrame =
    shareWithinClass(G.webSales(s, G.nSales(s, dir)), "ws_sold_date_sk",
      "ws_item_sk", "ws_ext_sales_price_c", s, Seq(1L, 4L, 8L))

  def q20(s: SparkSession, dir: String): DataFrame =
    shareWithinClass(G.catalogSales(s, G.nSales(s, dir)), "cs_sold_date_sk",
      "cs_item_sk", "cs_ext_sales_price_c", s, Seq(2L, 5L, 9L))

  /** TPC-DS q36: gross-margin rollup over (category, class) with the
    * published rank-within-parent — margins in integer ppm, the rank
    * window partitioned by (hierarchy level, parent) over the rollup-
    * sized frame only.
    */
  def q36(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2001)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("ss_item_sk") === col("i_item_sk"))
      .rollup(col("i_category"), col("i_class"))
      .agg(
        sum(col("ss_net_profit_c")).as("profit_c"),
        sum(col("ss_ext_sales_price_c")).as("sales_c"),
        (grouping(col("i_category")) + grouping(col("i_class"))).as("lochierarchy"))
      .withColumn("gross_margin_ppm", expr("profit_c * 1000000 div sales_c"))
      .withColumn("rank_within_parent", rank().over(
        Window.partitionBy(col("lochierarchy"),
            when(col("lochierarchy") === 0, col("i_category")))
          .orderBy(col("gross_margin_ppm").asc)))
      .select(col("i_category"), col("i_class"), col("lochierarchy"),
        col("gross_margin_ppm"), col("rank_within_parent"))
  }

  /** TPC-DS q28: list-price average / count / DISTINCT count inside
    * six quantity bands — one scan, six conditional aggregate triples
    * (Catalyst's RewriteDistinctAggregates expands the multi-distinct
    * into one Expand pass; the published text is six cross-joined
    * subqueries, i.e. six scans).
    */
  def q28(s: SparkSession, dir: String): DataFrame = {
    val bands = Seq((1, 5), (6, 10), (11, 15), (16, 20), (21, 25), (26, 30))
    val aggs = bands.zipWithIndex.flatMap { case ((lo, hi), i) =>
      val in = col("ss_quantity").between(lo, hi)
      Seq(
        (sum(when(in, col("ss_list_price_c"))).cast("double") /
          sum(when(in, 1L).otherwise(0L))).as(s"b${i + 1}_lp"),
        sum(when(in, 1L).otherwise(0L)).as(s"b${i + 1}_cnt"),
        countDistinct(when(in, col("ss_list_price_c"))).as(s"b${i + 1}_cntd"))
    }
    G.storeSales(s, G.nSales(s, dir)).agg(aggs.head, aggs.tail: _*)
  }

  /** TPC-DS q48: total quantity sold under the published disjunction
    * of (birth cohort × price band) arms — one conditional scan.
    */
  def q48(s: SparkSession, dir: String): DataFrame =
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.customer(s)), col("ss_customer_sk") === col("c_customer_sk"))
      .where(
        (col("c_birth_year").between(1930, 1949) &&
          col("ss_sales_price_c").between(5000, 10000)) ||
        (col("c_birth_year").between(1950, 1969) &&
          col("ss_sales_price_c").between(100, 5000)) ||
        (col("c_birth_year").between(1970, 1989) &&
          col("ss_sales_price_c").between(3000, 8000)))
      .agg(sum(col("ss_quantity")).as("total_quantity"))

  /** TPC-DS q47: brand months straying >10% from the yearly monthly
    * mean, reported with the neighboring months' revenue (lag/lead
    * over the brand-month aggregate) — deviation cut in exact
    * integers, windows ordered by the unique month key.
    */
  def q47(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBrand = Window.partitionBy(col("i_brand_id"))
    val byMoy = byBrand.orderBy(col("d_moy"))
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("ss_item_sk") === col("i_item_sk"))
      .groupBy(col("i_brand_id"), col("d_moy"))
      .agg(sum(col("ss_ext_sales_price_c")).as("sum_sales"))
      .withColumn("yearly_sum", sum(col("sum_sales")).over(byBrand))
      .withColumn("n_months", count(lit(1)).over(byBrand))
      .withColumn("psum", lag(col("sum_sales"), 1).over(byMoy))
      .withColumn("nsum", lead(col("sum_sales"), 1).over(byMoy))
      .where(col("psum").isNotNull && col("nsum").isNotNull &&
        abs(col("sum_sales") * col("n_months") - col("yearly_sum")) * 10 >
          col("yearly_sum"))
      .select(col("i_brand_id"), col("d_moy"), col("sum_sales"), col("psum"),
        col("nsum"))
  }

  /** TPC-DS q51: (item, week) points where the WEB channel's running
    * cumulative revenue has overtaken the store channel's — per-channel
    * cumulative windows over (item, week) aggregates, FULL OUTER on
    * the sparse grids, then running-max windows carry each channel's
    * last seen cumulative across the other channel's weeks. Every
    * window runs over aggregate grain; facts are scanned once each.
    */
  def q51(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year") === 2000))
    def cume(fact: DataFrame, itemK: String, dateK: String, ext: String,
        p: String): DataFrame =
      fact.join(dd, col(dateK) === col("d_date_sk"))
        .groupBy(col(itemK).as(s"${p}_item"), col("d_week_seq").as(s"${p}_week"))
        .agg(sum(col(ext)).as(s"${p}_rev"))
        .withColumn(s"${p}_cume", sum(col(s"${p}_rev")).over(
          Window.partitionBy(col(s"${p}_item")).orderBy(col(s"${p}_week"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val web = cume(G.webSales(s, n), "ws_item_sk", "ws_sold_date_sk",
      "ws_ext_sales_price_c", "web")
    val st = cume(G.storeSales(s, n), "ss_item_sk", "ss_sold_date_sk",
      "ss_ext_sales_price_c", "st")
    val joined = web.join(st,
        col("web_item") === col("st_item") && col("web_week") === col("st_week"),
        "full_outer")
      .select(
        coalesce(col("web_item"), col("st_item")).as("item_sk"),
        coalesce(col("web_week"), col("st_week")).as("d_week_seq"),
        col("web_cume"), col("st_cume"))
    val carry = Window.partitionBy(col("item_sk")).orderBy(col("d_week_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("web_cumulative", max(col("web_cume")).over(carry))
      .withColumn("store_cumulative", max(col("st_cume")).over(carry))
      .where(col("web_cumulative") > col("store_cumulative"))
      .select(col("item_sk"), col("d_week_seq"), col("store_cumulative"),
        col("web_cumulative"))
  }

  /** TPC-DS q4: customers whose catalog AND web spend both grew
    * faster year-over-year than their store spend — q74's year pivot
    * run once per channel (one pass each), growth comparisons
    * cross-multiplied in exact integers on the customer-grain join.
    */
  def q4(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year").isin(1998, 1999)))
    def yearPivot(df: DataFrame, dateK: String, custK: String, ext: String,
        p: String): DataFrame =
      df.join(dd, col(dateK) === col("d_date_sk"))
        .groupBy(col(custK).as(s"${p}_cust"))
        .agg(
          sum(when(col("d_year") === 1998, col(ext)).otherwise(0L)).as(s"${p}1"),
          sum(when(col("d_year") === 1999, col(ext)).otherwise(0L)).as(s"${p}2"))
    val ss = yearPivot(G.storeSales(s, n), "ss_sold_date_sk", "ss_customer_sk",
      "ss_ext_sales_price_c", "ss")
    val cs = yearPivot(G.catalogSales(s, n), "cs_sold_date_sk", "cs_customer_sk",
      "cs_ext_sales_price_c", "cs")
    val ws = yearPivot(G.webSales(s, n), "ws_sold_date_sk", "ws_bill_customer_sk",
      "ws_ext_sales_price_c", "ws")
    ss.join(cs, col("ss_cust") === col("cs_cust"))
      .join(ws, col("ss_cust") === col("ws_cust"))
      .where(col("ss1") > 0 && col("cs1") > 0 && col("ws1") > 0 &&
        col("cs2") * col("ss1") > col("ss2") * col("cs1") &&
        col("ws2") * col("ss1") > col("ss2") * col("ws1"))
      .select(col("ss_cust").as("cust"), col("ss1"), col("ss2"), col("cs1"),
        col("cs2"), col("ws1"), col("ws2"))
  }

  /** TPC-DS q14-shape: brands of items that sold on ALL three
    * channels in 2000 (item-key INTERSECT), reported as each
    * channel's December revenue over those cross items — the
    * published iceberg threshold is dropped (documented), the
    * intersect feeds a broadcast semi-filter onto the channel union.
    */
  def q14(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year") === 2000)
      .select(col("d_date_sk"), col("d_moy")))
    // ONE scan per channel (was two: the per-channel year-2000
    // DISTINCT item sets for the INTERSECT, then the December union
    // again — 6 fact scans + 2 intersect shuffles; r16 measured
    // 2.4 s): fold presence AND December revenue into one
    // (item, channel) aggregate over the year-2000 join — a row's
    // existence IS the channel-presence bit the intersect computed —
    // then keep items whose channel count is 3 via one window over
    // the item-bounded aggregate. dec_n > 0 drops the (item, channel)
    // groups the December join used to drop.
    val union = G.storeSales(s, n)
      .select(lit("store").as("channel"), col("ss_item_sk").as("item"),
        col("ss_sold_date_sk").as("sold_sk"), col("ss_ext_sales_price_c").as("p"))
      .unionAll(G.catalogSales(s, n)
        .select(lit("catalog"), col("cs_item_sk"), col("cs_sold_date_sk"),
          col("cs_ext_sales_price_c")))
      .unionAll(G.webSales(s, n)
        .select(lit("web"), col("ws_item_sk"), col("ws_sold_date_sk"),
          col("ws_ext_sales_price_c")))
    val perItemCh = union
      .join(dd, col("sold_sk") === col("d_date_sk"))
      .groupBy(col("item"), col("channel"))
      .agg(sum(when(col("d_moy") === 12, col("p")).otherwise(0L)).as("dec_p"),
        sum(when(col("d_moy") === 12, 1L).otherwise(0L)).as("dec_n"))
    perItemCh
      .withColumn("nch", count(lit(1)).over(Window.partitionBy(col("item"))))
      .where(col("nch") === 3 && col("dec_n") > 0)
      .join(broadcast(G.item(s)), col("item") === col("i_item_sk"))
      .groupBy(col("channel"), col("i_brand_id"))
      .agg(sum(col("dec_p")).as("sales_c"), sum(col("dec_n")).as("number_sales"))
  }

  /** TPC-DS q72: catalog orders at stock-out risk — the week-after
    * inventory snapshot holds fewer units than the order wants. The
    * published three-date-dim correlation collapses to an exact
    * THREE-KEY equi-join (item, warehouse, sold-week+1 = snapshot
    * week): zero fan-out, no range residual, and the promo/total
    * split is one conditional aggregate.
    */
  def q72(s: SparkSession, dir: String): DataFrame = {
    val inv = G.inventory(s)
      .select(col("inv_item_sk"), col("inv_warehouse_sk"),
        expr("(inv_date_sk - 1) div 7 + 1").as("inv_week"),
        col("inv_quantity_on_hand"))
    G.catalogSales(s, G.nSales(s, dir))
      .join(broadcast(G.promotion(s)), col("cs_promo_sk") === col("p_promo_sk"))
      .withColumn("sold_week", expr("(cs_sold_date_sk - 1) div 7 + 1"))
      .join(inv,
        col("cs_item_sk") === col("inv_item_sk") &&
          col("cs_warehouse_sk") === col("inv_warehouse_sk") &&
          col("inv_week") === col("sold_week") + 1)
      .where(col("inv_quantity_on_hand") < col("cs_quantity"))
      .join(broadcast(G.warehouse(s)), col("cs_warehouse_sk") === col("w_warehouse_sk"))
      .groupBy(col("cs_item_sk"), col("w_warehouse_name"))
      .agg(
        sum(when(col("p_channel_email") === "Y" || col("p_channel_event") === "Y", 1L)
          .otherwise(0L)).as("promo"),
        count(lit(1)).as("total_cnt"))
  }

  /** TPC-DS q44: the ten best and ten worst store items by average
    * profit, paired rank-for-rank. Averages floor to integer
    * per-mille (sum·1000 div cnt) so the ordering is engine-exact,
    * and row_number breaks residual ties on the item key — both
    * engines produce the identical pairing.
    */
  def q44(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byItem = G.storeSales(s, G.nSales(s, dir))
      .groupBy(col("ss_item_sk"))
      .agg(expr("sum(ss_net_profit_c) * 1000 div count(1)").as("avg_profit_pm"))
    val best = byItem.withColumn("rnk", row_number().over(
        Window.orderBy(col("avg_profit_pm").desc, col("ss_item_sk"))))
      .where(col("rnk") <= 10)
      .select(col("rnk"), col("ss_item_sk").as("best_performing"))
    val worst = byItem.withColumn("rnk", row_number().over(
        Window.orderBy(col("avg_profit_pm").asc, col("ss_item_sk"))))
      .where(col("rnk") <= 10)
      .select(col("rnk").as("rnk_w"), col("ss_item_sk").as("worst_performing"))
    best.join(worst, col("rnk") === col("rnk_w"))
      .select(col("rnk"), col("best_performing"), col("worst_performing"))
  }

  /** TPC-DS q91: call-center catalog-return losses by return month
    * for one birth cohort — the return rides its sale's call center
    * through the order-key join (returns are the 1/17 probe side).
    */
  def q91(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    G.catalogReturns(s, n)
      .join(G.catalogSales(s, n)
        .select(col("cs_order_number"), col("cs_call_center_sk")),
        col("cr_order_number") === col("cs_order_number"))
      .join(broadcast(G.callCenter(s)),
        col("cs_call_center_sk") === col("cc_call_center_sk"))
      .join(broadcast(G.customer(s).where(col("c_birth_year") < 1940)),
        col("cr_customer_sk") === col("c_customer_sk"))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("cr_returned_date_sk") === col("d_date_sk"))
      .groupBy(col("cc_name"), col("d_moy"))
      .agg(sum(col("cr_return_amt_c")).as("returns_loss_c"))
  }

  /** TPC-DS q81: customers whose catalog-return total exceeds 1.2×
    * their zip's average — q1's decorrelation on the catalog channel
    * with the customer zip as the locale; the cut stays exact
    * integers (5·total·cnt > 6·sum).
    */
  def q81(s: SparkSession, dir: String): DataFrame = {
    val ctr = G.catalogReturns(s, G.nSales(s, dir))
      .join(broadcast(G.customer(s)), col("cr_customer_sk") === col("c_customer_sk"))
      .groupBy(col("cr_customer_sk").as("ctr_customer_sk"), col("c_zip"))
      .agg(sum(col("cr_return_amt_c")).as("ctr_total_return"))
    val perZip = ctr.groupBy(col("c_zip").as("z"))
      .agg(sum(col("ctr_total_return")).as("z_sum"), count(lit(1)).as("z_cnt"))
    ctr.join(broadcast(perZip), col("c_zip") === col("z"))
      .where(col("ctr_total_return") * col("z_cnt") * 5 > col("z_sum") * 6)
      .select(col("ctr_customer_sk"), col("c_zip"), col("ctr_total_return"))
  }

  /** TPC-DS q83: items returned on ALL three channels in one year —
    * per-channel item-grain return quantities joined on the item key,
    * each channel's share of the item's total in integer ppm.
    */
  def q83(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year") === 2000)
      .select(col("d_date_sk")))
    def chan(df: DataFrame, itemK: String, dateK: String, qty: String,
        p: String): DataFrame =
      df.join(dd, col(dateK) === col("d_date_sk"))
        .groupBy(col(itemK).as(s"${p}_item"))
        .agg(sum(col(qty)).as(s"${p}_qty"))
    val sr = chan(G.storeReturns(s, n), "sr_item_sk", "sr_returned_date_sk",
      "sr_return_quantity", "sr")
    val cr = chan(G.catalogReturns(s, n), "cr_item_sk", "cr_returned_date_sk",
      "cr_return_quantity", "cr")
    val wr = chan(G.webReturns(s, n), "wr_item_sk", "wr_returned_date_sk",
      "wr_return_quantity", "wr")
    sr.join(cr, col("sr_item") === col("cr_item"))
      .join(wr, col("sr_item") === col("wr_item"))
      .withColumn("total", col("sr_qty") + col("cr_qty") + col("wr_qty"))
      .select(col("sr_item").as("item"), col("sr_qty"), col("cr_qty"), col("wr_qty"),
        expr("sr_qty * 1000000 div total").as("sr_share_ppm"),
        expr("cr_qty * 1000000 div total").as("cr_share_ppm"),
        expr("wr_qty * 1000000 div total").as("wr_share_ppm"))
  }

  /** TPC-DS q9: five quantity-band statistics where each reported
    * value PICKS between two averages on a count threshold — the
    * published five correlated subquery triples fused into one
    * conditional scan; averages divide exact sums once.
    */
  def q9(s: SparkSession, dir: String): DataFrame = {
    val bands = Seq((1, 20), (21, 40), (41, 60), (61, 80), (81, 100))
    val aggs = bands.zipWithIndex.map { case ((lo, hi), i) =>
      val in = col("ss_quantity").between(lo, hi)
      when(sum(when(in, 1L).otherwise(0L)) > 5000,
        sum(when(in, col("ss_ext_sales_price_c"))).cast("double") /
          sum(when(in, 1L).otherwise(0L)))
        .otherwise(
          sum(when(in, col("ss_net_profit_c"))).cast("double") /
            sum(when(in, 1L).otherwise(0L)))
        .as(s"bucket${i + 1}")
    }
    G.storeSales(s, G.nSales(s, dir)).agg(aggs.head, aggs.tail: _*)
  }

  /** TPC-DS q77: per-channel per-unit sales vs returns report — the
    * store leg FULL OUTER joins unit-grain sales and returns
    * aggregates, the catalog leg cross-joins its single-row returns
    * total (the published shape — catalog returns carry no call
    * center), the web leg recovers the site through the order key;
    * one ROLLUP on the unioned unit-grain frames.
    */
  def q77(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val ssA = G.storeSales(s, n).groupBy(col("ss_store_sk").as("unit_sk"))
      .agg(sum(col("ss_ext_sales_price_c")).as("sales_c"),
        sum(col("ss_net_profit_c")).as("profit_c"))
    val srA = G.storeReturns(s, n).groupBy(col("sr_store_sk").as("r_unit"))
      .agg(sum(col("sr_return_amt_c")).as("returns_c"))
    val store = ssA.join(srA, col("unit_sk") === col("r_unit"), "full_outer")
      .select(lit("store channel").as("channel"),
        coalesce(col("unit_sk"), col("r_unit")).as("unit_sk"),
        coalesce(col("sales_c"), lit(0L)).as("sales_c"),
        coalesce(col("returns_c"), lit(0L)).as("returns_c"),
        (coalesce(col("profit_c"), lit(0L)) - coalesce(col("returns_c"), lit(0L)))
          .as("profit_c"))
    val csA = G.catalogSales(s, n).groupBy(col("cs_call_center_sk").as("unit_sk"))
      .agg(sum(col("cs_ext_sales_price_c")).as("sales_c"),
        sum(col("cs_net_profit_c")).as("profit_c"))
    val crTot = G.catalogReturns(s, n)
      .agg(sum(col("cr_return_amt_c")).as("returns_c"))
    val cat = csA.crossJoin(broadcast(crTot))
      .select(lit("catalog channel").as("channel"), col("unit_sk"),
        col("sales_c"), col("returns_c"),
        (col("profit_c") - col("returns_c")).as("profit_c"))
    val wsA = G.webSales(s, n).groupBy(col("ws_web_site_sk").as("unit_sk"))
      .agg(sum(col("ws_ext_sales_price_c")).as("sales_c"),
        sum(col("ws_net_profit_c")).as("profit_c"))
    val wrA = G.webReturns(s, n)
      .join(G.webSales(s, n).select(col("ws_order_number"), col("ws_web_site_sk")),
        col("wr_order_number") === col("ws_order_number"))
      .groupBy(col("ws_web_site_sk").as("r_unit"))
      .agg(sum(col("wr_return_amt_c")).as("returns_c"))
    val web = wsA.join(wrA, col("unit_sk") === col("r_unit"), "full_outer")
      .select(lit("web channel").as("channel"),
        coalesce(col("unit_sk"), col("r_unit")).as("unit_sk"),
        coalesce(col("sales_c"), lit(0L)).as("sales_c"),
        coalesce(col("returns_c"), lit(0L)).as("returns_c"),
        (coalesce(col("profit_c"), lit(0L)) - coalesce(col("returns_c"), lit(0L)))
          .as("profit_c"))
    store.unionAll(cat).unionAll(web)
      .rollup(col("channel"), col("unit_sk"))
      .agg(sum(col("sales_c")).as("sales_c"), sum(col("returns_c")).as("returns_c"),
        sum(col("profit_c")).as("profit_c"))
  }

  /** TPC-DS q80: the promo-filtered channel report with returns
    * netted PER ROW (sales LEFT JOIN returns on the order/item key,
    * unlike q5's union legs and q77's unit-grain outer joins), one
    * ROLLUP over the three netted channels.
    */
  def q80(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year") === 2000 && col("d_moy") === 10)
      .select(col("d_date_sk")))
    val noPromo = broadcast(G.promotion(s).where(col("p_channel_event") === "N")
      .select(col("p_promo_sk")))
    val store = G.storeSales(s, n)
      .join(dd, col("ss_sold_date_sk") === col("d_date_sk"))
      .join(noPromo, col("ss_promo_sk") === col("p_promo_sk"))
      .join(G.storeReturns(s, n)
        .select(col("sr_ticket_number"), col("sr_item_sk"), col("sr_return_amt_c")),
        col("ss_ticket_number") === col("sr_ticket_number") &&
          col("ss_item_sk") === col("sr_item_sk"), "left")
      .select(lit("store channel").as("channel"), col("ss_store_sk").as("unit_sk"),
        col("ss_ext_sales_price_c").as("sales_c"),
        coalesce(col("sr_return_amt_c"), lit(0L)).as("returns_c"),
        (col("ss_net_profit_c") - coalesce(col("sr_return_amt_c"), lit(0L)))
          .as("profit_c"))
    val cat = G.catalogSales(s, n)
      .join(dd, col("cs_sold_date_sk") === col("d_date_sk"))
      .join(noPromo, col("cs_promo_sk") === col("p_promo_sk"))
      .join(G.catalogReturns(s, n)
        .select(col("cr_order_number"), col("cr_return_amt_c")),
        col("cs_order_number") === col("cr_order_number"), "left")
      .select(lit("catalog channel").as("channel"),
        col("cs_call_center_sk").as("unit_sk"),
        col("cs_ext_sales_price_c").as("sales_c"),
        coalesce(col("cr_return_amt_c"), lit(0L)).as("returns_c"),
        (col("cs_net_profit_c") - coalesce(col("cr_return_amt_c"), lit(0L)))
          .as("profit_c"))
    val web = G.webSales(s, n)
      .join(dd, col("ws_sold_date_sk") === col("d_date_sk"))
      .join(G.webReturns(s, n)
        .select(col("wr_order_number"), col("wr_return_amt_c")),
        col("ws_order_number") === col("wr_order_number"), "left")
      .select(lit("web channel").as("channel"), col("ws_web_site_sk").as("unit_sk"),
        col("ws_ext_sales_price_c").as("sales_c"),
        coalesce(col("wr_return_amt_c"), lit(0L)).as("returns_c"),
        (col("ws_net_profit_c") - coalesce(col("wr_return_amt_c"), lit(0L)))
          .as("profit_c"))
    store.unionAll(cat).unionAll(web)
      .rollup(col("channel"), col("unit_sk"))
      .agg(sum(col("sales_c")).as("sales_c"), sum(col("returns_c")).as("returns_c"),
        sum(col("profit_c")).as("profit_c"))
  }

  /** TPC-DS q67: top revenue rows per category over the deep
    * (category, class, brand) ROLLUP — the rank partitions by
    * category (each rollup level ranks alongside its leaves, q67's
    * contract) over the rollup-sized frame; rank ≤ 5.
    */
  def q67(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("ss_item_sk") === col("i_item_sk"))
      .rollup(col("i_category"), col("i_class"), col("i_brand"))
      .agg(sum(col("ss_ext_sales_price_c")).as("sumsales"))
      .withColumn("rk", rank().over(
        Window.partitionBy(col("i_category")).orderBy(col("sumsales").desc)))
      .where(col("rk") <= 5)
  }

  /** TPC-DS q35: customers with a store purchase AND a purchase on at
    * least one other channel in the year, counted per birth decade —
    * one semi join onto the store key set, the other-channel
    * condition as a semi against the union of the two key sets.
    */
  def q35(s: SparkSession, dir: String): DataFrame = {
    val (st, ct, wb) = custSet(s, dir, 2000)
    st
      .join(ct.unionAll(wb).distinct().withColumnRenamed("c_sk", "o_sk"),
        col("c_sk") === col("o_sk"), "left_semi")
      .join(broadcast(G.customer(s)), col("c_sk") === col("c_customer_sk"))
      .groupBy(expr("(c_birth_year div 10) * 10").as("birth_decade"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** TPC-DS q95-shape: web orders shipped on a BUSY (site, ship-date)
    * pair — at this schema's one-row-per-order grain the published
    * "exists another order from the same site" becomes a pair-count
    * ≥ 2 semi filter computed on the aggregated pair frame — and
    * never returned; count + net profit out.
    */
  def q95(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val ws = G.webSales(s, n)
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1999)),
        col("ws_sold_date_sk") === col("d_date_sk"))
    val busy = ws.groupBy(col("ws_web_site_sk").as("b_site"),
        col("ws_ship_date_sk").as("b_date"))
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 2)
      .select(col("b_site"), col("b_date"))
    ws
      .join(busy, col("ws_web_site_sk") === col("b_site") &&
        col("ws_ship_date_sk") === col("b_date"), "left_semi")
      .join(G.webReturns(s, n), col("ws_order_number") === col("wr_order_number"),
        "left_anti")
      .agg(count(lit(1)).as("order_count"),
        sum(col("ws_net_profit_c")).as("total_net_profit_c"))
  }

  /** TPC-DS q41-shape: items of manufacturers with a deep cheap line in
    * the target categories (>= 3 items under the price band) — a pure dim query: the manufact
    * census aggregates the 1000-row item dim and semi-filters it.
    */
  def q41(s: SparkSession, dir: String): DataFrame = {
    val it = G.item(s).where(col("i_category_id").isin(1L, 2L, 3L, 4L) &&
      col("i_current_price_c") <= 5000)
    val deep = it.groupBy(col("i_manufact_id").as("m_id"))
      .agg(count(lit(1)).as("n_items"))
      .where(col("n_items") >= 3)
    it.join(broadcast(deep), col("i_manufact_id") === col("m_id"), "left_semi")
      .select(col("i_item_sk"), col("i_manufact_id"))
  }

  /** TPC-DS q19: brand revenue for one manufacturer band, one month,
    * restricted to out-of-area shoppers (the published "customer zip
    * differs from store zip" on this schema's closed-form zips).
    */
  def q19(s: SparkSession, dir: String): DataFrame =
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1999 && col("d_moy") === 11)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s).where(col("i_manufact_id").between(30, 60))),
        col("ss_item_sk") === col("i_item_sk"))
      .join(broadcast(G.customer(s)), col("ss_customer_sk") === col("c_customer_sk"))
      .where(col("c_customer_sk") * 29 % 100 >= 50)
      .groupBy(col("i_brand_id"), col("i_brand"), col("i_manufact_id"))
      .agg(sum(col("ss_ext_sales_price_c")).as("ext_price"))

  /** TPC-DS q13: average quantity / price under the published
    * disjunction of demographic × price-band arms, reported as exact
    * sums over one conditional scan (q48's cousin with averages).
    */
  def q13(s: SparkSession, dir: String): DataFrame =
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.customer(s)), col("ss_customer_sk") === col("c_customer_sk"))
      .join(broadcast(G.householdDemographics(s)),
        col("ss_hdemo_sk") === col("hd_demo_sk"))
      .where(
        (col("hd_dep_count") === 3 && col("ss_sales_price_c").between(7000, 9900) &&
          col("c_birth_year").between(1940, 1959)) ||
        (col("hd_dep_count") === 1 && col("ss_sales_price_c").between(4000, 7000) &&
          col("c_birth_year").between(1960, 1979)) ||
        (col("hd_dep_count") === 0 && col("ss_sales_price_c").between(100, 4000) &&
          col("c_birth_year").between(1980, 1999)))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("ss_quantity")).cast("double") / count(lit(1))).as("avg_quantity"),
        (sum(col("ss_sales_price_c")).cast("double") / count(lit(1))).as("avg_sales_price"),
        sum(col("ss_ext_sales_price_c")).as("total_ext_c"))

  /** TPC-DS q27: store per-item averages rolled up the (state, item)
    * hierarchy for one cohort — the store twin of q18/q26's rollup
    * averages.
    */
  def q27(s: SparkSession, dir: String): DataFrame =
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1998)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.customer(s).where(col("c_birth_year").between(1940, 1969))),
        col("ss_customer_sk") === col("c_customer_sk"))
      .join(broadcast(G.store(s)), col("ss_store_sk") === col("s_store_sk"))
      .rollup(col("s_state"), col("ss_item_sk"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("ss_quantity")).cast("double") / count(lit(1))).as("agg1"),
        (sum(col("ss_list_price_c")).cast("double") / count(lit(1))).as("agg2"),
        (sum(col("ss_sales_price_c")).cast("double") / count(lit(1))).as("agg3"))

  /** TPC-DS q30: customers whose WEB-return total exceeds 1.2× their
    * zip's average — q81's decorrelation on the web channel.
    */
  def q30(s: SparkSession, dir: String): DataFrame = {
    val ctr = G.webReturns(s, G.nSales(s, dir))
      .join(broadcast(G.customer(s)),
        col("wr_refunded_customer_sk") === col("c_customer_sk"))
      .groupBy(col("wr_refunded_customer_sk").as("ctr_customer_sk"), col("c_zip"))
      .agg(sum(col("wr_return_amt_c")).as("ctr_total_return"))
    val perZip = ctr.groupBy(col("c_zip").as("z"))
      .agg(sum(col("ctr_total_return")).as("z_sum"), count(lit(1)).as("z_cnt"))
    ctr.join(broadcast(perZip), col("c_zip") === col("z"))
      .where(col("ctr_total_return") * col("z_cnt") * 5 > col("z_sum") * 6)
      .select(col("ctr_customer_sk"), col("c_zip"), col("ctr_total_return"))
  }

  /** TPC-DS q53: manufacturer QUARTERLY revenue straying >10% from the
    * yearly quarterly mean — q63's deviation algebra one level up the
    * calendar hierarchy.
    */
  def q53(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2000)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("ss_item_sk") === col("i_item_sk"))
      .groupBy(col("i_manufact_id"), col("d_qoy"))
      .agg(sum(col("ss_ext_sales_price_c")).as("sum_sales"))
      .withColumn("yearly_sum", sum(col("sum_sales")).over(
        Window.partitionBy(col("i_manufact_id"))))
      .withColumn("n_q", count(lit(1)).over(Window.partitionBy(col("i_manufact_id"))))
      .where(abs(col("sum_sales") * col("n_q") - col("yearly_sum")) * 10 >
        col("yearly_sum"))
      .select(col("i_manufact_id"), col("d_qoy"), col("sum_sales"), col("yearly_sum"))
  }

  /** TPC-DS q57: q47's lag/lead deviation family on the CATALOG
    * channel at call-center grain.
    */
  def q57(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCc = Window.partitionBy(col("cs_call_center_sk"), col("i_brand_id"))
    val byMoy = byCc.orderBy(col("d_moy"))
    G.catalogSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1999)),
        col("cs_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("cs_item_sk") === col("i_item_sk"))
      .groupBy(col("cs_call_center_sk"), col("i_brand_id"), col("d_moy"))
      .agg(sum(col("cs_ext_sales_price_c")).as("sum_sales"))
      .withColumn("yearly_sum", sum(col("sum_sales")).over(byCc))
      .withColumn("n_months", count(lit(1)).over(byCc))
      .withColumn("psum", lag(col("sum_sales"), 1).over(byMoy))
      .withColumn("nsum", lead(col("sum_sales"), 1).over(byMoy))
      .where(col("psum").isNotNull && col("nsum").isNotNull &&
        abs(col("sum_sales") * col("n_months") - col("yearly_sum")) * 10 >
          col("yearly_sum"))
      .select(col("cs_call_center_sk"), col("i_brand_id"), col("d_moy"),
        col("sum_sales"), col("psum"), col("nsum"))
  }

  /** TPC-DS q70: state revenue rank within the (state, store)
    * rollup — q36's rank-within-parent on the geography hierarchy.
    */
  def q70(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1999)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.store(s)), col("ss_store_sk") === col("s_store_sk"))
      .rollup(col("s_state"), col("s_store_sk"))
      .agg(sum(col("ss_net_profit_c")).as("total_sum"),
        (grouping(col("s_state")) + grouping(col("s_store_sk"))).as("lochierarchy"))
      .withColumn("rank_within_parent", rank().over(
        Window.partitionBy(col("lochierarchy"),
            when(col("lochierarchy") === 0, col("s_state")))
          .orderBy(col("total_sum").desc)))
      .select(col("s_state"), col("s_store_sk"), col("lochierarchy"),
        col("total_sum"), col("rank_within_parent"))
  }

  /** TPC-DS q86: q36/q70's rollup rank on the WEB channel's
    * (category, class) hierarchy.
    */
  def q86(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    G.webSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 2001)),
        col("ws_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("ws_item_sk") === col("i_item_sk"))
      .rollup(col("i_category"), col("i_class"))
      .agg(sum(col("ws_net_profit_c")).as("total_sum"),
        (grouping(col("i_category")) + grouping(col("i_class"))).as("lochierarchy"))
      .withColumn("rank_within_parent", rank().over(
        Window.partitionBy(col("lochierarchy"),
            when(col("lochierarchy") === 0, col("i_category")))
          .orderBy(col("total_sum").desc)))
      .select(col("i_category"), col("i_class"), col("lochierarchy"),
        col("total_sum"), col("rank_within_parent"))
  }

  /** TPC-DS q23: catalog+web revenue from BEST customers buying
    * FREQUENT items in one month. Both thresholds decorrelate to
    * one-row (sum, count) scalars broadcast back, and both cuts are
    * cross-multiplied exact integers (count·2·C > 3·S for 1.5× the
    * mean item frequency, spend·10·C > 11·S for 1.1× the mean
    * customer spend); the measured month's facts cross the pipeline
    * once through two key-set semi joins into a single-row aggregate.
    */
  /** Above this store_sales row count the two-consumer threshold
    * aggregates in [[q23]] materialize once (localCheckpoint) instead
    * of re-deriving their fact subtree per consumer. r16 A/B measured
    * the materialization FLAT at sf0.1 (0.6M rows — the duplicate
    * scan+aggregate is page-cache-cheap), so the gate stays lazy
    * there; at x16 probe volume (9.6M) and beyond, the duplicate fact
    * pass is real I/O while the materialized frames are dim-bounded
    * (≤ |items| / ≤ |customers| rows) — the classic §5 "cache only
    * when recomputing costs more" trade, decided by the input size
    * the query already reads for its generators.
    */
  val Q23MatRows = 5000000L

  def q23(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    // size-gated subtree dedup (r17; closes the r16 deferral note);
    // `spark.graft.q23.matRows` overrides the gate (probe A/Bs flip
    // it; production tunes it to its own I/O-vs-memory point)
    val matRows = s.conf.getOption("spark.graft.q23.matRows")
      .map(_.toLong).getOrElse(Q23MatRows)
    def shared(df: DataFrame): DataFrame =
      if (n >= matRows) df.localCheckpoint(true) else df
    val dd98_00 = broadcast(G.dateDim(s).where(col("d_year") <= 2000)
      .select(col("d_date_sk"), col("d_moy")))
    // frequent: December item counts over 1998–2000, >1.5x the mean
    val decCounts = shared(G.storeSales(s, n)
      .join(dd98_00, col("ss_sold_date_sk") === col("d_date_sk"))
      .where(col("d_moy") === 12)
      .groupBy(col("ss_item_sk").as("fi_item"))
      .agg(count(lit(1)).as("icnt")))
    val iStats = decCounts.agg(sum(col("icnt")).as("i_sum"), count(lit(1)).as("i_cnt"))
    val frequent = decCounts.crossJoin(broadcast(iStats))
      .where(col("icnt") * 2 * col("i_cnt") > col("i_sum") * 3)
      .select(col("fi_item"))
    // best: store spend over 1998–2000, >1.1x the mean
    val spend = shared(G.storeSales(s, n)
      .join(dd98_00.select(col("d_date_sk").as("sd_sk")),
        col("ss_sold_date_sk") === col("sd_sk"))
      .groupBy(col("ss_customer_sk").as("bc_cust"))
      .agg(sum(col("ss_ext_sales_price_c")).as("cspend")))
    val cStats = spend.agg(sum(col("cspend")).as("c_sum"), count(lit(1)).as("c_cnt"))
    val best = spend.crossJoin(broadcast(cStats))
      .where(col("cspend") * 10 * col("c_cnt") > col("c_sum") * 11)
      .select(col("bc_cust"))
    val dm = broadcast(G.dateDim(s).where(col("d_year") === 2000 && col("d_moy") === 1)
      .select(col("d_date_sk").as("m_sk")))
    val measured = G.catalogSales(s, n)
      .join(dm, col("cs_sold_date_sk") === col("m_sk"))
      .select(col("cs_item_sk").as("item"), col("cs_customer_sk").as("cust"),
        col("cs_ext_sales_price_c").as("p"))
      .unionAll(G.webSales(s, n)
        .join(dm, col("ws_sold_date_sk") === col("m_sk"))
        .select(col("ws_item_sk"), col("ws_bill_customer_sk"),
          col("ws_ext_sales_price_c")))
    measured
      .join(frequent, col("item") === col("fi_item"), "left_semi")
      .join(best, col("cust") === col("bc_cust"), "left_semi")
      .agg(sum(col("p")).as("total_sales_c"), count(lit(1)).as("n_rows"))
  }

  /** TPC-DS q54: the first-purchase cohort histogram — customers
    * whose FIRST category-3 catalog/web purchase lands in 1998-03,
    * their store revenue over the following quarter bucketed in
    * $5000 bands (exact integer cents, the band boundary can never
    * flap on a float).
    */
  def q54(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val it3 = broadcast(G.item(s).where(col("i_category_id") === 3)
      .select(col("i_item_sk")))
    val firstBuy = G.catalogSales(s, n)
      .select(col("cs_item_sk").as("item"), col("cs_customer_sk").as("cust"),
        col("cs_sold_date_sk").as("sold_sk"))
      .unionAll(G.webSales(s, n)
        .select(col("ws_item_sk"), col("ws_bill_customer_sk"), col("ws_sold_date_sk")))
      .join(it3, col("item") === col("i_item_sk"), "left_semi")
      .groupBy(col("cust"))
      .agg(min(col("sold_sk")).as("first_sk"))
    // 1998-03 on this calendar: (d-1)%365 // 31 == 2 and year 1998
    val cohort = firstBuy.where(col("first_sk").between(63, 93))
      .select(col("cust"))
    val q2 = broadcast(G.dateDim(s)
      .where(col("d_year") === 1998 && col("d_moy").between(4, 6))
      .select(col("d_date_sk")))
    G.storeSales(s, n)
      .join(q2, col("ss_sold_date_sk") === col("d_date_sk"))
      .join(cohort, col("ss_customer_sk") === col("cust"), "left_semi")
      .groupBy(col("ss_customer_sk"))
      .agg(sum(col("ss_ext_sales_price_c")).as("revenue_c"))
      .groupBy(expr("revenue_c div 500000").as("segment"))
      .agg(count(lit(1)).as("num_customers"))
  }

  /** TPC-DS q11: the store-vs-web YoY growth comparison (q74's shape
    * on the web channel, q4 without the catalog leg) — year pivots as
    * conditional sums, growth cross-multiplied exact integers.
    */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val n = G.nSales(s, dir)
    val dd = broadcast(G.dateDim(s).where(col("d_year").isin(2000, 2001)))
    def yearPivot(df: DataFrame, dateK: String, custK: String, ext: String,
        p: String): DataFrame =
      df.join(dd, col(dateK) === col("d_date_sk"))
        .groupBy(col(custK).as(s"${p}_cust"))
        .agg(
          sum(when(col("d_year") === 2000, col(ext)).otherwise(0L)).as(s"${p}1"),
          sum(when(col("d_year") === 2001, col(ext)).otherwise(0L)).as(s"${p}2"))
    val ss = yearPivot(G.storeSales(s, n), "ss_sold_date_sk", "ss_customer_sk",
      "ss_ext_sales_price_c", "ss")
    val ws = yearPivot(G.webSales(s, n), "ws_sold_date_sk", "ws_bill_customer_sk",
      "ws_ext_sales_price_c", "ws")
    ss.join(ws, col("ss_cust") === col("ws_cust"))
      .where(col("ss1") > 0 && col("ws1") > 0 &&
        col("ws2") * col("ss1") > col("ss2") * col("ws1"))
      .select(col("ss_cust").as("cust"), col("ss1"), col("ss2"), col("ws1"), col("ws2"))
  }

  /** TPC-DS q56: the q33/q60 three-channel rollup keyed by item CLASS
    * slice (the published color filter has no closed-form analog;
    * class is the same dim-attribute-slice shape).
    */
  def q56(s: SparkSession, dir: String): DataFrame = {
    val dd = G.dateDim(s).where(col("d_year") === 2001 && col("d_moy") === 2)
    val it = broadcast(G.item(s).where(col("i_class_id").isin(3L, 11L, 19L)))
    channelItemRev(s, dir, dd)
      .map(_.join(it, col("item_sk") === col("i_item_sk"))
        .select(col("i_item_sk").as("item"), col("rev")))
      .reduce(_ unionAll _)
      .groupBy(col("item"))
      .agg(sum(col("rev")).as("total_sales_c"))
  }

  /** TPC-DS q89: (category, brand, store) months straying >10% from
    * that group's yearly monthly mean — q47/q63's deviation algebra
    * at the three-way grain the published text uses.
    */
  def q89(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGrp = Window.partitionBy(col("i_category_id"), col("i_brand_id"),
      col("ss_store_sk"))
    G.storeSales(s, G.nSales(s, dir))
      .join(broadcast(G.dateDim(s).where(col("d_year") === 1999)),
        col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(G.item(s)), col("ss_item_sk") === col("i_item_sk"))
      .groupBy(col("i_category_id"), col("i_brand_id"), col("ss_store_sk"),
        col("d_moy"))
      .agg(sum(col("ss_ext_sales_price_c")).as("sum_sales"))
      .withColumn("yearly_sum", sum(col("sum_sales")).over(byGrp))
      .withColumn("n_months", count(lit(1)).over(byGrp))
      .where(abs(col("sum_sales") * col("n_months") - col("yearly_sum")) * 10 >
        col("yearly_sum"))
      .select(col("i_category_id"), col("i_brand_id"), col("ss_store_sk"),
        col("d_moy"), col("sum_sales"), col("yearly_sum"))
  }

  /** Register every generated table as a temp view so published
    * TPC-DS SQL TEXT runs verbatim through the SQL front door —
    * the plans are identical to the DataFrame forms (same broadcast
    * dims, same single fact pass) because the views are the same
    * closed-form projections. Registration replaces session-global
    * temp views and assumes one query runs at a time on the session
    * (the driver and Bench both run queries sequentially); the
    * regenerated views are identical on every call, so a re-run is
    * idempotent, but a CONCURRENT query on the same session could
    * observe a mid-replacement view. Registration is cached per
    * (session, dir) — the 99-query text battery calls this once per
    * pass, and the 18 catalog writes + plan derivations are pure
    * overhead after the first (weak keys: sessions are not retained).
    */
  private val registeredViews = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def registerViews(s: SparkSession, dir: String): Unit = {
    if (dir == registeredViews.get(s)) return
    registerViewsAlways(s, dir)
    registeredViews.put(s, dir)
  }

  private def registerViewsAlways(s: SparkSession, dir: String): Unit = {
    val n = G.nSales(s, dir)
    G.storeSales(s, n).createOrReplaceTempView("store_sales")
    G.storeReturns(s, n).createOrReplaceTempView("store_returns")
    G.catalogSales(s, n).createOrReplaceTempView("catalog_sales")
    G.catalogReturns(s, n).createOrReplaceTempView("catalog_returns")
    G.webSales(s, n).createOrReplaceTempView("web_sales")
    G.webReturns(s, n).createOrReplaceTempView("web_returns")
    G.inventory(s).createOrReplaceTempView("inventory")
    G.dateDim(s).createOrReplaceTempView("date_dim")
    G.item(s).createOrReplaceTempView("item")
    G.customer(s).createOrReplaceTempView("customer_dim")
    G.customerAddress(s).createOrReplaceTempView("customer_address")
    G.incomeBand(s).createOrReplaceTempView("income_band")
    G.reason(s).createOrReplaceTempView("reason")
    G.store(s).createOrReplaceTempView("store")
    G.promotion(s).createOrReplaceTempView("promotion")
    G.householdDemographics(s).createOrReplaceTempView("household_demographics")
    G.timeDim(s).createOrReplaceTempView("time_dim")
    G.warehouse(s).createOrReplaceTempView("warehouse")
    G.shipMode(s).createOrReplaceTempView("ship_mode")
    G.callCenter(s).createOrReplaceTempView("call_center")
    G.webSite(s).createOrReplaceTempView("web_site")
    G.customerDemographics(s).createOrReplaceTempView("customer_demographics")
    G.webPage(s).createOrReplaceTempView("web_page")
    G.catalogPage(s).createOrReplaceTempView("catalog_page")
  }

  /** q3's published text, executed VERBATIM as SQL — the same string
    * DuckDB runs (modulo its regenerating CTE prefix). */
  val q3SqlText: String =
    """SELECT d_year, i_brand_id, i_brand, sum(ss_ext_sales_price_c) AS sum_agg
      |FROM store_sales
      |JOIN date_dim ON ss_sold_date_sk = d_date_sk
      |JOIN item ON ss_item_sk = i_item_sk
      |WHERE i_manufact_id = 28 AND d_moy = 11
      |GROUP BY d_year, i_brand_id, i_brand""".stripMargin

  val q55SqlText: String =
    """SELECT i_brand_id, i_brand, sum(ss_ext_sales_price_c) AS ext_price
      |FROM store_sales
      |JOIN date_dim ON ss_sold_date_sk = d_date_sk
      |JOIN item ON ss_item_sk = i_item_sk
      |WHERE i_manager_id = 28 AND d_moy = 11 AND d_year = 1999
      |GROUP BY i_brand_id, i_brand""".stripMargin

  val q98SqlText: String =
    """SELECT i_item_sk, i_class, itemrevenue,
      |  itemrevenue * 1000000 div sum(itemrevenue) OVER (PARTITION BY i_class)
      |    AS revenueratio_ppm
      |FROM (
      |  SELECT i_item_sk, i_class, sum(ss_ext_sales_price_c) AS itemrevenue
      |  FROM store_sales
      |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
      |  JOIN item ON ss_item_sk = i_item_sk
      |  WHERE d_year = 2000
      |  GROUP BY i_item_sk, i_class)""".stripMargin

  private def sqlQuery(text: String)(s: SparkSession, dir: String): DataFrame = {
    registerViews(s, dir)
    s.sql(text)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpcdsgen_q3_sqltext"  -> (sqlQuery(q3SqlText) _),
    "q_tpcdsgen_q55_sqltext" -> (sqlQuery(q55SqlText) _),
    "q_tpcdsgen_q98_sqltext" -> (sqlQuery(q98SqlText) _),
    "q_tpcdsgen_q11" -> (q11 _),
    "q_tpcdsgen_q56" -> (q56 _),
    "q_tpcdsgen_q89" -> (q89 _),
    "q_tpcdsgen_q23" -> (q23 _),
    "q_tpcdsgen_q54" -> (q54 _),
    "q_tpcdsgen_q19" -> (q19 _),
    "q_tpcdsgen_q13" -> (q13 _),
    "q_tpcdsgen_q27" -> (q27 _),
    "q_tpcdsgen_q30" -> (q30 _),
    "q_tpcdsgen_q53" -> (q53 _),
    "q_tpcdsgen_q57" -> (q57 _),
    "q_tpcdsgen_q70" -> (q70 _),
    "q_tpcdsgen_q86" -> (q86 _),
    "q_tpcdsgen_q77" -> (q77 _),
    "q_tpcdsgen_q80" -> (q80 _),
    "q_tpcdsgen_q67" -> (q67 _),
    "q_tpcdsgen_q35" -> (q35 _),
    "q_tpcdsgen_q95" -> (q95 _),
    "q_tpcdsgen_q41" -> (q41 _),
    "q_tpcdsgen_q72" -> (q72 _),
    "q_tpcdsgen_q44" -> (q44 _),
    "q_tpcdsgen_q91" -> (q91 _),
    "q_tpcdsgen_q81" -> (q81 _),
    "q_tpcdsgen_q83" -> (q83 _),
    "q_tpcdsgen_q9"  -> (q9 _),
    "q_tpcdsgen_q51" -> (q51 _),
    "q_tpcdsgen_q4"  -> (q4 _),
    "q_tpcdsgen_q14" -> (q14 _),
    "q_tpcdsgen_q12" -> (q12 _),
    "q_tpcdsgen_q20" -> (q20 _),
    "q_tpcdsgen_q36" -> (q36 _),
    "q_tpcdsgen_q28" -> (q28 _),
    "q_tpcdsgen_q48" -> (q48 _),
    "q_tpcdsgen_q47" -> (q47 _),
    "q_tpcdsgen_q38" -> (q38 _),
    "q_tpcdsgen_q87" -> (q87 _),
    "q_tpcdsgen_q31" -> (q31 _),
    "q_tpcdsgen_q75" -> (q75 _),
    "q_tpcdsgen_q18" -> (q18 _),
    "q_tpcdsgen_q49" -> (q49 _),
    "q_tpcdsgen_q63" -> (q63 _),
    "q_tpcdsgen_q66" -> (q66 _),
    "q_tpcdsgen_q69" -> (q69 _),
    "q_tpcdsgen_q22" -> (q22 _),
    "q_tpcdsgen_q29" -> (q29 _),
    "q_tpcdsgen_q40" -> (q40 _),
    "q_tpcdsgen_q5"  -> (q5 _),
    "q_tpcdsgen_q33" -> (q33 _),
    "q_tpcdsgen_q60" -> (q60 _),
    "q_tpcdsgen_q58" -> (q58 _),
    "q_tpcdsgen_q2"  -> (q2 _),
    "q_tpcdsgen_q71" -> (q71 _),
    "q_tpcdsgen_q15" -> (q15 _),
    "q_tpcdsgen_q45" -> (q45 _),
    "q_tpcdsgen_q21" -> (q21 _),
    "q_tpcdsgen_q37" -> (q37 _),
    "q_tpcdsgen_q82" -> (q82 _),
    "q_tpcdsgen_q39" -> (q39 _),
    "q_tpcdsgen_q92" -> (q92 _),
    "q_tpcdsgen_q32" -> (q32 _),
    "q_tpcdsgen_q94" -> (q94 _),
    "q_tpcdsgen_q16" -> (q16 _),
    "q_tpcdsgen_q26" -> (q26 _),
    "q_tpcdsgen_q61" -> (q61 _),
    "q_tpcdsgen_q43" -> (q43 _),
    "q_tpcdsgen_q88" -> (q88 _),
    "q_tpcdsgen_q96" -> (q96 _),
    "q_tpcdsgen_q90" -> (q90 _),
    "q_tpcdsgen_q62" -> (q62 _),
    "q_tpcdsgen_q99" -> (q99 _))

  /** Shared per-channel (item, rev) CTE text for the q33/q56/q60
    * family's oracles. */
  private def channelRevCte(dateCond: String): String =
    s""", chan AS (
       |  SELECT ss_item_sk AS item_sk, sum(ss_ext_sales_price_c)::BIGINT AS rev
       |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
       |  WHERE $dateCond GROUP BY 1
       |  UNION ALL
       |  SELECT cs_item_sk, sum(cs_ext_sales_price_c)::BIGINT
       |  FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
       |  WHERE $dateCond GROUP BY 1
       |  UNION ALL
       |  SELECT ws_item_sk, sum(ws_ext_sales_price_c)::BIGINT
       |  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
       |  WHERE $dateCond GROUP BY 1)
       |""".stripMargin

  /** Shared distinct-customer-set CTE text for q38/q87. */
  private def custSetCte(year: Int): String =
    s""", dd AS (SELECT d_date_sk FROM date_dim WHERE d_year = $year),
       |st AS (SELECT DISTINCT ss_customer_sk AS c_sk FROM store_sales
       |       JOIN dd ON ss_sold_date_sk = d_date_sk),
       |ct AS (SELECT DISTINCT cs_customer_sk AS c_sk FROM catalog_sales
       |       JOIN dd ON cs_sold_date_sk = d_date_sk),
       |wb AS (SELECT DISTINCT ws_bill_customer_sk AS c_sk FROM web_sales
       |       JOIN dd ON ws_sold_date_sk = d_date_sk)
       |""".stripMargin

  private def shareWithinClassSql(fact: String, dateK: String, itemK: String,
      ext: String, cats: String): String =
    s""", agg AS (
       |  SELECT i_item_sk, i_class, sum($ext)::BIGINT AS itemrevenue
       |  FROM $fact
       |  JOIN date_dim ON $dateK = d_date_sk
       |  JOIN item ON $itemK = i_item_sk
       |  WHERE d_year = 1999 AND d_moy = 2 AND i_category_id IN ($cats)
       |  GROUP BY 1, 2)
       |SELECT i_item_sk, i_class, itemrevenue,
       |  (itemrevenue * 1000000 // sum(itemrevenue) OVER (PARTITION BY i_class))::BIGINT
       |    AS revenueratio_ppm
       |FROM agg""".stripMargin

  def oracle: Map[String, String] = Map(
    // the SQL-text forms produce byte-identical results to their
    // DataFrame twins — same oracle strings
    "q_tpcdsgen_q3_sqltext"  -> G.oracle("q_tpcdsgen_q3"),
    "q_tpcdsgen_q55_sqltext" -> G.oracle("q_tpcdsgen_q55"),
    "q_tpcdsgen_q98_sqltext" -> G.oracle("q_tpcdsgen_q98"),
    "q_tpcdsgen_q11" -> (G.oracleGenSql +
      """, ssy AS (
        |  SELECT ss_customer_sk AS cust,
        |    sum(CASE WHEN d_year = 2000 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS ss1,
        |    sum(CASE WHEN d_year = 2001 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS ss2
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year IN (2000, 2001) GROUP BY 1),
        |wsy AS (
        |  SELECT ws_bill_customer_sk AS cust,
        |    sum(CASE WHEN d_year = 2000 THEN ws_ext_sales_price_c ELSE 0 END)::BIGINT AS ws1,
        |    sum(CASE WHEN d_year = 2001 THEN ws_ext_sales_price_c ELSE 0 END)::BIGINT AS ws2
        |  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year IN (2000, 2001) GROUP BY 1)
        |SELECT ssy.cust, ss1, ss2, ws1, ws2
        |FROM ssy JOIN wsy ON ssy.cust = wsy.cust
        |WHERE ss1 > 0 AND ws1 > 0 AND ws2 * ss1 > ss2 * ws1""".stripMargin),
    "q_tpcdsgen_q56" -> (G.oracleGenSql + channelRevCte("d_year = 2001 AND d_moy = 2") +
      """SELECT i_item_sk AS item, sum(rev)::BIGINT AS total_sales_c
        |FROM chan JOIN item ON item_sk = i_item_sk
        |WHERE i_class_id IN (3, 11, 19)
        |GROUP BY i_item_sk""".stripMargin),
    "q_tpcdsgen_q89" -> (G.oracleGenSql +
      """, m AS (
        |  SELECT i_category_id, i_brand_id, ss_store_sk, d_moy,
        |    sum(ss_ext_sales_price_c)::BIGINT AS sum_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE d_year = 1999
        |  GROUP BY 1, 2, 3, 4)
        |SELECT i_category_id, i_brand_id, ss_store_sk, d_moy, sum_sales, yearly_sum
        |FROM (SELECT *,
        |        sum(sum_sales) OVER (PARTITION BY i_category_id, i_brand_id,
        |          ss_store_sk)::BIGINT AS yearly_sum,
        |        count(*) OVER (PARTITION BY i_category_id, i_brand_id, ss_store_sk)
        |          AS n_months
        |      FROM m)
        |WHERE abs(sum_sales * n_months - yearly_sum) * 10 > yearly_sum""".stripMargin),
    "q_tpcdsgen_q23" -> (G.oracleGenSql +
      """, dec_counts AS (
        |  SELECT ss_item_sk AS fi_item, count(*) AS icnt
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year <= 2000 AND d_moy = 12 GROUP BY 1),
        |i_stats AS (SELECT sum(icnt)::BIGINT AS i_sum, count(*) AS i_cnt FROM dec_counts),
        |frequent AS (
        |  SELECT fi_item FROM dec_counts, i_stats
        |  WHERE icnt * 2 * i_cnt > i_sum * 3),
        |spend AS (
        |  SELECT ss_customer_sk AS bc_cust, sum(ss_ext_sales_price_c)::BIGINT AS cspend
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year <= 2000 GROUP BY 1),
        |c_stats AS (SELECT sum(cspend)::BIGINT AS c_sum, count(*) AS c_cnt FROM spend),
        |best AS (
        |  SELECT bc_cust FROM spend, c_stats
        |  WHERE cspend * 10 * c_cnt > c_sum * 11),
        |dm AS (SELECT d_date_sk FROM date_dim WHERE d_year = 2000 AND d_moy = 1),
        |measured AS (
        |  SELECT cs_item_sk AS item, cs_customer_sk AS cust,
        |    cs_ext_sales_price_c AS p
        |  FROM catalog_sales JOIN dm ON cs_sold_date_sk = d_date_sk
        |  UNION ALL
        |  SELECT ws_item_sk, ws_bill_customer_sk, ws_ext_sales_price_c
        |  FROM web_sales JOIN dm ON ws_sold_date_sk = d_date_sk)
        |SELECT sum(p)::BIGINT AS total_sales_c, count(*) AS n_rows
        |FROM measured
        |WHERE EXISTS (SELECT 1 FROM frequent WHERE fi_item = item)
        |  AND EXISTS (SELECT 1 FROM best WHERE bc_cust = cust)""".stripMargin),
    "q_tpcdsgen_q54" -> (G.oracleGenSql +
      """, first_buy AS (
        |  SELECT cust, min(sold_sk) AS first_sk FROM (
        |    SELECT cs_item_sk AS item_k, cs_customer_sk AS cust,
        |      cs_sold_date_sk AS sold_sk FROM catalog_sales
        |    UNION ALL
        |    SELECT ws_item_sk, ws_bill_customer_sk, ws_sold_date_sk FROM web_sales)
        |  WHERE EXISTS (SELECT 1 FROM item
        |                WHERE i_item_sk = item_k AND i_category_id = 3)
        |  GROUP BY 1),
        |cohort AS (SELECT cust FROM first_buy WHERE first_sk BETWEEN 63 AND 93),
        |q2 AS (SELECT d_date_sk FROM date_dim
        |       WHERE d_year = 1998 AND d_moy BETWEEN 4 AND 6),
        |rev AS (
        |  SELECT ss_customer_sk, sum(ss_ext_sales_price_c)::BIGINT AS revenue_c
        |  FROM store_sales
        |  JOIN q2 ON ss_sold_date_sk = d_date_sk
        |  WHERE EXISTS (SELECT 1 FROM cohort WHERE cust = ss_customer_sk)
        |  GROUP BY 1)
        |SELECT revenue_c // 500000 AS segment, count(*) AS num_customers
        |FROM rev GROUP BY 1""".stripMargin),
    "q_tpcdsgen_q19" -> (G.oracleGenSql +
      """SELECT i_brand_id, i_brand, i_manufact_id,
        |  sum(ss_ext_sales_price_c)::BIGINT AS ext_price
        |FROM store_sales
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |JOIN item ON ss_item_sk = i_item_sk
        |JOIN customer ON ss_customer_sk = c_customer_sk
        |WHERE d_year = 1999 AND d_moy = 11
        |  AND i_manufact_id BETWEEN 30 AND 60
        |  AND c_customer_sk * 29 % 100 >= 50
        |GROUP BY i_brand_id, i_brand, i_manufact_id""".stripMargin),
    "q_tpcdsgen_q13" -> (G.oracleGenSql +
      """SELECT count(*) AS n,
        |  sum(ss_quantity)::DOUBLE / count(*) AS avg_quantity,
        |  sum(ss_sales_price_c)::DOUBLE / count(*) AS avg_sales_price,
        |  sum(ss_ext_sales_price_c)::BIGINT AS total_ext_c
        |FROM store_sales
        |JOIN customer ON ss_customer_sk = c_customer_sk
        |JOIN household_demographics ON ss_hdemo_sk = hd_demo_sk
        |WHERE (hd_dep_count = 3 AND ss_sales_price_c BETWEEN 7000 AND 9900
        |       AND c_birth_year BETWEEN 1940 AND 1959)
        |   OR (hd_dep_count = 1 AND ss_sales_price_c BETWEEN 4000 AND 7000
        |       AND c_birth_year BETWEEN 1960 AND 1979)
        |   OR (hd_dep_count = 0 AND ss_sales_price_c BETWEEN 100 AND 4000
        |       AND c_birth_year BETWEEN 1980 AND 1999)""".stripMargin),
    "q_tpcdsgen_q27" -> (G.oracleGenSql +
      """SELECT s_state, ss_item_sk, count(*) AS n,
        |  sum(ss_quantity)::DOUBLE / count(*) AS agg1,
        |  sum(ss_list_price_c)::DOUBLE / count(*) AS agg2,
        |  sum(ss_sales_price_c)::DOUBLE / count(*) AS agg3
        |FROM store_sales
        |JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |JOIN customer ON ss_customer_sk = c_customer_sk
        |JOIN store ON ss_store_sk = s_store_sk
        |WHERE d_year = 1998 AND c_birth_year BETWEEN 1940 AND 1969
        |GROUP BY ROLLUP (s_state, ss_item_sk)""".stripMargin),
    "q_tpcdsgen_q30" -> (G.oracleGenSql +
      """, ctr AS (
        |  SELECT wr_refunded_customer_sk AS ctr_customer_sk, c_zip,
        |    sum(wr_return_amt_c)::BIGINT AS ctr_total_return
        |  FROM web_returns
        |  JOIN customer ON wr_refunded_customer_sk = c_customer_sk
        |  GROUP BY 1, 2),
        |per_zip AS (
        |  SELECT c_zip AS z, sum(ctr_total_return)::BIGINT AS z_sum,
        |    count(*) AS z_cnt
        |  FROM ctr GROUP BY 1)
        |SELECT ctr_customer_sk, c_zip, ctr_total_return
        |FROM ctr JOIN per_zip ON c_zip = z
        |WHERE ctr_total_return * z_cnt * 5 > z_sum * 6""".stripMargin),
    "q_tpcdsgen_q53" -> (G.oracleGenSql +
      """, m AS (
        |  SELECT i_manufact_id, d_qoy, sum(ss_ext_sales_price_c)::BIGINT AS sum_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE d_year = 2000
        |  GROUP BY 1, 2)
        |SELECT i_manufact_id, d_qoy, sum_sales, yearly_sum
        |FROM (SELECT *,
        |        sum(sum_sales) OVER (PARTITION BY i_manufact_id)::BIGINT AS yearly_sum,
        |        count(*) OVER (PARTITION BY i_manufact_id) AS n_q
        |      FROM m)
        |WHERE abs(sum_sales * n_q - yearly_sum) * 10 > yearly_sum""".stripMargin),
    "q_tpcdsgen_q57" -> (G.oracleGenSql +
      """, m AS (
        |  SELECT cs_call_center_sk, i_brand_id, d_moy,
        |    sum(cs_ext_sales_price_c)::BIGINT AS sum_sales
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN item ON cs_item_sk = i_item_sk
        |  WHERE d_year = 1999
        |  GROUP BY 1, 2, 3)
        |SELECT cs_call_center_sk, i_brand_id, d_moy, sum_sales, psum, nsum
        |FROM (SELECT *,
        |        sum(sum_sales) OVER (PARTITION BY cs_call_center_sk, i_brand_id)::BIGINT
        |          AS yearly_sum,
        |        count(*) OVER (PARTITION BY cs_call_center_sk, i_brand_id) AS n_months,
        |        lag(sum_sales) OVER (PARTITION BY cs_call_center_sk, i_brand_id
        |          ORDER BY d_moy) AS psum,
        |        lead(sum_sales) OVER (PARTITION BY cs_call_center_sk, i_brand_id
        |          ORDER BY d_moy) AS nsum
        |      FROM m)
        |WHERE psum IS NOT NULL AND nsum IS NOT NULL
        |  AND abs(sum_sales * n_months - yearly_sum) * 10 > yearly_sum""".stripMargin),
    "q_tpcdsgen_q70" -> (G.oracleGenSql +
      """, agg AS (
        |  SELECT s_state, s_store_sk,
        |    grouping(s_state) + grouping(s_store_sk) AS lochierarchy,
        |    sum(ss_net_profit_c)::BIGINT AS total_sum
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  WHERE d_year = 1999
        |  GROUP BY ROLLUP (s_state, s_store_sk))
        |SELECT s_state, s_store_sk, lochierarchy, total_sum,
        |  rank() OVER (PARTITION BY lochierarchy,
        |      CASE WHEN lochierarchy = 0 THEN s_state END
        |    ORDER BY total_sum DESC) AS rank_within_parent
        |FROM agg""".stripMargin),
    "q_tpcdsgen_q86" -> (G.oracleGenSql +
      """, agg AS (
        |  SELECT i_category, i_class,
        |    grouping(i_category) + grouping(i_class) AS lochierarchy,
        |    sum(ws_net_profit_c)::BIGINT AS total_sum
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN item ON ws_item_sk = i_item_sk
        |  WHERE d_year = 2001
        |  GROUP BY ROLLUP (i_category, i_class))
        |SELECT i_category, i_class, lochierarchy, total_sum,
        |  rank() OVER (PARTITION BY lochierarchy,
        |      CASE WHEN lochierarchy = 0 THEN i_category END
        |    ORDER BY total_sum DESC) AS rank_within_parent
        |FROM agg""".stripMargin),
    "q_tpcdsgen_q77" -> (G.oracleGenSql +
      """, ss_a AS (
        |  SELECT ss_store_sk AS unit_sk, sum(ss_ext_sales_price_c)::BIGINT AS sales_c,
        |    sum(ss_net_profit_c)::BIGINT AS profit_c
        |  FROM store_sales GROUP BY 1),
        |sr_a AS (
        |  SELECT sr_store_sk AS r_unit, sum(sr_return_amt_c)::BIGINT AS returns_c
        |  FROM store_returns GROUP BY 1),
        |cs_a AS (
        |  SELECT cs_call_center_sk AS unit_sk, sum(cs_ext_sales_price_c)::BIGINT AS sales_c,
        |    sum(cs_net_profit_c)::BIGINT AS profit_c
        |  FROM catalog_sales GROUP BY 1),
        |cr_t AS (SELECT sum(cr_return_amt_c)::BIGINT AS returns_c FROM catalog_returns),
        |ws_a AS (
        |  SELECT ws_web_site_sk AS unit_sk, sum(ws_ext_sales_price_c)::BIGINT AS sales_c,
        |    sum(ws_net_profit_c)::BIGINT AS profit_c
        |  FROM web_sales GROUP BY 1),
        |wr_a AS (
        |  SELECT ws_web_site_sk AS r_unit, sum(wr_return_amt_c)::BIGINT AS returns_c
        |  FROM web_returns JOIN web_sales ON wr_order_number = ws_order_number
        |  GROUP BY 1),
        |legs AS (
        |  SELECT 'store channel' AS channel, coalesce(unit_sk, r_unit) AS unit_sk,
        |    coalesce(sales_c, 0) AS sales_c, coalesce(returns_c, 0) AS returns_c,
        |    coalesce(profit_c, 0) - coalesce(returns_c, 0) AS profit_c
        |  FROM ss_a FULL OUTER JOIN sr_a ON unit_sk = r_unit
        |  UNION ALL
        |  SELECT 'catalog channel', unit_sk, sales_c, returns_c, profit_c - returns_c
        |  FROM cs_a CROSS JOIN cr_t
        |  UNION ALL
        |  SELECT 'web channel', coalesce(unit_sk, r_unit),
        |    coalesce(sales_c, 0), coalesce(returns_c, 0),
        |    coalesce(profit_c, 0) - coalesce(returns_c, 0)
        |  FROM ws_a FULL OUTER JOIN wr_a ON unit_sk = r_unit)
        |SELECT channel, unit_sk, sum(sales_c)::BIGINT AS sales_c,
        |  sum(returns_c)::BIGINT AS returns_c, sum(profit_c)::BIGINT AS profit_c
        |FROM legs GROUP BY ROLLUP (channel, unit_sk)""".stripMargin),
    "q_tpcdsgen_q80" -> (G.oracleGenSql +
      """, dd AS (SELECT d_date_sk FROM date_dim WHERE d_year = 2000 AND d_moy = 10),
        |np AS (SELECT p_promo_sk FROM promotion WHERE p_channel_event = 'N'),
        |legs AS (
        |  SELECT 'store channel' AS channel, ss_store_sk AS unit_sk,
        |    ss_ext_sales_price_c AS sales_c,
        |    coalesce(sr_return_amt_c, 0) AS returns_c,
        |    ss_net_profit_c - coalesce(sr_return_amt_c, 0) AS profit_c
        |  FROM store_sales
        |  JOIN dd ON ss_sold_date_sk = d_date_sk
        |  JOIN np ON ss_promo_sk = p_promo_sk
        |  LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number
        |    AND ss_item_sk = sr_item_sk
        |  UNION ALL
        |  SELECT 'catalog channel', cs_call_center_sk, cs_ext_sales_price_c,
        |    coalesce(cr_return_amt_c, 0),
        |    cs_net_profit_c - coalesce(cr_return_amt_c, 0)
        |  FROM catalog_sales
        |  JOIN dd ON cs_sold_date_sk = d_date_sk
        |  JOIN np ON cs_promo_sk = p_promo_sk
        |  LEFT JOIN catalog_returns ON cs_order_number = cr_order_number
        |  UNION ALL
        |  SELECT 'web channel', ws_web_site_sk, ws_ext_sales_price_c,
        |    coalesce(wr_return_amt_c, 0),
        |    ws_net_profit_c - coalesce(wr_return_amt_c, 0)
        |  FROM web_sales
        |  JOIN dd ON ws_sold_date_sk = d_date_sk
        |  LEFT JOIN web_returns ON ws_order_number = wr_order_number)
        |SELECT channel, unit_sk, sum(sales_c)::BIGINT AS sales_c,
        |  sum(returns_c)::BIGINT AS returns_c, sum(profit_c)::BIGINT AS profit_c
        |FROM legs GROUP BY ROLLUP (channel, unit_sk)""".stripMargin),
    "q_tpcdsgen_q67" -> (G.oracleGenSql +
      """, agg AS (
        |  SELECT i_category, i_class, i_brand,
        |    sum(ss_ext_sales_price_c)::BIGINT AS sumsales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE d_year = 2000
        |  GROUP BY ROLLUP (i_category, i_class, i_brand))
        |SELECT i_category, i_class, i_brand, sumsales, rk
        |FROM (SELECT *, rank() OVER (PARTITION BY i_category
        |        ORDER BY sumsales DESC) AS rk FROM agg)
        |WHERE rk <= 5""".stripMargin),
    "q_tpcdsgen_q35" -> (G.oracleGenSql + custSetCte(2000) +
      """SELECT (c_birth_year // 10) * 10 AS birth_decade, count(*) AS cnt
        |FROM st
        |JOIN customer ON c_sk = c_customer_sk
        |WHERE EXISTS (SELECT 1 FROM ct WHERE ct.c_sk = st.c_sk)
        |   OR EXISTS (SELECT 1 FROM wb WHERE wb.c_sk = st.c_sk)
        |GROUP BY 1""".stripMargin),
    "q_tpcdsgen_q95" -> (G.oracleGenSql +
      """, ws AS (
        |  SELECT ws_order_number, ws_web_site_sk, ws_ship_date_sk, ws_net_profit_c
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year = 1999),
        |busy AS (
        |  SELECT ws_web_site_sk AS b_site, ws_ship_date_sk AS b_date
        |  FROM ws GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT count(*) AS order_count,
        |  sum(ws_net_profit_c)::BIGINT AS total_net_profit_c
        |FROM ws
        |WHERE EXISTS (SELECT 1 FROM busy
        |              WHERE b_site = ws_web_site_sk AND b_date = ws_ship_date_sk)
        |  AND NOT EXISTS (SELECT 1 FROM web_returns
        |                  WHERE wr_order_number = ws_order_number)""".stripMargin),
    "q_tpcdsgen_q41" -> (G.oracleGenSql +
      """SELECT i_item_sk, i_manufact_id
        |FROM item
        |WHERE i_category_id IN (1, 2, 3, 4) AND i_current_price_c <= 5000
        |  AND i_manufact_id IN (
        |    SELECT i_manufact_id FROM item
        |    WHERE i_category_id IN (1, 2, 3, 4) AND i_current_price_c <= 5000
        |    GROUP BY 1 HAVING count(*) >= 3)""".stripMargin),
    "q_tpcdsgen_q72" -> (G.oracleGenSql +
      """SELECT cs_item_sk, w_warehouse_name,
        |  sum(CASE WHEN p_channel_email = 'Y' OR p_channel_event = 'Y'
        |      THEN 1 ELSE 0 END)::BIGINT AS promo,
        |  count(*) AS total_cnt
        |FROM catalog_sales
        |JOIN promotion ON cs_promo_sk = p_promo_sk
        |JOIN inventory ON cs_item_sk = inv_item_sk
        |  AND cs_warehouse_sk = inv_warehouse_sk
        |  AND (inv_date_sk - 1) // 7 + 1 = (cs_sold_date_sk - 1) // 7 + 2
        |JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
        |WHERE inv_quantity_on_hand < cs_quantity
        |GROUP BY cs_item_sk, w_warehouse_name""".stripMargin),
    "q_tpcdsgen_q44" -> (G.oracleGenSql +
      """, by_item AS (
        |  SELECT ss_item_sk, sum(ss_net_profit_c)::BIGINT * 1000 // count(*)
        |    AS avg_profit_pm
        |  FROM store_sales GROUP BY 1),
        |best AS (
        |  SELECT row_number() OVER (ORDER BY avg_profit_pm DESC, ss_item_sk) AS rnk,
        |    ss_item_sk AS best_performing
        |  FROM by_item),
        |worst AS (
        |  SELECT row_number() OVER (ORDER BY avg_profit_pm ASC, ss_item_sk) AS rnk,
        |    ss_item_sk AS worst_performing
        |  FROM by_item)
        |SELECT best.rnk, best_performing, worst_performing
        |FROM best JOIN worst ON best.rnk = worst.rnk
        |WHERE best.rnk <= 10""".stripMargin),
    "q_tpcdsgen_q91" -> (G.oracleGenSql +
      """SELECT cc_name, d_moy, sum(cr_return_amt_c)::BIGINT AS returns_loss_c
        |FROM catalog_returns
        |JOIN catalog_sales ON cr_order_number = cs_order_number
        |JOIN call_center ON cs_call_center_sk = cc_call_center_sk
        |JOIN customer ON cr_customer_sk = c_customer_sk
        |JOIN date_dim ON cr_returned_date_sk = d_date_sk
        |WHERE c_birth_year < 1940 AND d_year = 2000
        |GROUP BY cc_name, d_moy""".stripMargin),
    "q_tpcdsgen_q81" -> (G.oracleGenSql +
      """, ctr AS (
        |  SELECT cr_customer_sk AS ctr_customer_sk, c_zip,
        |    sum(cr_return_amt_c)::BIGINT AS ctr_total_return
        |  FROM catalog_returns
        |  JOIN customer ON cr_customer_sk = c_customer_sk
        |  GROUP BY 1, 2),
        |per_zip AS (
        |  SELECT c_zip AS z, sum(ctr_total_return)::BIGINT AS z_sum,
        |    count(*) AS z_cnt
        |  FROM ctr GROUP BY 1)
        |SELECT ctr_customer_sk, c_zip, ctr_total_return
        |FROM ctr JOIN per_zip ON c_zip = z
        |WHERE ctr_total_return * z_cnt * 5 > z_sum * 6""".stripMargin),
    "q_tpcdsgen_q83" -> (G.oracleGenSql +
      """, dd AS (SELECT d_date_sk FROM date_dim WHERE d_year = 2000),
        |sr AS (SELECT sr_item_sk AS item, sum(sr_return_quantity)::BIGINT AS sr_qty
        |       FROM store_returns JOIN dd ON sr_returned_date_sk = d_date_sk GROUP BY 1),
        |cr AS (SELECT cr_item_sk AS item, sum(cr_return_quantity)::BIGINT AS cr_qty
        |       FROM catalog_returns JOIN dd ON cr_returned_date_sk = d_date_sk GROUP BY 1),
        |wr AS (SELECT wr_item_sk AS item, sum(wr_return_quantity)::BIGINT AS wr_qty
        |       FROM web_returns JOIN dd ON wr_returned_date_sk = d_date_sk GROUP BY 1)
        |SELECT sr.item, sr_qty, cr_qty, wr_qty,
        |  sr_qty * 1000000 // (sr_qty + cr_qty + wr_qty) AS sr_share_ppm,
        |  cr_qty * 1000000 // (sr_qty + cr_qty + wr_qty) AS cr_share_ppm,
        |  wr_qty * 1000000 // (sr_qty + cr_qty + wr_qty) AS wr_share_ppm
        |FROM sr JOIN cr ON sr.item = cr.item JOIN wr ON sr.item = wr.item""".stripMargin),
    "q_tpcdsgen_q9" -> (G.oracleGenSql +
      "SELECT\n" + (1 to 5).map { i =>
        val (lo, hi) = (Seq((1, 20), (21, 40), (41, 60), (61, 80), (81, 100)))(i - 1)
        s"""  CASE WHEN sum(CASE WHEN ss_quantity BETWEEN $lo AND $hi THEN 1 ELSE 0 END) > 5000
           |    THEN sum(CASE WHEN ss_quantity BETWEEN $lo AND $hi
           |             THEN ss_ext_sales_price_c END)::DOUBLE
           |      / sum(CASE WHEN ss_quantity BETWEEN $lo AND $hi THEN 1 ELSE 0 END)
           |    ELSE sum(CASE WHEN ss_quantity BETWEEN $lo AND $hi
           |             THEN ss_net_profit_c END)::DOUBLE
           |      / sum(CASE WHEN ss_quantity BETWEEN $lo AND $hi THEN 1 ELSE 0 END)
           |  END AS bucket$i""".stripMargin
      }.mkString(",\n") + "\nFROM store_sales"),
    "q_tpcdsgen_q51" -> (G.oracleGenSql +
      """, web AS (
        |  SELECT ws_item_sk AS web_item, d_week_seq AS web_week,
        |    sum(sum(ws_ext_sales_price_c))
        |      OVER (PARTITION BY ws_item_sk ORDER BY d_week_seq
        |            ROWS UNBOUNDED PRECEDING)::BIGINT AS web_cume
        |  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year = 2000 GROUP BY 1, 2),
        |st AS (
        |  SELECT ss_item_sk AS st_item, d_week_seq AS st_week,
        |    sum(sum(ss_ext_sales_price_c))
        |      OVER (PARTITION BY ss_item_sk ORDER BY d_week_seq
        |            ROWS UNBOUNDED PRECEDING)::BIGINT AS st_cume
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year = 2000 GROUP BY 1, 2),
        |joined AS (
        |  SELECT coalesce(web_item, st_item) AS item_sk,
        |    coalesce(web_week, st_week) AS d_week_seq, web_cume, st_cume
        |  FROM web FULL OUTER JOIN st
        |    ON web_item = st_item AND web_week = st_week)
        |SELECT item_sk, d_week_seq, store_cumulative, web_cumulative
        |FROM (
        |  SELECT item_sk, d_week_seq,
        |    max(web_cume) OVER (PARTITION BY item_sk ORDER BY d_week_seq
        |      ROWS UNBOUNDED PRECEDING) AS web_cumulative,
        |    max(st_cume) OVER (PARTITION BY item_sk ORDER BY d_week_seq
        |      ROWS UNBOUNDED PRECEDING) AS store_cumulative
        |  FROM joined)
        |WHERE web_cumulative > store_cumulative""".stripMargin),
    "q_tpcdsgen_q4" -> (G.oracleGenSql +
      """, ssy AS (
        |  SELECT ss_customer_sk AS cust,
        |    sum(CASE WHEN d_year = 1998 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS ss1,
        |    sum(CASE WHEN d_year = 1999 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS ss2
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year IN (1998, 1999) GROUP BY 1),
        |csy AS (
        |  SELECT cs_customer_sk AS cust,
        |    sum(CASE WHEN d_year = 1998 THEN cs_ext_sales_price_c ELSE 0 END)::BIGINT AS cs1,
        |    sum(CASE WHEN d_year = 1999 THEN cs_ext_sales_price_c ELSE 0 END)::BIGINT AS cs2
        |  FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE d_year IN (1998, 1999) GROUP BY 1),
        |wsy AS (
        |  SELECT ws_bill_customer_sk AS cust,
        |    sum(CASE WHEN d_year = 1998 THEN ws_ext_sales_price_c ELSE 0 END)::BIGINT AS ws1,
        |    sum(CASE WHEN d_year = 1999 THEN ws_ext_sales_price_c ELSE 0 END)::BIGINT AS ws2
        |  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year IN (1998, 1999) GROUP BY 1)
        |SELECT ssy.cust, ss1, ss2, cs1, cs2, ws1, ws2
        |FROM ssy JOIN csy ON ssy.cust = csy.cust JOIN wsy ON ssy.cust = wsy.cust
        |WHERE ss1 > 0 AND cs1 > 0 AND ws1 > 0
        |  AND cs2 * ss1 > ss2 * cs1 AND ws2 * ss1 > ss2 * ws1""".stripMargin),
    "q_tpcdsgen_q14" -> (G.oracleGenSql +
      """, dd AS (SELECT d_date_sk FROM date_dim WHERE d_year = 2000),
        |cross_items AS (
        |  SELECT DISTINCT ss_item_sk AS item_sk FROM store_sales
        |    JOIN dd ON ss_sold_date_sk = d_date_sk
        |  INTERSECT
        |  SELECT DISTINCT cs_item_sk FROM catalog_sales
        |    JOIN dd ON cs_sold_date_sk = d_date_sk
        |  INTERSECT
        |  SELECT DISTINCT ws_item_sk FROM web_sales
        |    JOIN dd ON ws_sold_date_sk = d_date_sk)
        |SELECT channel, i_brand_id, sum(p)::BIGINT AS sales_c,
        |  count(*) AS number_sales
        |FROM (
        |  SELECT 'store' AS channel, ss_item_sk AS item,
        |    ss_sold_date_sk AS sold_sk, ss_ext_sales_price_c AS p FROM store_sales
        |  UNION ALL
        |  SELECT 'catalog', cs_item_sk, cs_sold_date_sk, cs_ext_sales_price_c
        |  FROM catalog_sales
        |  UNION ALL
        |  SELECT 'web', ws_item_sk, ws_sold_date_sk, ws_ext_sales_price_c
        |  FROM web_sales)
        |JOIN date_dim ON sold_sk = d_date_sk
        |JOIN item ON item = i_item_sk
        |WHERE d_year = 2000 AND d_moy = 12
        |  AND EXISTS (SELECT 1 FROM cross_items WHERE item_sk = item)
        |GROUP BY channel, i_brand_id""".stripMargin),
    "q_tpcdsgen_q12" -> (G.oracleGenSql + shareWithinClassSql("web_sales",
      "ws_sold_date_sk", "ws_item_sk", "ws_ext_sales_price_c", "1, 4, 8")),
    "q_tpcdsgen_q20" -> (G.oracleGenSql + shareWithinClassSql("catalog_sales",
      "cs_sold_date_sk", "cs_item_sk", "cs_ext_sales_price_c", "2, 5, 9")),
    "q_tpcdsgen_q36" -> (G.oracleGenSql +
      """, agg AS (
        |  SELECT i_category, i_class,
        |    grouping(i_category) + grouping(i_class) AS lochierarchy,
        |    sum(ss_net_profit_c)::BIGINT * 1000000 //
        |      sum(ss_ext_sales_price_c)::BIGINT AS gross_margin_ppm
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE d_year = 2001
        |  GROUP BY ROLLUP (i_category, i_class))
        |SELECT i_category, i_class, lochierarchy, gross_margin_ppm,
        |  rank() OVER (PARTITION BY lochierarchy,
        |      CASE WHEN lochierarchy = 0 THEN i_category END
        |    ORDER BY gross_margin_ppm ASC) AS rank_within_parent
        |FROM agg""".stripMargin),
    "q_tpcdsgen_q28" -> (G.oracleGenSql +
      "SELECT\n" + (1 to 6).map { i =>
        val (lo, hi) = (Seq((1, 5), (6, 10), (11, 15), (16, 20), (21, 25), (26, 30)))(i - 1)
        s"""  sum(CASE WHEN ss_quantity BETWEEN $lo AND $hi THEN ss_list_price_c END)::DOUBLE
           |    / sum(CASE WHEN ss_quantity BETWEEN $lo AND $hi THEN 1 ELSE 0 END) AS b${i}_lp,
           |  sum(CASE WHEN ss_quantity BETWEEN $lo AND $hi THEN 1 ELSE 0 END)::BIGINT AS b${i}_cnt,
           |  count(DISTINCT CASE WHEN ss_quantity BETWEEN $lo AND $hi
           |    THEN ss_list_price_c END) AS b${i}_cntd""".stripMargin
      }.mkString(",\n") + "\nFROM store_sales"),
    "q_tpcdsgen_q48" -> (G.oracleGenSql +
      """SELECT sum(ss_quantity)::BIGINT AS total_quantity
        |FROM store_sales
        |JOIN customer ON ss_customer_sk = c_customer_sk
        |WHERE (c_birth_year BETWEEN 1930 AND 1949
        |       AND ss_sales_price_c BETWEEN 5000 AND 10000)
        |   OR (c_birth_year BETWEEN 1950 AND 1969
        |       AND ss_sales_price_c BETWEEN 100 AND 5000)
        |   OR (c_birth_year BETWEEN 1970 AND 1989
        |       AND ss_sales_price_c BETWEEN 3000 AND 8000)""".stripMargin),
    "q_tpcdsgen_q47" -> (G.oracleGenSql +
      """, m AS (
        |  SELECT i_brand_id, d_moy, sum(ss_ext_sales_price_c)::BIGINT AS sum_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE d_year = 2000
        |  GROUP BY 1, 2)
        |SELECT i_brand_id, d_moy, sum_sales, psum, nsum
        |FROM (SELECT *,
        |        sum(sum_sales) OVER (PARTITION BY i_brand_id)::BIGINT AS yearly_sum,
        |        count(*) OVER (PARTITION BY i_brand_id) AS n_months,
        |        lag(sum_sales) OVER (PARTITION BY i_brand_id ORDER BY d_moy) AS psum,
        |        lead(sum_sales) OVER (PARTITION BY i_brand_id ORDER BY d_moy) AS nsum
        |      FROM m)
        |WHERE psum IS NOT NULL AND nsum IS NOT NULL
        |  AND abs(sum_sales * n_months - yearly_sum) * 10 > yearly_sum""".stripMargin),
    "q_tpcdsgen_q38" -> (G.oracleGenSql + custSetCte(2000) +
      """SELECT count(*) AS cnt FROM (
        |  SELECT c_sk FROM st INTERSECT SELECT c_sk FROM ct
        |  INTERSECT SELECT c_sk FROM wb)""".stripMargin),
    "q_tpcdsgen_q87" -> (G.oracleGenSql + custSetCte(2000) +
      """SELECT count(*) AS cnt FROM (
        |  SELECT c_sk FROM st EXCEPT SELECT c_sk FROM ct
        |  EXCEPT SELECT c_sk FROM wb)""".stripMargin),
    "q_tpcdsgen_q31" -> (G.oracleGenSql +
      """, ssq AS (
        |  SELECT c_zip AS zip,
        |    sum(CASE WHEN d_qoy = 1 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS ss1,
        |    sum(CASE WHEN d_qoy = 2 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS ss2,
        |    sum(CASE WHEN d_qoy = 3 THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS ss3
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN customer ON ss_customer_sk = c_customer_sk
        |  WHERE d_year = 2000 AND d_qoy BETWEEN 1 AND 3
        |  GROUP BY 1),
        |wsq AS (
        |  SELECT c_zip AS zip,
        |    sum(CASE WHEN d_qoy = 1 THEN ws_ext_sales_price_c ELSE 0 END)::BIGINT AS ws1,
        |    sum(CASE WHEN d_qoy = 2 THEN ws_ext_sales_price_c ELSE 0 END)::BIGINT AS ws2,
        |    sum(CASE WHEN d_qoy = 3 THEN ws_ext_sales_price_c ELSE 0 END)::BIGINT AS ws3
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN customer ON ws_bill_customer_sk = c_customer_sk
        |  WHERE d_year = 2000 AND d_qoy BETWEEN 1 AND 3
        |  GROUP BY 1)
        |SELECT ssq.zip, ss1, ss2, ss3, ws1, ws2, ws3
        |FROM ssq JOIN wsq ON ssq.zip = wsq.zip
        |WHERE ss1 > 0 AND ss2 > 0 AND ws1 > 0 AND ws2 > 0
        |  AND ws2 * ss1 > ss2 * ws1 AND ws3 * ss2 > ss3 * ws2""".stripMargin),
    "q_tpcdsgen_q75" -> (G.oracleGenSql +
      """, nets AS (
        |  SELECT d_year, i_brand_id, i_item_sk AS item,
        |    ss_quantity - coalesce(sr_return_quantity, 0) AS net_qty
        |  FROM store_sales
        |  LEFT JOIN store_returns ON ss_ticket_number = sr_ticket_number
        |    AND ss_item_sk = sr_item_sk
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE d_year IN (1999, 2000) AND i_category_id = 4
        |  UNION ALL
        |  SELECT d_year, i_brand_id, i_item_sk,
        |    cs_quantity - coalesce(cr_return_quantity, 0)
        |  FROM catalog_sales
        |  LEFT JOIN catalog_returns ON cs_order_number = cr_order_number
        |    AND cs_item_sk = cr_item_sk
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN item ON cs_item_sk = i_item_sk
        |  WHERE d_year IN (1999, 2000) AND i_category_id = 4
        |  UNION ALL
        |  SELECT d_year, i_brand_id, i_item_sk,
        |    ws_quantity - coalesce(wr_return_quantity, 0)
        |  FROM web_sales
        |  LEFT JOIN web_returns ON ws_order_number = wr_order_number
        |    AND ws_item_sk = wr_item_sk
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN item ON ws_item_sk = i_item_sk
        |  WHERE d_year IN (1999, 2000) AND i_category_id = 4),
        |by_year AS (
        |  SELECT d_year, i_brand_id, item, sum(net_qty)::BIGINT AS net_cnt
        |  FROM nets GROUP BY 1, 2, 3)
        |SELECT p.i_brand_id, p.item, p.net_cnt AS prev_cnt, c.net_cnt AS curr_cnt,
        |  c.net_cnt - p.net_cnt AS sales_cnt_diff
        |FROM by_year p
        |JOIN by_year c ON p.item = c.item
        |WHERE p.d_year = 1999 AND c.d_year = 2000
        |  AND p.net_cnt > 0 AND c.net_cnt * 10 < p.net_cnt * 9""".stripMargin),
    "q_tpcdsgen_q18" -> (G.oracleGenSql +
      """SELECT (c_birth_year // 10) * 10 AS birth_decade, c_zip, count(*) AS n,
        |  sum(cs_quantity)::DOUBLE / count(*) AS agg1,
        |  sum(cs_sales_price_c)::DOUBLE / count(*) AS agg2,
        |  sum(cs_ext_discount_amt_c)::DOUBLE / count(*) AS agg3
        |FROM catalog_sales
        |JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |JOIN customer ON cs_customer_sk = c_customer_sk
        |WHERE d_year = 1998
        |GROUP BY ROLLUP ((c_birth_year // 10) * 10, c_zip)""".stripMargin),
    "q_tpcdsgen_q49" -> (G.oracleGenSql +
      """, rates AS (
        |  SELECT 'store' AS channel, ss_item_sk AS item,
        |    sum(sr_return_quantity)::BIGINT * 1000000 // sum(ss_quantity)::BIGINT
        |      AS return_ratio_ppm
        |  FROM store_sales JOIN store_returns
        |    ON ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
        |  GROUP BY 2
        |  UNION ALL
        |  SELECT 'catalog', cs_item_sk,
        |    sum(cr_return_quantity)::BIGINT * 1000000 // sum(cs_quantity)::BIGINT
        |  FROM catalog_sales JOIN catalog_returns
        |    ON cs_order_number = cr_order_number AND cs_item_sk = cr_item_sk
        |  GROUP BY 2
        |  UNION ALL
        |  SELECT 'web', ws_item_sk,
        |    sum(wr_return_quantity)::BIGINT * 1000000 // sum(ws_quantity)::BIGINT
        |  FROM web_sales JOIN web_returns
        |    ON ws_order_number = wr_order_number AND ws_item_sk = wr_item_sk
        |  GROUP BY 2)
        |SELECT channel, item, return_ratio_ppm, rnk
        |FROM (SELECT *, rank() OVER (PARTITION BY channel
        |        ORDER BY return_ratio_ppm DESC) AS rnk
        |      FROM rates)
        |WHERE rnk <= 10""".stripMargin),
    "q_tpcdsgen_q63" -> (G.oracleGenSql +
      """, m AS (
        |  SELECT i_manager_id, d_moy, sum(ss_ext_sales_price_c)::BIGINT AS sum_sales
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  WHERE d_year = 2000
        |  GROUP BY 1, 2)
        |SELECT i_manager_id, d_moy, sum_sales, yearly_sum
        |FROM (SELECT *,
        |        sum(sum_sales) OVER (PARTITION BY i_manager_id)::BIGINT AS yearly_sum,
        |        count(*) OVER (PARTITION BY i_manager_id) AS n_months
        |      FROM m)
        |WHERE abs(sum_sales * n_months - yearly_sum) * 10 > yearly_sum""".stripMargin),
    "q_tpcdsgen_q66" -> (G.oracleGenSql +
      """SELECT w_warehouse_name,
        |  sum(CASE WHEN d_moy = 1 THEN p ELSE 0 END)::BIGINT AS jan_sales,
        |  sum(CASE WHEN d_moy = 2 THEN p ELSE 0 END)::BIGINT AS feb_sales,
        |  sum(CASE WHEN d_moy = 3 THEN p ELSE 0 END)::BIGINT AS mar_sales,
        |  sum(CASE WHEN d_moy = 4 THEN p ELSE 0 END)::BIGINT AS apr_sales,
        |  sum(CASE WHEN d_moy = 5 THEN p ELSE 0 END)::BIGINT AS may_sales,
        |  sum(CASE WHEN d_moy = 6 THEN p ELSE 0 END)::BIGINT AS jun_sales,
        |  sum(CASE WHEN d_moy = 7 THEN p ELSE 0 END)::BIGINT AS jul_sales,
        |  sum(CASE WHEN d_moy = 8 THEN p ELSE 0 END)::BIGINT AS aug_sales,
        |  sum(CASE WHEN d_moy = 9 THEN p ELSE 0 END)::BIGINT AS sep_sales,
        |  sum(CASE WHEN d_moy = 10 THEN p ELSE 0 END)::BIGINT AS oct_sales,
        |  sum(CASE WHEN d_moy = 11 THEN p ELSE 0 END)::BIGINT AS nov_sales,
        |  sum(CASE WHEN d_moy = 12 THEN p ELSE 0 END)::BIGINT AS dec_sales
        |FROM (
        |  SELECT ws_warehouse_sk AS wh_sk, ws_ship_mode_sk AS sm_sk,
        |    ws_sold_date_sk AS sold_sk, ws_ext_sales_price_c AS p FROM web_sales
        |  UNION ALL
        |  SELECT cs_warehouse_sk, cs_ship_mode_sk, cs_sold_date_sk,
        |    cs_ext_sales_price_c FROM catalog_sales)
        |JOIN ship_mode ON sm_sk = sm_ship_mode_sk
        |JOIN date_dim ON sold_sk = d_date_sk
        |JOIN warehouse ON wh_sk = w_warehouse_sk
        |WHERE sm_carrier IN ('BARIAN', 'UPS') AND d_year = 2000
        |GROUP BY w_warehouse_name""".stripMargin),
    "q_tpcdsgen_q69" -> (G.oracleGenSql +
      """, dd AS (SELECT d_date_sk FROM date_dim WHERE d_year = 2000 AND d_qoy = 1),
        |st AS (SELECT DISTINCT ss_customer_sk FROM store_sales
        |       JOIN dd ON ss_sold_date_sk = d_date_sk),
        |wb AS (SELECT DISTINCT ws_bill_customer_sk FROM web_sales
        |       JOIN dd ON ws_sold_date_sk = d_date_sk),
        |ct AS (SELECT DISTINCT cs_customer_sk FROM catalog_sales
        |       JOIN dd ON cs_sold_date_sk = d_date_sk)
        |SELECT (c_birth_year // 10) * 10 AS birth_decade, count(*) AS cnt
        |FROM st
        |JOIN customer ON ss_customer_sk = c_customer_sk
        |WHERE NOT EXISTS (SELECT 1 FROM wb WHERE ws_bill_customer_sk = ss_customer_sk)
        |  AND NOT EXISTS (SELECT 1 FROM ct WHERE cs_customer_sk = ss_customer_sk)
        |GROUP BY 1""".stripMargin),
    "q_tpcdsgen_q22" -> (G.oracleGenSql +
      """SELECT i_category, i_brand,
        |  sum(inv_quantity_on_hand)::DOUBLE / count(*) AS qoh
        |FROM inventory
        |JOIN date_dim ON inv_date_sk = d_date_sk
        |JOIN item ON inv_item_sk = i_item_sk
        |WHERE d_year = 2001
        |GROUP BY ROLLUP (i_category, i_brand)""".stripMargin),
    "q_tpcdsgen_q29" -> (G.oracleGenSql +
      """, returned AS (
        |  SELECT ss_store_sk, ss_quantity, sr_return_quantity,
        |    sr_customer_sk, sr_returned_date_sk
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN store_returns ON ss_ticket_number = sr_ticket_number
        |    AND ss_item_sk = sr_item_sk
        |  WHERE d_year = 1999),
        |cs AS (
        |  SELECT cs_customer_sk, cs_quantity, cs_sold_date_sk
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE d_year IN (1999, 2000))
        |SELECT ss_store_sk,
        |  sum(ss_quantity)::BIGINT AS store_sales_quantity,
        |  sum(sr_return_quantity)::BIGINT AS store_returns_quantity,
        |  sum(cs_quantity)::BIGINT AS catalog_sales_quantity
        |FROM returned
        |JOIN cs ON sr_customer_sk = cs_customer_sk
        |  AND cs_sold_date_sk > sr_returned_date_sk
        |GROUP BY ss_store_sk""".stripMargin),
    "q_tpcdsgen_q40" -> (G.oracleGenSql +
      """SELECT w_warehouse_name, cs_item_sk,
        |  sum(CASE WHEN cs_sold_date_sk < 500 THEN net_c ELSE 0 END)::BIGINT
        |    AS sales_before,
        |  sum(CASE WHEN cs_sold_date_sk >= 500 THEN net_c ELSE 0 END)::BIGINT
        |    AS sales_after
        |FROM (
        |  SELECT cs_warehouse_sk, cs_item_sk, cs_sold_date_sk,
        |    cs_ext_sales_price_c - coalesce(cr_return_amt_c, 0) AS net_c
        |  FROM catalog_sales
        |  LEFT JOIN catalog_returns ON cs_order_number = cr_order_number
        |  WHERE cs_sold_date_sk BETWEEN 470 AND 530)
        |JOIN item ON cs_item_sk = i_item_sk
        |JOIN warehouse ON cs_warehouse_sk = w_warehouse_sk
        |WHERE i_current_price_c BETWEEN 100 AND 1500
        |GROUP BY w_warehouse_name, cs_item_sk""".stripMargin),
    "q_tpcdsgen_q5" -> (G.oracleGenSql +
      """SELECT channel, unit_sk,
        |  sum(sales_c)::BIGINT AS sales_c,
        |  sum(returns_c)::BIGINT AS returns_c,
        |  sum(profit_c)::BIGINT AS profit_c
        |FROM (
        |  SELECT 'store channel' AS channel, ss_store_sk AS unit_sk,
        |    ss_ext_sales_price_c AS sales_c, 0 AS returns_c,
        |    ss_net_profit_c AS profit_c
        |  FROM store_sales
        |  UNION ALL
        |  SELECT 'store channel', sr_store_sk, 0, sr_return_amt_c, -sr_return_amt_c
        |  FROM store_returns
        |  UNION ALL
        |  SELECT 'catalog channel', cs_call_center_sk, cs_ext_sales_price_c, 0,
        |    cs_net_profit_c
        |  FROM catalog_sales
        |  UNION ALL
        |  SELECT 'catalog channel', 0, 0, cr_return_amt_c, -cr_return_amt_c
        |  FROM catalog_returns
        |  UNION ALL
        |  SELECT 'web channel', ws_web_site_sk, ws_ext_sales_price_c, 0,
        |    ws_net_profit_c
        |  FROM web_sales
        |  UNION ALL
        |  SELECT 'web channel', 0, 0, wr_return_amt_c, -wr_return_amt_c
        |  FROM web_returns)
        |GROUP BY ROLLUP (channel, unit_sk)""".stripMargin),
    "q_tpcdsgen_q33" -> (G.oracleGenSql + channelRevCte("d_year = 1998 AND d_moy = 3") +
      """SELECT i_manufact_id, sum(rev)::BIGINT AS total_sales_c
        |FROM chan JOIN item ON item_sk = i_item_sk
        |WHERE i_category_id = 3
        |GROUP BY i_manufact_id""".stripMargin),
    "q_tpcdsgen_q60" -> (G.oracleGenSql + channelRevCte("d_year = 1999 AND d_moy = 9") +
      """SELECT i_item_sk AS item, sum(rev)::BIGINT AS total_sales_c
        |FROM chan JOIN item ON item_sk = i_item_sk
        |WHERE i_category_id = 7
        |GROUP BY i_item_sk""".stripMargin),
    "q_tpcdsgen_q58" -> (G.oracleGenSql +
      """, ssr AS (
        |  SELECT ss_item_sk AS item, sum(ss_ext_sales_price_c)::BIGINT AS ss_rev
        |  FROM store_sales JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  WHERE d_year = 1998 AND d_qoy = 1 GROUP BY 1),
        |csr AS (
        |  SELECT cs_item_sk AS item, sum(cs_ext_sales_price_c)::BIGINT AS cs_rev
        |  FROM catalog_sales JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  WHERE d_year = 1998 AND d_qoy = 1 GROUP BY 1),
        |wsr AS (
        |  SELECT ws_item_sk AS item, sum(ws_ext_sales_price_c)::BIGINT AS ws_rev
        |  FROM web_sales JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  WHERE d_year = 1998 AND d_qoy = 1 GROUP BY 1)
        |SELECT ssr.item, ss_rev, cs_rev, ws_rev
        |FROM ssr JOIN csr ON ssr.item = csr.item JOIN wsr ON ssr.item = wsr.item
        |WHERE ss_rev * 30 >= (ss_rev + cs_rev + ws_rev) * 5
        |  AND ss_rev * 30 <= (ss_rev + cs_rev + ws_rev) * 15
        |  AND cs_rev * 30 >= (ss_rev + cs_rev + ws_rev) * 5
        |  AND cs_rev * 30 <= (ss_rev + cs_rev + ws_rev) * 15
        |  AND ws_rev * 30 >= (ss_rev + cs_rev + ws_rev) * 5
        |  AND ws_rev * 30 <= (ss_rev + cs_rev + ws_rev) * 15""".stripMargin),
    "q_tpcdsgen_q2" -> (G.oracleGenSql +
      """, wk AS (
        |  SELECT d_week_seq,
        |    sum(CASE WHEN d_dow = 0 THEN p ELSE 0 END)::BIGINT AS sun_sales,
        |    sum(CASE WHEN d_dow = 1 THEN p ELSE 0 END)::BIGINT AS mon_sales,
        |    sum(CASE WHEN d_dow = 2 THEN p ELSE 0 END)::BIGINT AS tue_sales,
        |    sum(CASE WHEN d_dow = 3 THEN p ELSE 0 END)::BIGINT AS wed_sales,
        |    sum(CASE WHEN d_dow = 4 THEN p ELSE 0 END)::BIGINT AS thu_sales,
        |    sum(CASE WHEN d_dow = 5 THEN p ELSE 0 END)::BIGINT AS fri_sales,
        |    sum(CASE WHEN d_dow = 6 THEN p ELSE 0 END)::BIGINT AS sat_sales
        |  FROM (
        |    SELECT cs_sold_date_sk AS sold_sk, cs_ext_sales_price_c AS p FROM catalog_sales
        |    UNION ALL
        |    SELECT ws_sold_date_sk, ws_ext_sales_price_c FROM web_sales)
        |  JOIN date_dim ON sold_sk = d_date_sk
        |  GROUP BY d_week_seq)
        |SELECT y1.d_week_seq,
        |  y1.sun_sales * 1000000 // nullif(y2.sun_sales, 0) AS sun_ratio_ppm,
        |  y1.mon_sales * 1000000 // nullif(y2.mon_sales, 0) AS mon_ratio_ppm,
        |  y1.tue_sales * 1000000 // nullif(y2.tue_sales, 0) AS tue_ratio_ppm,
        |  y1.wed_sales * 1000000 // nullif(y2.wed_sales, 0) AS wed_ratio_ppm,
        |  y1.thu_sales * 1000000 // nullif(y2.thu_sales, 0) AS thu_ratio_ppm,
        |  y1.fri_sales * 1000000 // nullif(y2.fri_sales, 0) AS fri_ratio_ppm,
        |  y1.sat_sales * 1000000 // nullif(y2.sat_sales, 0) AS sat_ratio_ppm
        |FROM wk y1
        |JOIN wk y2 ON y2.d_week_seq = y1.d_week_seq + 52
        |WHERE y1.d_week_seq <= 52""".stripMargin),
    "q_tpcdsgen_q71" -> (G.oracleGenSql +
      """SELECT i_brand_id, i_brand, t_hour, sum(p)::BIGINT AS ext_price_c
        |FROM (
        |  SELECT ss_item_sk AS item_sk, ss_sold_time_sk AS time_sk,
        |    ss_sold_date_sk AS sold_sk, ss_ext_sales_price_c AS p FROM store_sales
        |  UNION ALL
        |  SELECT cs_item_sk, cs_sold_time_sk, cs_sold_date_sk, cs_ext_sales_price_c
        |  FROM catalog_sales
        |  UNION ALL
        |  SELECT ws_item_sk, ws_sold_time_sk, ws_sold_date_sk, ws_ext_sales_price_c
        |  FROM web_sales)
        |JOIN date_dim ON sold_sk = d_date_sk
        |JOIN item ON item_sk = i_item_sk
        |JOIN time_dim ON time_sk = t_time_sk
        |WHERE d_year = 2001 AND d_moy = 12 AND i_manager_id = 1
        |  AND t_hour IN (7, 8, 19, 20)
        |GROUP BY i_brand_id, i_brand, t_hour""".stripMargin),
    "q_tpcdsgen_q15" -> (G.oracleGenSql +
      """SELECT c_zip, sum(cs_sales_price_c)::BIGINT AS total_sales_c
        |FROM catalog_sales
        |JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |JOIN customer ON cs_customer_sk = c_customer_sk
        |WHERE d_year = 2000 AND d_qoy = 2
        |  AND (c_customer_sk * 29 % 100 < 10 OR cs_ext_sales_price_c > 900000)
        |GROUP BY c_zip""".stripMargin),
    "q_tpcdsgen_q45" -> (G.oracleGenSql +
      """SELECT c_zip, sum(ws_ext_sales_price_c)::BIGINT AS total_sales_c
        |FROM web_sales
        |JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |JOIN customer ON ws_bill_customer_sk = c_customer_sk
        |WHERE d_year = 1999 AND d_qoy = 3
        |  AND (c_customer_sk * 29 % 100 >= 90
        |       OR ws_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29))
        |GROUP BY c_zip""".stripMargin),
    "q_tpcdsgen_q21" -> (G.oracleGenSql +
      """SELECT w_warehouse_name, inv_item_sk,
        |  sum(CASE WHEN inv_date_sk < 1000 THEN inv_quantity_on_hand ELSE 0 END)::BIGINT
        |    AS inv_before,
        |  sum(CASE WHEN inv_date_sk >= 1000 THEN inv_quantity_on_hand ELSE 0 END)::BIGINT
        |    AS inv_after
        |FROM inventory
        |JOIN item ON inv_item_sk = i_item_sk
        |JOIN warehouse ON inv_warehouse_sk = w_warehouse_sk
        |WHERE inv_date_sk BETWEEN 970 AND 1030
        |  AND i_current_price_c BETWEEN 100 AND 1500
        |GROUP BY w_warehouse_name, inv_item_sk
        |HAVING inv_before > 0 AND inv_after * 3 >= inv_before * 2
        |  AND inv_after * 2 <= inv_before * 3""".stripMargin),
    "q_tpcdsgen_q37" -> (G.oracleGenSql +
      """SELECT i_item_sk, i_current_price_c
        |FROM item
        |WHERE i_current_price_c BETWEEN 2000 AND 5000
        |  AND EXISTS (SELECT 1 FROM inventory
        |              WHERE inv_item_sk = i_item_sk
        |                AND inv_date_sk BETWEEN 900 AND 960
        |                AND inv_quantity_on_hand BETWEEN 100 AND 500)
        |  AND EXISTS (SELECT 1 FROM catalog_sales WHERE cs_item_sk = i_item_sk)""".stripMargin),
    "q_tpcdsgen_q82" -> (G.oracleGenSql +
      """SELECT i_item_sk, i_current_price_c
        |FROM item
        |WHERE i_current_price_c BETWEEN 5000 AND 8000
        |  AND EXISTS (SELECT 1 FROM inventory
        |              WHERE inv_item_sk = i_item_sk
        |                AND inv_date_sk BETWEEN 400 AND 460
        |                AND inv_quantity_on_hand BETWEEN 100 AND 500)
        |  AND EXISTS (SELECT 1 FROM store_sales WHERE ss_item_sk = i_item_sk)""".stripMargin),
    "q_tpcdsgen_q39" -> (G.oracleGenSql +
      """, m AS (
        |  SELECT inv_warehouse_sk, inv_item_sk, d_moy,
        |    count(*) AS n, sum(inv_quantity_on_hand)::BIGINT AS qsum,
        |    sum(inv_quantity_on_hand * inv_quantity_on_hand)::BIGINT AS qsumsq
        |  FROM inventory
        |  JOIN date_dim ON inv_date_sk = d_date_sk
        |  WHERE d_year = 2000 AND d_moy IN (3, 4)
        |  GROUP BY 1, 2, 3
        |  HAVING sum(inv_quantity_on_hand) > 0
        |    AND count(*) * (count(*) * sum(inv_quantity_on_hand * inv_quantity_on_hand)
        |          - sum(inv_quantity_on_hand) * sum(inv_quantity_on_hand)) * 25 >
        |        (count(*) - 1) * sum(inv_quantity_on_hand) * sum(inv_quantity_on_hand) * 16)
        |SELECT m1.inv_warehouse_sk AS w_sk, m1.inv_item_sk AS i_sk,
        |  m1.n AS n1, m1.qsum AS mean1_sum, m2.n AS n2, m2.qsum AS mean2_sum
        |FROM m m1
        |JOIN m m2 ON m1.inv_warehouse_sk = m2.inv_warehouse_sk
        |  AND m1.inv_item_sk = m2.inv_item_sk
        |WHERE m1.d_moy = 3 AND m2.d_moy = 4""".stripMargin),
    "q_tpcdsgen_q92" -> (G.oracleGenSql +
      """, w AS (
        |  SELECT ws_item_sk, ws_ext_discount_amt_c
        |  FROM web_sales
        |  JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |  JOIN item ON ws_item_sk = i_item_sk
        |  WHERE d_year = 2000 AND d_moy BETWEEN 1 AND 3 AND i_manufact_id = 35),
        |pi AS (
        |  SELECT ws_item_sk AS pi_item, sum(ws_ext_discount_amt_c)::BIGINT AS pi_sum,
        |    count(*) AS pi_cnt
        |  FROM w GROUP BY 1)
        |SELECT sum(ws_ext_discount_amt_c)::BIGINT AS excess_discount_c,
        |  count(*) AS n_rows
        |FROM w JOIN pi ON ws_item_sk = pi_item
        |WHERE ws_ext_discount_amt_c * pi_cnt * 10 > pi_sum * 13""".stripMargin),
    "q_tpcdsgen_q32" -> (G.oracleGenSql +
      """, w AS (
        |  SELECT cs_item_sk, cs_ext_discount_amt_c
        |  FROM catalog_sales
        |  JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |  JOIN item ON cs_item_sk = i_item_sk
        |  WHERE d_year = 2000 AND d_moy BETWEEN 4 AND 6 AND i_manufact_id = 77),
        |pi AS (
        |  SELECT cs_item_sk AS pi_item, sum(cs_ext_discount_amt_c)::BIGINT AS pi_sum,
        |    count(*) AS pi_cnt
        |  FROM w GROUP BY 1)
        |SELECT sum(cs_ext_discount_amt_c)::BIGINT AS excess_discount_c,
        |  count(*) AS n_rows
        |FROM w JOIN pi ON cs_item_sk = pi_item
        |WHERE cs_ext_discount_amt_c * pi_cnt * 10 > pi_sum * 13""".stripMargin),
    "q_tpcdsgen_q94" -> (G.oracleGenSql +
      """SELECT count(*) AS order_count,
        |  sum(ws_net_profit_c)::BIGINT AS total_net_profit_c
        |FROM web_sales
        |JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |JOIN warehouse ON ws_warehouse_sk = w_warehouse_sk
        |WHERE d_year = 1999 AND ws_ship_date_sk - ws_sold_date_sk <= 60
        |  AND w_state = 'GA'
        |  AND NOT EXISTS (SELECT 1 FROM web_returns
        |                  WHERE wr_order_number = ws_order_number)""".stripMargin),
    "q_tpcdsgen_q16" -> (G.oracleGenSql +
      """SELECT count(*) AS order_count,
        |  sum(cs_net_profit_c)::BIGINT AS total_net_profit_c
        |FROM catalog_sales
        |JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |JOIN call_center ON cs_call_center_sk = cc_call_center_sk
        |WHERE d_year = 2001 AND cs_ship_date_sk - cs_sold_date_sk <= 30
        |  AND cc_name IN ('CC1', 'CC2', 'CC3')
        |  AND NOT EXISTS (SELECT 1 FROM catalog_returns
        |                  WHERE cr_order_number = cs_order_number)""".stripMargin),
    "q_tpcdsgen_q26" -> (G.oracleGenSql +
      """SELECT cs_item_sk, count(*) AS n,
        |  sum(cs_quantity)::DOUBLE / count(*) AS agg1,
        |  sum(cs_sales_price_c)::DOUBLE / count(*) AS agg2,
        |  sum(cs_ext_discount_amt_c)::DOUBLE / count(*) AS agg3
        |FROM catalog_sales
        |JOIN customer ON cs_customer_sk = c_customer_sk
        |JOIN promotion ON cs_promo_sk = p_promo_sk
        |WHERE c_birth_year BETWEEN 1950 AND 1959
        |  AND p_channel_email = 'N' AND p_channel_event = 'N'
        |GROUP BY cs_item_sk""".stripMargin),
    "q_tpcdsgen_q61" -> (G.oracleGenSql +
      """SELECT promotions_c, total_c, promotions_c * 1000000 // total_c AS promo_ratio_ppm
        |FROM (
        |  SELECT
        |    sum(CASE WHEN p_channel_email = 'Y' OR p_channel_event = 'Y'
        |        THEN ss_ext_sales_price_c ELSE 0 END)::BIGINT AS promotions_c,
        |    sum(ss_ext_sales_price_c)::BIGINT AS total_c
        |  FROM store_sales
        |  JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |  JOIN item ON ss_item_sk = i_item_sk
        |  JOIN store ON ss_store_sk = s_store_sk
        |  JOIN promotion ON ss_promo_sk = p_promo_sk
        |  WHERE d_year = 1998 AND d_moy = 11 AND i_category_id = 10
        |    AND s_state = 'KY')""".stripMargin),
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
        |  AND s_state = 'GA'""".stripMargin),
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
