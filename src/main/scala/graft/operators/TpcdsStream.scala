package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin for the generated-TPC-DS star aggregate — the same
  * discipline as the Misra–Gries / Count–Min / drift stores
  * (graft.text.FrequencyOps): a micro-batch pipeline folds each
  * batch's PARTIAL star aggregate into a driver-side mergeable store,
  * and the store's final readout equals the batch query bit-for-bit.
  * The reference runs its TPC-DS gate on the batch planner but every
  * exec node it exercises is stream-first
  * (flink-table/flink-table-planner/.../stream/StreamExecGroupAggregate
  * .java); this twin shows the same star query incrementalizing on
  * Spark Structured Streaming with nothing but partial-agg merges.
  *
  * Scale shape: each micro-batch collapses to (year, brand) grain
  * BEFORE anything reaches the driver — the store only ever receives
  * dim-bounded summaries (≤ |years|×|brands| rows per batch, 200
  * here), never sales rows, so the fold is O(dims) per batch at ANY
  * fact volume. Replay-guarded like MgStore: a retried batchId is a
  * no-op, so foreachBatch's at-least-once contract still yields
  * exactly-once totals.
  */
object TpcdsStream {

  /** Mergeable (group-key → sum) store with a per-batch high-water
    * replay guard. Thread-confined to the streaming query's
    * foreachBatch callback thread. */
  final class StarStore {
    private var seenBatch = -1L
    private val sums = scala.collection.mutable.Map.empty[(Int, Long, String), Long]

    /** Fold one micro-batch's partial (d_year, i_brand_id, i_brand,
      * sum) rows. Rows at or below the high-water batchId are replays
      * of an already-folded batch and are skipped. */
    def fold(partials: Array[(Int, Long, String, Long)], batchId: Long): Unit = {
      if (batchId <= seenBatch) return
      seenBatch = batchId
      partials.foreach { case (y, bid, b, s) =>
        val k = (y, bid, b)
        sums(k) = sums.getOrElse(k, 0L) + s
      }
    }

    def toRows: Seq[(Int, Long, String, Long)] =
      sums.toSeq.map { case ((y, bid, b), s) => (y, bid, b, s) }.sortBy(r => (r._1, r._2))
  }

  /** The q3 star aggregate over one micro-batch of LINE ids — the
    * per-batch pipeline: expand the closed-form columns map-only
    * through [[TpcdsGen.storeSalesFromIds]] (the SAME expansion the
    * batch generator uses — one source of truth for the mixers, so
    * the twin cannot silently diverge if the closed forms change),
    * broadcast-join the two fixed-size dims, collapse to (year,
    * brand) grain. Returns the dim-bounded partial frame. */
  def q3Partial(ids: DataFrame): DataFrame = {
    val s = ids.sparkSession
    TpcdsGen.storeSalesFromIds(ids)
      .select(col("ss_sold_date_sk"), col("ss_item_sk"), col("ss_ext_sales_price_c"))
      .join(broadcast(TpcdsGen.dateDim(s)), col("ss_sold_date_sk") === col("d_date_sk"))
      .join(broadcast(TpcdsGen.item(s)), col("ss_item_sk") === col("i_item_sk"))
      .where(col("i_manufact_id") === 28 && col("d_moy") === 11)
      .groupBy(col("d_year"), col("i_brand_id"), col("i_brand"))
      .agg(sum(col("ss_ext_sales_price_c")).as("sum_agg"))
  }

  /** Collect one partial frame into the store's fold format. */
  def collectPartial(df: DataFrame): Array[(Int, Long, String, Long)] =
    df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))

  // ---- q93 returns twin: late returns RETRACT net spend -----------

  /** Per-customer net-spend store for the streaming q93 twin. Returns
    * arrive 1–60 days AFTER their sale by construction, so in a
    * stream they land in LATER micro-batches — and a correct
    * incremental q93 must then revise the customer's already-emitted
    * total downward. The store keeps the upsert changelog it emits:
    * every touched customer retracts its previous total (-U) and
    * asserts the new one (+U) — the reference's retract-stream
    * contract (StreamExecGroupAggregate emitting UPDATE_BEFORE/
    * UPDATE_AFTER) — so a downstream consumer never double-counts.
    * Replay-guarded like [[StarStore]]: a retried batchId is a no-op.
    * Driver state is (customer → long) plus the changelog, bounded by
    * |customer| — dim-sized at any fact volume, because each batch
    * collapses to (customer, delta) grain BEFORE collection.
    */
  final class NetSpendStore {
    private var seenBatch = -1L
    private val net = scala.collection.mutable.Map.empty[Long, Long]
    private val log = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Byte)]

    /** Fold one micro-batch's (customer, delta) rows. Emits -U (kind
      * 1) for a customer's previous total and +U (kind 2) for the
      * new one into the changelog. */
    def fold(deltas: Array[(Long, Long)], batchId: Long): Unit = {
      if (batchId <= seenBatch) return
      seenBatch = batchId
      deltas.foreach { case (cust, delta) =>
        val old = net.get(cust)
        val next = old.getOrElse(0L) + delta
        old.foreach(o => log += ((batchId, cust, o, 1: Byte)))
        net(cust) = next
        log += ((batchId, cust, next, 2: Byte))
      }
    }

    /** (batchId, customer, value, kind 1=-U/2=+U) in emission order. */
    def changelog: Seq[(Long, Long, Long, Byte)] = log.toSeq

    def toRows: Seq[(Long, Long)] = net.toSeq.sortBy(_._1)
  }

  /** One micro-batch's q93 delta frame: sale lines contribute
    * quantity×price, return lines subtract their return amount
    * (priced at the line's sales price by construction, so
    * sales − returns is EXACTLY the batch query's
    * (qty − coalesce(ret, 0))×price), collapsed to (customer, delta)
    * grain map-side — the driver only ever sees dim-bounded rows. */
  def q93Partial(saleIds: DataFrame, returnIds: DataFrame): DataFrame = {
    val sales = TpcdsGen.storeSalesFromIds(saleIds)
      .select(col("ss_customer_sk").as("cust"),
        (col("ss_quantity") * col("ss_sales_price_c")).as("delta"))
    val rets = TpcdsGen.storeReturnsFromIds(returnIds)
      // recall returns carry negative ticket numbers and never match
      // the batch query's (ticket, item) join — mirror that here
      .where(col("sr_ticket_number") > 0)
      .select(col("sr_customer_sk").as("cust"),
        (-col("sr_return_amt_c")).as("delta"))
    sales.union(rets).groupBy(col("cust")).agg(sum(col("delta")).as("delta"))
  }

  /** Collect one delta frame into [[NetSpendStore.fold]] format. */
  def collectDeltas(df: DataFrame): Array[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
}
