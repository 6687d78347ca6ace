package graft.changelog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Changelog / retraction tier (SURVEY.md §1.1 — the reference's
  * RowKind model, flink-core types/RowKind.java:31-52). Spark has no
  * first-class changelog, so rows carry an explicit
  * `__rowkind` BYTE column: 0 = +I insert, 1 = -U update-before,
  * 2 = +U update-after, 3 = -D delete. Operators here consume and
  * produce that convention:
  *
  *  - [[fromUpserts]] turns a keyed upsert history into a retract
  *    stream (+I / -U / +U), the inverse of ChangelogNormalize;
  *  - [[aggregateRetract]] is the retraction-aware aggregate
  *    (GroupAggFunction.java:43's count-sign trick): +I/+U add,
  *    -U/-D subtract, groups whose support count reaches 0 vanish;
  *  - [[normalize]] collapses a changelog to current state
  *    (StreamExecChangelogNormalize.java:74);
  *  - [[dropUpdateBefore]] filters -U rows
  *    (StreamExecDropUpdateBefore.java:55).
  *
  * Scale: fromUpserts is one window shuffle on the key;
  * aggregateRetract is a plain signed hash aggregate (partial+final);
  * nothing buffers unbounded history.
  */
object Changelog {

  val RowKindCol = "__rowkind"
  val Insert: Byte = 0
  val UpdateBefore: Byte = 1
  val UpdateAfter: Byte = 2
  val Delete: Byte = 3

  /** Derive the retract stream from a keyed upsert history: the first
    * row per key (by `orderCols`) becomes +I, each subsequent row
    * emits -U with the previous row's payload followed by +U with its
    * own.
    */
  def fromUpserts(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val payload = df.columns.toSeq
    val withPrev = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(struct(payload.map(col): _*), 1).over(w))
    val upserts = withPrev.select(
      payload.map(col) :+
        when(col("__rn") === 1, lit(Insert)).otherwise(lit(UpdateAfter)).as(RowKindCol): _*)
    val retracts = withPrev.filter(col("__rn") > 1).select(
      payload.map(c => col(s"__prev.$c").as(c)) :+ lit(UpdateBefore).as(RowKindCol): _*)
    upserts.unionByName(retracts)
  }

  private def sign: Column =
    when(col(RowKindCol) === Insert || col(RowKindCol) === UpdateAfter, lit(1L))
      .otherwise(lit(-1L))

  /** Retraction-aware aggregate: per group, signed count and signed
    * sums. Groups retracted down to zero support disappear (the
    * reference's count(*)-based liveness check in GroupAggFunction).
    */
  def aggregateRetract(changelog: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String], avgCols: Seq[String] = Nil): DataFrame = {
    val sums = sumCols.map(c => sum(col(c) * sign).as(s"sum_$c"))
    // AVG divides by count(non-null), not count(*) — nncnt_<c> is the
    // signed count of rows where <c> is present (SQL AVG semantics)
    val nncnts = avgCols.map(c =>
      sum(when(col(c).isNotNull, sign).otherwise(lit(0L))).as(s"nncnt_$c"))
    changelog
      .groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("cnt"), (sums ++ nncnts): _*)
      .filter(col("cnt") > 0)
  }

  /** Retraction-aware aggregate WITH max/min — the batch twin of the
    * reference's MaxWithRetractAggFunction.java / MinWithRetract...:
    * max/min under deletes need the live value multiset, not a signed
    * scalar. Two-stage: net count per (group, value) — dead values
    * (net 0) drop out — then max/min/sum/count over live values.
    * Both stages are partial+final hash aggregates; the multiset
    * never materializes per group, so skewed groups don't OOM.
    */
  def aggregateRetractMinMax(changelog: DataFrame, groupCols: Seq[String],
      valueCol: String, withNonNullCount: Boolean = false): DataFrame = {
    val perValue = changelog
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(sum(sign).as("__vcnt"))
      .filter(col("__vcnt") > 0)
    val aggs = Seq(
      sum(col(valueCol) * col("__vcnt")).as(s"sum_$valueCol"),
      max(col(valueCol)).as(s"max_$valueCol"),
      min(col(valueCol)).as(s"min_$valueCol")) ++
      // live count of rows whose value is present — AVG's divisor
      (if (withNonNullCount)
        Seq(sum(when(col(valueCol).isNotNull, col("__vcnt")).otherwise(lit(0L)))
          .as(s"nncnt_$valueCol"))
      else Nil)
    perValue
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("__vcnt")).as("cnt"), aggs: _*)
  }

  /** ListAgg under retraction (ListAggWithRetractAggFunction.java):
    * the aggregated list contains exactly the LIVE instances — net
    * count per (group, value) expanded back into rows, then sorted
    * listagg. Expansion via `sequence` keeps it a pure Catalyst plan
    * (no UDF): shuffle volume is live rows, same as the input.
    */
  def aggregateRetractListAgg(changelog: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val perValue = changelog
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(sum(sign).as("__vcnt"))
      .filter(col("__vcnt") > 0)
    perValue
      .withColumn("__i", explode(expr("sequence(1, __vcnt)")))
      .groupBy(groupCols.map(col): _*)
      .agg(concat_ws(",", sort_array(collect_list(col(valueCol))))
        .as(s"listagg_$valueCol"))
  }

  /** Collapse a changelog to its current state: latest non-retract
    * row per key, deletes removed. The rowkind is the version
    * tiebreaker: a -D carrying the same version columns as the +U it
    * deletes (a CDC delete's before-image) must order AFTER it, or
    * the deleted key could survive on an ambiguous window order.
    */
  def normalize(changelog: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols :+ col(RowKindCol).asc: _*)
    changelog
      .filter(col(RowKindCol) =!= UpdateBefore)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__max", max(col("__rn")).over(Window.partitionBy(keys.map(col): _*)))
      .filter(col("__rn") === col("__max") && col(RowKindCol) =!= Delete)
      .drop("__rn", "__max", RowKindCol)
  }

  /** DropUpdateBefore — forward only +I/+U/-D. */
  def dropUpdateBefore(changelog: DataFrame): DataFrame =
    changelog.filter(col(RowKindCol) =!= UpdateBefore)
}
