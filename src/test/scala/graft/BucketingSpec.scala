package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Co-located join via bucketing: writing both fact tables bucketed
  * by the join key lets the join run with ZERO shuffle — the
  * pre-partitioning strategy for repeated 100 TB fact-fact joins
  * (SURVEY.md §7: "reuse a partitioning across stages").
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-orderkey join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.load(spark, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.load(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))
    // force a non-broadcast join so the bucketing is what saves the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      val shufflesBeforeAgg = plan.linesIterator
        .takeWhile(!_.contains("HashAggregate"))
        .count(_.contains("Exchange"))
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"join input must not reshuffle:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"join input must not reshuffle:\n$plan")
      // correctness unchanged
      val direct = Tables.load(spark, sfDir, "lineitem")
        .join(Tables.load(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      assert(joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ===
        direct.collect().map(r => (r.getString(0), r.getDouble(1))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
