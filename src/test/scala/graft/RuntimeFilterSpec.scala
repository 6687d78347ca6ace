package graft

import org.apache.spark.sql.functions._

/** Plan evidence for Spark's RUNTIME bloom-filter join pruning
  * (InjectRuntimeFilter): when the build side of a shuffle join
  * carries a selective predicate, the optimizer plants a
  * `bloom_filter_agg` on it and a `might_contain` probe on the scan
  * side — rows that cannot join die AT THE SCAN, before the shuffle.
  * This is a 100 TB lever the engine gets for free by staying
  * declarative (alongside DPP and AQE); the spec pins that the
  * injection actually fires on this repo's join shapes so a
  * regression in plan structure (e.g. a filter hidden behind an
  * opaque UDF) would surface here. Thresholds are lowered because
  * the defaults (10 GB application side) are sized for clusters, not
  * test parquet.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom probe on the fact scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.load(spark, sfDir, "lineitem")
      val ord = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        s"runtime bloom filter not injected:\n${plan.take(2000)}")
      // and the result still matches the un-filtered-plan answer
      val expect = li.join(
          Tables.load(spark, sfDir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity"))).head().getDouble(0)
      assert(joined.head().getDouble(1) == expect)
    }
  }

  test("without a selective build-side predicate no filter is planted") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.load(spark, sfDir, "lineitem")
      val ord = Tables.load(spark, sfDir, "orders")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)))
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(!plan.contains("might_contain"))
    }
  }
}
