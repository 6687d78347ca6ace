package graft

import org.apache.spark.sql.functions._
import graft.functions.{FlinkFunctions => F}
import graft.plans.GraftExtensions

/** Injected optimizer rule folds self-hamming to a constant. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("hamming64(x, x) folds to 0 in the optimized plan") {
    GraftExtensions.install(spark)
    val df = Seq(1L, 2L, 3L).toDF("sig")
      .select(F.hamming64($"sig", $"sig").as("hd"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("hamming64"), optimized)
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(0, 0, 0))
  }

  test("rule preserves null semantics and leaves distinct args alone") {
    GraftExtensions.install(spark)
    val rows = Seq((Some(5L), 6L), (None, 6L)).toDF("a", "b")
      .select(F.hamming64($"a", $"a").as("self"), F.hamming64($"a", $"b").as("cross"))
      .collect()
    assert(rows(0).getInt(0) === 0)
    assert(rows(0).getInt(1) === java.lang.Long.bitCount(5L ^ 6L))
    assert(rows(1).isNullAt(0), "null input must stay null")
    // non-literal source: the cross-arg call must survive the rule
    val fromTable = Tables.load(spark, sfDir, "events")
      .select(F.hamming64($"event_id", $"user_id").as("cross"))
    val optimized = fromTable.queryExecution.optimizedPlan.toString
    assert(optimized.contains("hamming64"), "cross-arg call must survive: " + optimized)
  }
}
