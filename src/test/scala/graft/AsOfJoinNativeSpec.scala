package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinNative

/** Custom Catalyst operator ladder: logical AsOfJoinPlan → strategy →
  * AsOfJoinExec with declared distribution/ordering contracts.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of join matches the composed DSL as-of join") {
    val native = operators.TvfQueries.asofJoinNative(spark, sfDir)
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    val composed = operators.TvfQueries.asofJoin(spark, sfDir)
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("planner inserts exchanges and sorts around AsOfJoinExec") {
    val df = operators.TvfQueries.asofJoinNative(spark, sfDir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("AsOfJoin"), p)
    // EnsureRequirements must have satisfied the declared contracts
    assert("Arguments: hashpartitioning".r.findAllIn(p).size >= 2, p)
    assert(p.contains("Sort"), p)
  }

  test("unmatched probe rows keep nulls; self-join keys stay distinct") {
    val probe = Seq((1L, 10L, "p1"), (1L, 5L, "p0"), (2L, 7L, "px"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 8L, "b8"), (1L, 9L, "b9"), (3L, 1L, "zz"))
      .toDF("k", "t", "v")
      .select(col("k").as("bk"), col("t").as("bt"), col("v"))
    val rows = AsOfJoinNative.asOf(probe, build, "k", "t", "bk", "bt")
      .select("tag", "v", "bt").collect()
    val out = rows.map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // p1@10 matches b9@9 (latest <= 10); p0@5 has no build <= 5; key 2 unmatched
    assert(out === Set(("p1", Some("b9")), ("p0", None), ("px", None)))
    // non-nullable build columns must surface as NULL (not 0) on misses
    rows.filter(_.getString(0) != "p1").foreach(r => assert(r.isNullAt(2), r.toString))
  }
}
