package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-property goldens (analog of the reference's 222 checked-in
  * optimizer plan XMLs, scoped to the properties that matter at
  * 100 TB): filters reach the parquet scan, dims broadcast, TopN
  * rank-limits push into the shuffle, aggregates are partial+final.
  * A regression here is a performance bug even when results stay
  * correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan(operators.BatchQueries.q1Agg(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q1_agg scan reads only the 8 referenced columns") {
    val p = plan(operators.BatchQueries.q1Agg(spark, sfDir))
    val readSchema = p.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"column pruning lost: $readSchema")
    assert(readSchema.contains("l_returnflag"), readSchema)
  }

  test("lookup join broadcasts the dimension side") {
    val p = plan(operators.MiscQueries.lookupJoin(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("topn pushes the rank limit into the shuffle (WindowGroupLimit)") {
    val p = plan(operators.WindowQueries.topN(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("sort_limit plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(operators.CalcSetQueries.sortLimit(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("date-range filter on orders is pushed in the tpch q10 join tree") {
    val p = plan(operators.TpchQueries.q10(spark, sfDir))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }
}
