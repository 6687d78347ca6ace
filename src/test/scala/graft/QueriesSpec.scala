package graft

import org.apache.spark.sql.functions._

/** ITCase-style smoke + shape checks for every SparkEntry query at
  * sf0.001 (the DuckDB oracle at sf0.01 is the authoritative value
  * gate; these keep `sbt test` meaningful and fast).
  */
class QueriesSpec extends SparkSpec {

  test("every declared query runs and q/oracle keys line up") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    // every oracle refers to a declared query
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      withClue(name) { assert(n >= 0) }
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg groups are exact") {
    val rows = operators.BatchQueries.q1Agg(spark, sfDir)
      .select("l_returnflag", "l_linestatus").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length === 6)
    assert(rows.toSet.size === 6)
  }

  test("topn emits at most 3 per customer, correctly ordered") {
    val df = operators.WindowQueries.topN(spark, sfDir)
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(bad === 0)
    val perCust = df.filter(col("o_custkey") === df.select("o_custkey").first().getLong(0))
      .orderBy("rn").collect()
    assert(perCust.sliding(2).forall {
      case Array(a, b) => a.getDouble(2) >= b.getDouble(2)
      case _ => true
    })
  }

  test("dedup_first keeps exactly one row per user") {
    val df = operators.WindowQueries.dedupFirst(spark, sfDir)
    assert(df.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
  }

  test("asof join: every purchase appears exactly once") {
    val purchases = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    val df = operators.TvfQueries.asofJoin(spark, sfDir)
    assert(df.count() === purchases)
    // matched click always at or before the purchase
    assert(df.filter(col("cts") > col("pts")).count() === 0)
  }

  test("cumulate windows nest: hourly total equals last slice") {
    val cum = operators.TvfQueries.cumulate(spark, sfDir)
    val full = cum.filter(expr("wend = wstart + INTERVAL 1 HOUR"))
      .agg(sum("n")).first().getLong(0)
    val events = Tables.load(spark, sfDir, "events").count()
    assert(full === events)
  }
}
