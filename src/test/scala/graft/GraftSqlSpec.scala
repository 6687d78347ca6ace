package graft

import org.apache.spark.sql.functions._
import graft.sql.GraftSql

/** Flink-SQL-surface rewrites produce the same results as the DSL
  * operators.
  */
class GraftSqlSpec extends SparkSpec {

  private def prep(): Unit = Tables.registerAll(spark, sfDir)

  test("TUMBLE TVF text matches DSL tumble") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT window_start, window_end, event_type, count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        |GROUP BY window_start, window_end, event_type""".stripMargin)
    val viaDsl = operators.TvfQueries.tumble(spark, sfDir)
    assert(viaSql.count() === viaDsl.count())
    assert(viaSql.exceptAll(viaDsl.toDF(viaSql.columns: _*)).count() === 0)
  }

  test("HOP TVF text matches DSL hop (slide 30m, size 1h)") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT window_start, window_end, event_type, count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts), INTERVAL '30' MINUTE, INTERVAL '1' HOUR))
        |GROUP BY window_start, window_end, event_type""".stripMargin)
    val viaDsl = operators.TvfQueries.hop(spark, sfDir)
    assert(viaSql.exceptAll(viaDsl.toDF(viaSql.columns: _*)).count() === 0)
    assert(viaSql.count() === viaDsl.count())
  }

  test("CUMULATE TVF text matches DSL cumulate (step 15m, max 1h)") {
    prep()
    val viaSql = GraftSql.sql(spark,
      """SELECT window_start, window_end, count(*) AS n, sum(value) AS sum_value
        |FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts), INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
        |GROUP BY window_start, window_end""".stripMargin)
    val viaDsl = operators.TvfQueries.cumulate(spark, sfDir)
    assert(viaSql.count() === viaDsl.count())
    assert(viaSql.exceptAll(viaDsl.toDF(viaSql.columns: _*)).count() === 0)
  }

  test("FOR SYSTEM_TIME AS OF proctime erases to snapshot join") {
    prep()
    val df = GraftSql.sql(spark,
      """SELECT s_suppkey, n_name
        |FROM supplier JOIN nation FOR SYSTEM_TIME AS OF now() ON s_nationkey = n_nationkey""".stripMargin)
    assert(df.count() === Tables.load(spark, sfDir, "supplier").count())
  }

  test("flink-only function names work in SQL text") {
    val r = GraftSql.sql(spark,
      "SELECT split_index('a-b-c', '-', 0) AS s, hamming64(7, 4) AS h").first()
    assert(r.getString(0) === "a")
    assert(r.getInt(1) === 2)
  }
}
