package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

/** Exact-result test for the batch sort-based as-of join. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(s * 1000L)

  test("asOf attaches latest build at or before probe time, null when none") {
    val probe = Seq(
      (1L, ts(10), 100L), // after builds 1,2 -> build 2
      (1L, ts(5), 101L),  // exactly at build 2's time -> inclusive match
      (1L, ts(1), 102L),  // before any build -> null
      (2L, ts(10), 103L)  // key with no builds -> null
    ).toDF("k", "t", "pid")
    val build = Seq(
      (1L, ts(2), 200L),
      (1L, ts(5), 201L)
    ).toDF("k", "t", "bid")

    val out = AsOfJoin.asOf(probe, build, "k", "t",
        probeCols = Map("pid" -> "pid"), buildCols = Map("bid" -> "bid"))
      .select("pid", "bid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out === Map(100L -> 201L, 101L -> 201L, 102L -> -1L, 103L -> -1L))
  }
}
