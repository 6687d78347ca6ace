package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.RetractStream
import graft.streaming.RetractStream.ChangeEvent
import graft.changelog.Changelog.{Insert, UpdateBefore, UpdateAfter, Delete}

/** Changelog source → streaming retract aggregate, end to end: a
  * MemoryStream of +I/-U/+U/-D rows drives an update-mode aggregate
  * with MaxWithRetract-style multiset state.
  */
class RetractStreamSpec extends SparkSpec {
  import spark.implicits._

  test("max falls back when the current max is deleted; dead group emits -D") {
    val input = MemoryStream[ChangeEvent](21, spark, None)
    val out = RetractStream.groupAggRetract(input.toDS())
    val q = out.writeStream.format("memory").queryName("retract_agg")
      .outputMode("update").start()
    try {
      def rows() = spark.table("retract_agg").as[RetractStream.AggEmit].collect().toList

      input.addData(ChangeEvent("a", 5, Insert), ChangeEvent("a", 3, Insert))
      q.processAllAvailable()
      assert(rows().last === RetractStream.AggEmit("a", 2, 8, 5, 3, 5, 3, "3,5", UpdateAfter))

      // -U/+U update pair: 3 -> 7 (last_value follows arrival order)
      input.addData(ChangeEvent("a", 3, UpdateBefore), ChangeEvent("a", 7, UpdateAfter))
      q.processAllAvailable()
      assert(rows().last === RetractStream.AggEmit("a", 2, 12, 7, 5, 5, 7, "5,7", UpdateAfter))

      // delete the CURRENT MAX: max must fall back to 5 (multiset
      // state; a signed-sum accumulator cannot express this)
      input.addData(ChangeEvent("a", 7, Delete))
      q.processAllAvailable()
      assert(rows().last === RetractStream.AggEmit("a", 1, 5, 5, 5, 5, 5, "5", UpdateAfter))

      // delete the last row: the group vanishes with a -D emission
      input.addData(ChangeEvent("a", 5, Delete))
      q.processAllAvailable()
      assert(rows().last === RetractStream.AggEmit("a", 0, 0, 0, 0, 0, 0, "", Delete))

      // a key that never went live emits nothing on net-zero input
      input.addData(ChangeEvent("b", 9, Insert), ChangeEvent("b", 9, Delete))
      q.processAllAvailable()
      assert(!rows().exists(_.key == "b"))
    } finally q.stop()
  }

  test("duplicate values retract one occurrence at a time") {
    val input = MemoryStream[ChangeEvent](22, spark, None)
    val out = RetractStream.groupAggRetract(input.toDS())
    val q = out.writeStream.format("memory").queryName("retract_agg2")
      .outputMode("update").start()
    try {
      input.addData(ChangeEvent("k", 4, Insert), ChangeEvent("k", 4, Insert))
      q.processAllAvailable()
      input.addData(ChangeEvent("k", 4, Delete))
      q.processAllAvailable()
      val last = spark.table("retract_agg2").as[RetractStream.AggEmit].collect().last
      // one of the two 4s retracted (the oldest instance): max stays 4,
      // count drops to 1, first/last collapse to the surviving instance
      assert(last === RetractStream.AggEmit("k", 1, 4, 4, 4, 4, 4, "4", UpdateAfter))
    } finally q.stop()
  }
}
