package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.changelog.Changelog.{Insert, Delete, UpdateBefore, UpdateAfter}
import graft.streaming.SemiAntiJoin
import graft.streaming.SemiAntiJoin.{SemiAntiEvent, SemiAntiEmit}

/** Dedicated streaming semi/anti join
  * (StreamingSemiAntiJoinOperator.java semantics): per-batch
  * emit/retract sequences asserted against the reference's behavior.
  */
class SemiAntiJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(anti: Boolean, name: String)(
      batches: Seq[Seq[SemiAntiEvent]]): Seq[Set[(Long, Long, Byte)]] = {
    val input = MemoryStream[SemiAntiEvent](if (anti) 71 else 72, spark, None)
    val q = SemiAntiJoin.semiAntiJoin(input.toDS(), anti)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try batches.map { b =>
      if (b.nonEmpty) input.addData(b)
      q.processAllAvailable()
      spark.table(name).as[SemiAntiEmit].collect()
        .map(e => (e.key, e.id, e.kind)).toSet
    } finally q.stop()
  }

  test("anti join: emit on no-match, retract on first match, re-emit when match retracts") {
    val k = 10L
    val snapshots = run(anti = true, "sa_anti")(Seq(
      // l1 arrives with an empty right side -> NOT EXISTS holds -> +I
      Seq(SemiAntiEvent(k, 0, Insert, 1L, 1)),
      // first right match arrives -> retract l1 (-D)
      Seq(SemiAntiEvent(k, 1, Insert, 100L, 2)),
      // a second left row while matched -> silent (stored only)
      Seq(SemiAntiEvent(k, 0, Insert, 2L, 3)),
      // the right match retracts -> both left rows re-emit (+I)
      Seq(SemiAntiEvent(k, 1, Delete, 100L, 4)),
      // l1 deletes while emitting -> -D l1
      Seq(SemiAntiEvent(k, 0, Delete, 1L, 5))))
    assert(snapshots(0) === Set((k, 1L, Insert)))
    assert(snapshots(1) === Set((k, 1L, Insert), (k, 1L, Delete)))
    assert(snapshots(2) === snapshots(1), "left arrival under a live match must not emit")
    assert(snapshots(3) === snapshots(2) + ((k, 1L, Insert.toByte)) + ((k, 2L, Insert.toByte)))
    assert(snapshots(4) === snapshots(3) + ((k, 1L, Delete.toByte)))
  }

  test("semi join: silent until first match; 1->0 transition retracts all stored rows") {
    val k = 20L
    val snapshots = run(anti = false, "sa_semi")(Seq(
      // left buffered, right empty -> EXISTS false -> nothing
      Seq(SemiAntiEvent(k, 0, Insert, 1L, 1)),
      // first match -> every stored left row emits
      Seq(SemiAntiEvent(k, 1, Insert, 100L, 2)),
      // second match (1 -> 2): no transition, no output
      Seq(SemiAntiEvent(k, 1, Insert, 101L, 3)),
      // 2 -> 1: still matched, no output
      Seq(SemiAntiEvent(k, 1, Delete, 100L, 4)),
      // 1 -> 0: EXISTS flips false -> retract the stored left row
      Seq(SemiAntiEvent(k, 1, Delete, 101L, 5))))
    assert(snapshots(0) === Set.empty)
    assert(snapshots(1) === Set((k, 1L, Insert)))
    assert(snapshots(2) === snapshots(1), "count 1->2 must not re-emit")
    assert(snapshots(3) === snapshots(2), "count 2->1 must not retract")
    assert(snapshots(4) === snapshots(3) + ((k, 1L, Delete.toByte)))
  }

  test("upsert (-U/+U) pairs on the right behave as retract+insert") {
    val k = 30L
    val snapshots = run(anti = true, "sa_upsert")(Seq(
      Seq(SemiAntiEvent(k, 0, Insert, 1L, 1)),       // +I l1 (no match)
      Seq(SemiAntiEvent(k, 1, UpdateAfter, 100L, 2)), // 0->1: -D l1
      // version replacement in ONE batch: -U then +U nets 1 -> 1,
      // crossing 0 is not possible because inserts order first
      Seq(SemiAntiEvent(k, 1, UpdateAfter, 101L, 3),
        SemiAntiEvent(k, 1, UpdateBefore, 100L, 3))))
    assert(snapshots(0) === Set((k, 1L, Insert)))
    assert(snapshots(1) === Set((k, 1L, Insert), (k, 1L, Delete)))
    assert(snapshots(2) === snapshots(1), "1->2->1 within a batch must stay silent")
  }

  test("batch twin nets to the EXISTS relation on a toggling history") {
    // key 1: purchase inserted then retracted -> final NOT EXISTS
    // key 2: purchase inserted and live      -> final EXISTS
    // key 3: no right traffic                -> final NOT EXISTS
    val events = Seq(
      SemiAntiEvent(1L, 0, Insert, 11L, Long.MinValue),
      SemiAntiEvent(2L, 0, Insert, 22L, Long.MinValue),
      SemiAntiEvent(3L, 0, Insert, 33L, Long.MinValue),
      SemiAntiEvent(1L, 1, Insert, 0L, 1),
      SemiAntiEvent(1L, 1, Delete, 0L, 2),
      SemiAntiEvent(2L, 1, Insert, 0L, 1)).toDS()
    val anti = SemiAntiJoin.batchNet(anti = true, events)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(anti === Set((1L, 11L), (3L, 33L)))
    val semi = SemiAntiJoin.batchNet(anti = false, events)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(semi === Set((2L, 22L)))
  }
}
