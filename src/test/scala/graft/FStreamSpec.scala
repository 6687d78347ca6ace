package graft

import graft.datastream.FStream

/** DataStream-facade semantics (map/filter/keyBy/reduce/process). */
class FStreamSpec extends SparkSpec {
  import spark.implicits._

  test("map/filter/keyBy/reduce behave like the reference DataStream ops") {
    val s = FStream(spark.range(1, 11).as[Long])
    val out = s.map(_ * 2).filter(_ % 4 == 0)
      .keyBy(_ % 3)
      .reduce(_ + _)
      .collect().toMap
    // values 4,8,12,16,20 keyed by %3: 4->1, 8->2, 12->0, 16->1, 20->2
    assert(out === Map(0L -> 12L, 1L -> 20L, 2L -> 28L))
  }

  test("flatMapGroups emits multiple rows per key (UDTAG shape)") {
    val s = FStream(Seq(("a", 1), ("a", 2), ("b", 5)).toDS())
    val out = s.keyBy(_._1)
      .flatMapGroups((k, it) => it.map(v => s"$k:${v._2}").toList.sorted)
      .collect().toSet
    assert(out === Set("a:1", "a:2", "b:5"))
  }
}
