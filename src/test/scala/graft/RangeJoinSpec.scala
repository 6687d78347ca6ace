package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketed range join: equals the naive theta join on every bucket
  * boundary case, emits each pair exactly once, and plans as a hash
  * join on the bucket id (not a nested loop).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive theta join incl. bucket-boundary points") {
    // points on, just below, and just above bucket boundaries (w=10)
    val pts = Seq(0L, 9L, 10L, 11L, 19L, 20L, 25L, 100L).toDF("p")
    // intervals spanning zero, one, and many buckets; degenerate [x,x]
    val ivs = Seq((0L, 0L), (5L, 9L), (8L, 12L), (10L, 30L), (95L, 105L))
      .toDF("lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 10L)
      .select("p", "lo", "hi").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "lo", "hi").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.sorted === want.sorted) // same multiset => each pair exactly once
    assert(got.nonEmpty)
  }

  test("intervalOverlap emits each overlapping pair exactly once") {
    val a = Seq((0L, 15L), (20L, 22L), (40L, 41L)).toDF("alo", "ahi")
    val b = Seq((10L, 30L), (0L, 100L), (16L, 19L)).toDF("blo", "bhi")
    val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", 10L)
      .select("alo", "blo").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = a.join(b, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("alo", "blo").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted === want.sorted)
  }

  test("the plan hash-joins on the bucket id — no nested loop") {
    val pts = spark.range(1000).select(col("id").as("p"))
    val ivs = spark.range(100).select((col("id") * 10).as("lo"), (col("id") * 10 + 5).as("hi"))
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not plan as a nested loop:\n$plan")
    assert(plan.contains("Join"), s"expected a join in:\n$plan")
  }
}
