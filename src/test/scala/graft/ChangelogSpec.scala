package graft

import org.apache.spark.sql.functions._
import graft.changelog.Changelog

/** Retraction algebra on an explicit +I/-U/+U/-D fixture (mirrors the
  * reference's ChangelogSourceITCase shapes).
  */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  // key k: category + amount history
  private val K = Changelog.RowKindCol

  test("fromUpserts emits +I then -U/+U pairs") {
    val hist = Seq((1L, 1, "a", 10.0), (1L, 2, "b", 20.0), (2L, 3, "a", 5.0))
      .toDF("k", "seq", "cat", "amt")
    val log = Changelog.fromUpserts(hist, Seq("k"), Seq(col("seq")))
    val kinds = log.groupBy(K).count().collect()
      .map(r => (r.getByte(0), r.getLong(1))).toMap
    assert(kinds === Map(
      Changelog.Insert -> 2L, Changelog.UpdateAfter -> 1L, Changelog.UpdateBefore -> 1L))
    // the -U carries the OLD payload
    val ub = log.filter(col(K) === Changelog.UpdateBefore).first()
    assert(ub.getAs[String]("cat") === "a" && ub.getAs[Double]("amt") === 10.0)
  }

  test("aggregateRetract: updates move groups, deletes drop them to zero") {
    val log = Seq(
      ("a", 10.0, Changelog.Insert),
      ("a", 10.0, Changelog.UpdateBefore), // a:10 -> b:20
      ("b", 20.0, Changelog.UpdateAfter),
      ("b", 7.0, Changelog.Insert),
      ("b", 7.0, Changelog.Delete)         // second b row deleted
    ).toDF("cat", "amt", K)
    val out = Changelog.aggregateRetract(log, Seq("cat"), Seq("amt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map("b" -> ((1L, 20.0))), s"group a must vanish, got $out")
  }

  test("normalize returns last non-deleted row per key") {
    val log = Seq(
      (1L, 1, "x", Changelog.Insert),
      (1L, 2, "y", Changelog.UpdateAfter),
      (2L, 1, "z", Changelog.Insert),
      (2L, 2, "z", Changelog.Delete)
    ).toDF("k", "seq", "v", K)
    val out = Changelog.normalize(log, Seq("k"), Seq(col("seq")))
      .collect().map(r => (r.getLong(0), r.getAs[String]("v")))
    assert(out.toSeq === Seq((1L, "y")), s"deleted key must disappear: ${out.toSeq}")
  }

  test("retract-agg over derived changelog equals direct last-state aggregation") {
    val agg = graft.changelog.ChangelogQueries.changelogAgg(spark, sfDir)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val expected = Tables.load(spark, sfDir, "events")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    assert(agg.toSeq === expected.toSeq)
  }
}
