package graft

import org.apache.spark.sql.functions._

import graft.table.GraftTable

/** Fluent Table API facade mirroring the reference's Table-API ITCase
  * shapes (flink-table-planner batch/table CalcITCase,
  * AggregationITCase, JoinITCase, SortITCase, SetOperatorsITCase) —
  * each case cross-checked against the straight DataFrame plan.
  */
class TableApiSpec extends SparkSpec {

  private def li = GraftTable.of(Tables.load(spark, sfDir, "lineitem"))
  private def nation = GraftTable.of(Tables.load(spark, sfDir, "nation"))
  private def region = GraftTable.of(Tables.load(spark, sfDir, "region"))

  test("CalcITCase shape: select + where with the string DSL") {
    val got = li
      .select("l_orderkey, l_quantity, l_returnflag")
      .where("l_quantity > 30 && l_returnflag === 'R'")
      .toDF.collect()
    val want = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .where(col("l_quantity") > 30 && col("l_returnflag") === "R")
      .collect()
    assert(got.length === want.length && got.length > 0)
    // expression select: arithmetic + suffix call + alias
    val e = li.select("l_orderkey + 1 as k1, l_returnflag.lowerCase() as rf")
      .toDF.limit(5).collect()
    assert(e.forall(r => r.getString(1) == r.getString(1).toLowerCase))
  }

  test("AggregationITCase shape: groupBy + sum/avg/count with aliases") {
    val got = li.groupBy("l_returnflag")
      .select("l_returnflag, l_quantity.sum as sum_qty, l_quantity.avg as avg_qty, l_orderkey.count as n")
      .toDF.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(3))).toSet
    val want = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum("l_quantity"), avg("l_quantity"), count("l_orderkey"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(3))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("JoinITCase shape: unconditioned join narrowed by where") {
    val got = nation.join(region).where("n_regionkey === r_regionkey")
      .select("n_name, r_name").toDF
    // the cross join + equality predicate must plan as a real join,
    // not a cartesian scan
    assert(got.queryExecution.executedPlan.toString.contains("Join"))
    val want = Tables.load(spark, sfDir, "nation")
      .join(Tables.load(spark, sfDir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name", "r_name").collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet === want)
    assert(want.size === 25)
    // conditioned outer join
    val left = nation.leftOuterJoin(region, "n_regionkey === r_regionkey")
      .select("n_name, r_name").toDF.count()
    assert(left === 25)
  }

  test("SortITCase shape: orderBy desc + offset + fetch") {
    val got = li.select("l_orderkey").distinct()
      .orderBy("l_orderkey.desc").offset(2).fetch(3)
      .toDF.collect().map(_.getLong(0)).toSeq
    val want = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey").distinct()
      .orderBy(col("l_orderkey").desc).offset(2).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(got === want && got.length === 3)
  }

  test("SetOperatorsITCase shape: union dedups, unionAll keeps, minus/intersect") {
    val a = nation.select("n_regionkey")
    val b = nation.select("n_regionkey").filter("n_regionkey < 2")
    assert(a.union(b).toDF.count() === 5) // dedup to the 5 region keys
    assert(a.unionAll(b).toDF.count() === 25 + 10)
    assert(a.distinct().minus(b.distinct()).toDF.collect()
      .map(_.getInt(0)).toSet === Set(2, 3, 4))
    assert(a.intersect(b).toDF.collect().map(_.getInt(0)).toSet === Set(0, 1))
  }

  test("column ops: as, addColumns, renameColumns, dropColumns, cast, like, in") {
    val t = region.as("rk, rn")
    assert(t.toDF.columns.toSeq === Seq("rk", "rn"))
    val t2 = t.addColumns("rk + 100 as rk2")
    assert(t2.toDF.columns.toSeq === Seq("rk", "rn", "rk2"))
    assert(t2.toDF.collect().forall(r =>
      r.getAs[Number]("rk2").longValue === r.getAs[Number]("rk").longValue + 100))
    val t3 = t.renameColumns("rk as region_key")
    assert(t3.toDF.columns.contains("region_key"))
    val casted = region.select("r_regionkey.cast(STRING) as s").toDF
    assert(casted.schema.head.dataType === org.apache.spark.sql.types.StringType)
    assert(nation.filter("n_name.like('%ION_1%')").toDF.count() > 0)
    assert(nation.filter("n_regionkey.in(0, 1)").toDF.count() === 10)
  }

  test("GroupWindowITCase shape: Tumble window groupBy + w.start/w.end measures") {
    import graft.table.Tumble
    val events = GraftTable.of(Tables.load(spark, sfDir, "events"))
    val got = events
      .window(Tumble over "1.hour" on "ts" as "w")
      .groupBy("w, user_id")
      .select("user_id, w.start as ws, w.end as we, value.sum as sv, event_id.count as n")
      .toDF
    assert(got.columns.toSeq === Seq("user_id", "ws", "we", "sv", "n"))
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(sum("value").as("sv"), count("event_id").as("n"))
      .select(col("user_id"), col("window.start").as("ws"), col("window.end").as("we"),
        col("sv"), col("n"))
    assert(got.collect().map(_.toSeq).toSet === want.collect().map(_.toSeq).toSet)
    assert(got.count() > 0)
  }

  test("window alias substitution is token-level: string literals and as-aliases survive") {
    import graft.table.Tumble
    val events = GraftTable.of(Tables.load(spark, sfDir, "events"))
    val got = events
      .window(Tumble over "1.hour" on "ts" as "w")
      .groupBy("w, user_id")
      // the output alias 'w' and the literal '%w%' both contain the
      // window alias word — neither is a window-key REFERENCE, so
      // neither may be rewritten to the tagged column name
      .select("user_id, w.start as w, w.start.cast('string').like('%w%') as lw, value.sum as sv")
      .toDF
    assert(got.columns.toSeq === Seq("user_id", "w", "lw", "sv"))
    // the like pattern must survive verbatim into the plan (the old
    // regex rewrote it to '%__cN%')
    val plan = got.queryExecution.analyzed.toString
    assert(plan.contains("%w%"), s"literal corrupted by alias substitution:\n$plan")
    assert(got.count() > 0)
  }

  test("GroupWindowITCase shape: Slide and Session windows") {
    import graft.table.{Session, Slide}
    val events = GraftTable.of(Tables.load(spark, sfDir, "events"))
    val slid = events
      .window(Slide over "1.hour" every "30.minutes" on "ts" as "w")
      .groupBy("w, event_type")
      .select("event_type, w.start as ws, event_id.count as n")
      .toDF
    val wantSlide = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count("event_id")).count()
    assert(slid.count() === wantSlide)
    val sess = events
      .window(Session withGap "10.minutes" on "ts" as "w")
      .groupBy("w, user_id")
      .select("user_id, w.start as ws, w.end as we, value.sum as sv")
      .toDF
    val wantSess = Tables.load(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(sum("value")).count()
    assert(sess.count() === wantSess)
  }

  test("OverWindowITCase shape: measures over a declared over-window") {
    import graft.table.Over
    val events = GraftTable.of(Tables.load(spark, sfDir, "events"))
    val got = events
      .window(Over partitionBy "user_id" orderBy "ts, event_id" preceding "UNBOUNDED_ROW" as "o")
      .select("user_id, event_id, value.sum over o as running, event_id.count over o as n")
      .toDF
    assert(got.columns.toSeq === Seq("user_id", "event_id", "running", "n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Long.MinValue, 0)
    val want = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        sum("value").over(w).as("running"), count("event_id").over(w).as("n"))
    assert(got.collect().map(_.toSeq).toSet === want.collect().map(_.toSeq).toSet)
    // bounded rows frame
    val b = events
      .window(Over partitionBy "user_id" orderBy "ts, event_id" preceding "2.rows" as "o")
      .select("user_id, event_id, value.sum over o as s3")
      .toDF
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
    val wantB = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), sum("value").over(wb).as("s3"))
    assert(b.collect().map(_.toSeq).toSet === wantB.collect().map(_.toSeq).toSet)
  }

  test("TableEnvironment.from reads a registered table") {
    Tables.registerAll(spark, sfDir)
    assert(GraftTable.from(spark, "region").select("r_name").toDF.count() === 5)
  }
}
