package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.JdbcConnector
import graft.streaming.LookupJoin

/** JDBC connector wire tests against embedded Derby — scan, append,
  * upsert (UPDATE-then-INSERT), partitioned read, and the JDBC lookup
  * delegate under the cache stack.
  */
class JdbcConnectorSpec extends SparkSpec {

  private def freshDb(tag: String): Map[String, String] = {
    val dir = new java.io.File(s"/tmp/graft_jdbc_spec/$tag")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }
    if (dir.exists()) del(dir)
    Map("url" -> s"jdbc:derby:${dir.getAbsolutePath}/db;create=true",
      "table-name" -> s"T_$tag".toUpperCase(java.util.Locale.ROOT))
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("name", StringType),
    StructField("bal", DoubleType)))

  private def df(rows: (Long, String, Double)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2), schema)

  test("append write + scan round-trip, no primary key") {
    val opts = freshDb("append")
    JdbcConnector.ensureTable(opts, schema, Nil)
    JdbcConnector.write(df((1L, "a", 1.0), (2L, "b", 2.0))
      .toDF("k", "name", "bal"), opts, Nil, overwrite = false)
    JdbcConnector.write(df((3L, "c", 3.0)).toDF("k", "name", "bal"),
      opts, Nil, overwrite = false)
    val back = JdbcConnector.read(spark, opts).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back === Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
  }

  test("primary-key write upserts: updates hit, misses insert, no duplicates") {
    val opts = freshDb("upsert")
    JdbcConnector.ensureTable(opts, schema, Seq("k"))
    JdbcConnector.write(df((1L, "a", 1.0), (2L, "b", 2.0)),
      opts, Seq("k"), overwrite = false)
    // k=2 updates in place, k=9 is a fresh insert
    JdbcConnector.write(df((2L, "b2", 22.0), (9L, "i", 9.0)),
      opts, Seq("k"), overwrite = false)
    val back = JdbcConnector.read(spark, opts).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back === Set((1L, "a", 1.0), (2L, "b2", 22.0), (9L, "i", 9.0)))
  }

  test("overwrite truncates before writing") {
    val opts = freshDb("overwrite")
    JdbcConnector.ensureTable(opts, schema, Seq("k"))
    JdbcConnector.write(df((1L, "a", 1.0), (2L, "b", 2.0)),
      opts, Seq("k"), overwrite = false)
    JdbcConnector.write(df((5L, "z", 5.0)), opts, Seq("k"), overwrite = true)
    val back = JdbcConnector.read(spark, opts).collect()
    assert(back.map(_.getLong(0)).toSet === Set(5L))
  }

  test("scan.partition options shard the read like the reference's " +
      "NumericBetweenParametersProvider") {
    val opts = freshDb("parts")
    JdbcConnector.ensureTable(opts, schema, Seq("k"))
    JdbcConnector.write(df((1L to 40L).map(i => (i, s"r$i", i.toDouble)): _*),
      opts, Seq("k"), overwrite = false)
    val partitioned = opts ++ Map(
      "scan.partition.column" -> "k", "scan.partition.num" -> "4",
      "scan.partition.lower-bound" -> "1", "scan.partition.upper-bound" -> "40")
    val scan = JdbcConnector.read(spark, partitioned)
    assert(scan.rdd.getNumPartitions === 4)
    assert(scan.count() === 40L)
  }

  test("jdbc lookup delegate under the LRU cache: repeat keys never re-hit the DB") {
    val opts = freshDb("lookup")
    JdbcConnector.ensureTable(opts, schema, Seq("k"))
    JdbcConnector.write(df((1L, "one", 1.0), (2L, "two", 2.0)),
      opts, Seq("k"), overwrite = false)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val counted = new LookupJoin.LookupFunction[Any, Map[String, Any]] {
      private val inner = new JdbcConnector.JdbcLookup(opts, "k", Seq("name", "bal"))
      override def lookup(key: Any): Seq[Map[String, Any]] = {
        hits.incrementAndGet(); inner.lookup(key)
      }
    }
    val cached = new LookupJoin.CachingLookup(counted, 16)
    assert(cached.lookup(1L).head("name") === "one")
    assert(cached.lookup(1L).head("name") === "one")
    assert(cached.lookup(2L).head("bal") === 2.0)
    assert(cached.lookup(404L).isEmpty) // negative result cached too
    assert(cached.lookup(404L).isEmpty)
    assert(hits.get() === 3)
  }

  test("full-cache loader snapshots the whole dimension and reloads on the interval") {
    val opts = freshDb("fullcache")
    JdbcConnector.ensureTable(opts, schema, Seq("k"))
    JdbcConnector.write(df((1L, "v1", 1.0)), opts, Seq("k"), overwrite = false)
    var now = 0L
    val full = new LookupJoin.FullCachingLookup(
      JdbcConnector.fullLoader(opts, "k", Seq("name")), 1000L, () => now)
    assert(full.lookup(1L).head("name") === "v1")
    // dimension changes in the DB; within the interval the stale snapshot serves
    JdbcConnector.write(df((1L, "v2", 1.0)), opts, Seq("k"), overwrite = false)
    now = 500L
    assert(full.lookup(1L).head("name") === "v1")
    now = 1500L // past the reload boundary → fresh snapshot
    assert(full.lookup(1L).head("name") === "v2")
  }

  test("streaming upsert sink: micro-batches land as keyed upserts " +
      "(GenericJdbcSinkFunction)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val opts = freshDb("stream")
    JdbcConnector.ensureTable(opts, schema, Seq("k"))
    val ckptDir = new java.io.File("/tmp/graft_jdbc_spec/stream_ckpt")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del)
      f.delete()
    }
    if (ckptDir.exists()) del(ckptDir)
    val input = MemoryStream[(Long, String, Double)](201, spark, None)
    val q = JdbcConnector.writeStream(
      input.toDF().toDF("k", "name", "bal"), opts, Seq("k"),
      ckptDir.getAbsolutePath, "jdbc_sink_spec")
    try {
      input.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      input.addData((2L, "b2", 22.0), (3L, "c", 3.0)) // k=2 upserts
      q.processAllAvailable()
    } finally q.stop()
    val back = JdbcConnector.read(spark, opts).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back === Set((1L, "a", 1.0), (2L, "b2", 22.0), (3L, "c", 3.0)))
  }

  test("changelog write: +I/+U upsert, -D deletes, -U is a no-op (retract-stream sink)") {
    import org.apache.spark.sql.functions.lit
    val opts = freshDb("changelog")
    JdbcConnector.ensureTable(opts, schema, Seq("k"))
    val C = graft.changelog.Changelog
    val rows = Seq(
      (1L, "a", 1.0, C.Insert),
      (2L, "b", 2.0, C.Insert),
      (1L, "a", 1.0, C.UpdateBefore),  // before-image: no action
      (1L, "a2", 11.0, C.UpdateAfter), // upsert in place
      (2L, "b", 2.0, C.Delete))        // key 2 removed
    import spark.implicits._
    // single partition so the per-key order is the sequence above
    val df = rows.toDF("k", "name", "bal", C.RowKindCol)
      .withColumn(C.RowKindCol, org.apache.spark.sql.functions
        .col(C.RowKindCol).cast("byte"))
      .coalesce(1)
    JdbcConnector.writeChangelog(df, opts, Seq("k"))
    val back = JdbcConnector.read(spark, opts).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back === Set((1L, "a2", 11.0)))
    // a later re-insert of a deleted key lands as a fresh row
    JdbcConnector.writeChangelog(
      Seq((2L, "b3", 22.0, C.Insert)).toDF("k", "name", "bal", C.RowKindCol)
        .withColumn(C.RowKindCol, org.apache.spark.sql.functions
          .col(C.RowKindCol).cast("byte")),
      opts, Seq("k"))
    assert(JdbcConnector.read(spark, opts).count() === 2)
  }

  test("DDL end-to-end: q_jdbc_roundtrip matches the in-Spark equivalent") {
    val got = graft.sources.JdbcQueries.jdbcRoundtrip(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toSet
    val want = spark.sql(
      """SELECT n_name, count(*) AS n_suppliers,
        |       sum(CASE WHEN s_suppkey % 10 = 0 THEN s_acctbal + 100
        |                ELSE s_acctbal END) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q_catalog_federation reads the Derby table through the registered catalog") {
    val got = graft.sources.JdbcQueries.catalogFederation(spark, sfDir)
    // the plan must be the LIVE federated scan (DSv2 pushes the whole
    // aggregate into the external engine), not a materialized copy
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), s"expected pushed aggregate in:\n$plan")
    val want = spark.sql(
      """SELECT s_nationkey, count(*) AS n_suppliers,
        |       sum(CASE WHEN s_suppkey % 10 = 0 THEN s_acctbal + 100
        |                ELSE s_acctbal END) AS total_bal
        |FROM supplier GROUP BY s_nationkey""".stripMargin)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(keyed(got) === keyed(want))
    assert(got.count() > 0)
  }

  test("q_fed_stats_join: ANALYZE on the federated table flips the fact join " +
      "to broadcast (statistics-injected planning)") {
    val got = graft.sources.JdbcQueries.fedStatsJoin(spark, sfDir)
    // the unsized JDBC dim would plan SortMerge (fact shuffles); the
    // recorded row count must flip it to a broadcast of the dim side
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the analyzed federated dim to broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact side must not shuffle for a dim lookup:\n$plan")
    val want = spark.sql(
      """SELECT s_name, count(*) AS n_items,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(keyed(got) === keyed(want))
  }

  test("q_jdbc_lookup joins every supplier to its nation name") {
    val got = graft.sources.JdbcQueries.jdbcLookup(spark, sfDir)
    val want = spark.sql(
      "SELECT s_suppkey, n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey")
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      want.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }
}
