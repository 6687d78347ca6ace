package graft

import org.apache.spark.sql.functions._

import graft.catalog.GraftCatalog
import graft.sql.GraftSql

/** Bucketed filesystem tables — the co-located-join layout: both
  * sides bucketed on the join key with the same count read
  * pre-partitioned, so the join plans WITHOUT a shuffle exchange
  * (Spark's bucketed-scan path). The 100 TB story: every repeated
  * fact-fact join on the bucket key skips its two biggest exchanges.
  */
class BucketedTableSpec extends SparkSpec {

  test("co-bucketed tables join with zero shuffle exchanges") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    GraftCatalog.executeDdl(spark,
      """CREATE TABLE b_orders (o_orderkey BIGINT, o_totalprice DOUBLE)
        |WITH ('connector' = 'filesystem', 'buckets' = '8',
        |  'bucket-by' = 'o_orderkey')""".stripMargin)
    GraftCatalog.executeDdl(spark,
      """CREATE TABLE b_lineitem (l_orderkey BIGINT, l_quantity DOUBLE)
        |WITH ('connector' = 'filesystem', 'buckets' = '8',
        |  'bucket-by' = 'l_orderkey')""".stripMargin)
    try {
      GraftCatalog.insertInto(spark, "b_orders", orders, overwrite = true)
      GraftCatalog.insertInto(spark, "b_lineitem", li, overwrite = true)
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("q"), first("o_totalprice").as("p"))
      // force the join path (tiny test tables would broadcast)
      val (rows, plan) = withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        (joined.count(), joined.queryExecution.executedPlan.toString)
      }
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // correctness against the unbucketed plan
      val want = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(sum("l_quantity")).count()
      assert(rows === want)
      // append keeps the bucket spec (saveAsTable validates it)
      GraftCatalog.insertInto(spark, "b_orders", orders.limit(10), overwrite = false)
      assert(spark.table("b_orders").count() === orders.count() + 10)
    } finally {
      GraftCatalog.executeDdl(spark, "DROP TABLE b_orders")
      GraftCatalog.executeDdl(spark, "DROP TABLE b_lineitem")
    }
    assert(!spark.catalog.tableExists("b_orders")) // metastore entry dropped
  }

  test("database surface: CREATE/USE/SHOW CURRENT DATABASE route through the front door") {
    GraftSql.sql(spark, "CREATE DATABASE IF NOT EXISTS graft_db_spec")
    val dbs = GraftSql.sql(spark, "SHOW DATABASES").collect().map(_.getString(0))
    assert(dbs.contains("graft_db_spec"))
    val before = GraftSql.sql(spark, "SHOW CURRENT DATABASE").first().getString(0)
    GraftSql.sql(spark, "USE graft_db_spec")
    try {
      assert(GraftSql.sql(spark, "SHOW CURRENT DATABASE").first().getString(0)
        === "graft_db_spec")
      assert(GraftSql.sql(spark, "SHOW CURRENT CATALOG").first().getString(0)
        === "spark_catalog")
    } finally {
      GraftSql.sql(spark, s"USE $before")
      GraftSql.sql(spark, "DROP DATABASE graft_db_spec")
    }
  }

  test("bucketed signature store: the near-dup probe shuffles only the batch") {
    import spark.implicits._
    val store = (1L to 40L).map(i =>
        (i, s"store doc number $i with its own padding tokens aa$i bb$i cc$i dd$i ee$i"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "store doc number 7 with its own padding tokens aa7 bb7 cc7 dd7 ee7 extra"),
      (101L, "a wholly new batch document with entirely fresh vocabulary")).toDF("doc_id", "text")
    GraftCatalog.executeDdl(spark,
      """CREATE TABLE sig_store (doc_id BIGINT, sig ARRAY<BIGINT>,
        |  band INT, band_hash BIGINT)
        |WITH ('connector' = 'filesystem', 'buckets' = '8',
        |  'bucket-by' = 'band,band_hash')""".stripMargin)
    try {
      GraftCatalog.insertInto(spark, "sig_store",
        graft.text.TextQueries.bandedSignatures(store), overwrite = true)
      val probe = graft.text.TextQueries.bandedSignatures(batch)
        .select(col("band"), col("band_hash"),
          col("doc_id").as("id_b"), col("sig").as("sig_b"))
      val joined = spark.table("sig_store")
        .join(probe, Seq("band", "band_hash"))
        .select(col("doc_id").as("id_a"), col("id_b"))
        .distinct()
      val (pairs, plan) = withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        (joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet,
          joined.queryExecution.executedPlan.toString)
      }
      // the store near-dup collides with its batch twin; the fresh doc hits nothing
      assert(pairs.contains(7L -> 100L), s"pairs $pairs")
      assert(!pairs.exists(_._2 == 101L), s"pairs $pairs")
      // the store side reads pre-bucketed: exactly ONE exchange on
      // the (band, band_hash) join key — the batch side's — and no
      // exchange between the sig_store scan and the join (the plan's
      // other exchanges are the batch's internal signature aggregate
      // and the output distinct, both batch-sized); an unbucketed
      // store would add a join-key exchange carrying the (at scale)
      // corpus-sized signature table
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"),
        s"store scan not bucketed:\n$plan")
      val bandKeyExchanges = "Exchange hashpartitioning\\(band"
        .r.findAllIn(plan).size
      assert(bandKeyExchanges == 1,
        s"expected only the batch side to shuffle on the bucket key:\n$plan")
      val storeSide = plan.substring(plan.indexOf("SortMergeJoin"),
        plan.indexOf("FileScan parquet spark_catalog.default.sig_store"))
      assert(!storeSide.contains("Exchange"),
        s"store side re-shuffled:\n$plan")
    } finally {
      GraftCatalog.executeDdl(spark, "DROP TABLE sig_store")
    }
  }

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
