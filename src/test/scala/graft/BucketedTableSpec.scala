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

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
