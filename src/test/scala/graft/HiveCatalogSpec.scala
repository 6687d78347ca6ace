package graft

import org.apache.spark.sql.SparkSession

/** Hive catalog via Spark's NATIVE Hive support — the reference's
  * HiveCatalog (flink-connectors/flink-connector-hive) maps to
  * `spark.sql.catalogImplementation=hive`: the session catalog
  * persists DDL through a real Hive metastore (embedded Derby here;
  * a thrift URI in production) and Spark's planner handles Hive
  * tables natively. This suite proves the delegation end-to-end in
  * this container: metastore DDL, partitioned writes with pruning,
  * and persistence across SparkSessions (the property an in-memory
  * catalog cannot give).
  *
  * Session mechanics: catalogImplementation is fixed per SharedState,
  * so the suite builds a SECOND SparkSession over the shared
  * SparkContext with its own SharedState (clearing the
  * active/default session first), and restores the plain session
  * after — the same isolation trick Spark's own Hive test harness
  * uses.
  */
class HiveCatalogSpec extends SparkSpec {

  private def withHiveSession(f: SparkSession => Unit): Unit = {
    val prev = spark // materialize the shared plain session first
    val wh = java.nio.file.Files.createTempDirectory("hive_wh").toString
    val ms = java.nio.file.Files.createTempDirectory("hive_ms").toString + "/metastore_db"
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val hive = SparkSession.builder()
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$ms;create=true")
      .config("spark.hadoop.datanucleus.schema.autoCreateAll", "true")
      .config("spark.hadoop.hive.metastore.schema.verification", "false")
      .getOrCreate()
    try f(hive)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("hive metastore: DDL + partitioned writes + pruning + cross-session persistence") {
    withHiveSession { hive =>
      assert(hive.conf.get("spark.sql.catalogImplementation") == "hive")
      hive.sql("CREATE DATABASE IF NOT EXISTS hdb")
      hive.sql("""CREATE TABLE hdb.events_h (id BIGINT, v STRING)
                 |USING parquet PARTITIONED BY (day INT)""".stripMargin)
      hive.sql("""INSERT INTO hdb.events_h PARTITION (day=1)
                 |VALUES (1, 'a'), (2, 'b')""".stripMargin)
      hive.sql("INSERT INTO hdb.events_h PARTITION (day=2) VALUES (3, 'c')")
      // data round-trips through the metastore-registered table
      assert(hive.table("hdb.events_h").count() === 3)
      // partition pruning reaches the scan (metastore partition list)
      val pruned = hive.sql("SELECT id FROM hdb.events_h WHERE day = 1")
      assert(pruned.count() === 2)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("day"), s"pruning filter missing: $plan")
      // metastore metadata surface
      assert(hive.sql("SHOW PARTITIONS hdb.events_h").count() === 2)
      assert(hive.sql("SHOW TABLES IN hdb").collect().map(_.getString(1))
        .contains("events_h"))

      // CROSS-SESSION persistence: a brand-new SparkSession over the
      // same SharedState (newSession) — and more importantly the
      // metastore itself — still resolves the table
      val second = hive.newSession()
      assert(second.table("hdb.events_h").count() === 3)

      // the reference's two-statement idiom works verbatim against
      // the SQL front door
      graft.sql.GraftSql.sql(hive, "CREATE CATALOG myhive WITH ('type' = 'hive')")
      graft.sql.GraftSql.sql(hive, "USE CATALOG myhive")
      assert(hive.catalog.currentCatalog() == "spark_catalog")
      assert(hive.table("hdb.events_h").count() === 3)

      hive.sql("DROP TABLE hdb.events_h")
      hive.sql("DROP DATABASE hdb")
    }
  }

  test("CREATE CATALOG type 'hive' in a plain session rejects with bind instructions") {
    val e = intercept[RuntimeException](
      graft.sql.GraftSql.sql(spark, "CREATE CATALOG h WITH ('type' = 'hive')"))
    assert(e.getMessage.contains("catalogImplementation"))
  }
}
