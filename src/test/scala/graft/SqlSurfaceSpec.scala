package graft

import graft.sql.GraftSql

/** The rest of the reference's statement inventory (flink-sql-parser
  * ddl/dql) that the front door serves by falling through to Spark's
  * native statements — pinned here so a fallthrough regression is a
  * test failure, not a silent loss of surface.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("SHOW FUNCTIONS / SHOW VIEWS / DROP VIEW via native fallthrough") {
    val fns = GraftSql.sql(spark, "SHOW FUNCTIONS").collect().map(_.getString(0))
    assert(fns.length > 100) // builtin catalog incl. our registered names
    GraftSql.sql(spark, "CREATE VIEW surface_v AS SELECT 1 AS one")
    val views = GraftSql.sql(spark, "SHOW VIEWS").collect().map(_.getString(0))
    assert(views.contains("surface_v"), views.toSeq)
    GraftSql.sql(spark, "DROP VIEW surface_v")
    assert(!GraftSql.sql(spark, "SHOW VIEWS").collect().map(_.getString(0))
      .contains("surface_v"))
  }

  test("database/catalog statements: ALTER/DESCRIBE DATABASE, USE CATALOG, SHOW CATALOGS") {
    GraftSql.sql(spark, "CREATE DATABASE IF NOT EXISTS surface_db COMMENT 'spec db'")
    try {
      val desc = GraftSql.sql(spark, "DESCRIBE DATABASE surface_db").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(desc.get("Comment").contains("spec db"), desc)
      GraftSql.sql(spark,
        "ALTER DATABASE surface_db SET DBPROPERTIES ('owner.team' = 'graft')")
      val cats = GraftSql.sql(spark, "SHOW CATALOGS").collect().map(_.getString(0))
      assert(cats.contains("spark_catalog"), cats.toSeq)
      GraftSql.sql(spark, "USE CATALOG spark_catalog")
      assert(GraftSql.sql(spark, "SHOW CURRENT CATALOG").first().getString(0)
        === "spark_catalog")
    } finally GraftSql.sql(spark, "DROP DATABASE surface_db")
  }
}
