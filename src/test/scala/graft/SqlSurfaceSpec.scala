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
    // SHOW COLUMNS (SqlShowColumns) — native fallthrough
    GraftSql.sql(spark, "CREATE VIEW surface_cols AS SELECT 1 AS a, 'x' AS b")
    try {
      val cols = GraftSql.sql(spark, "SHOW COLUMNS FROM surface_cols")
        .collect().map(_.getString(0)).toSeq
      assert(cols === Seq("a", "b"), cols)
    } finally GraftSql.sql(spark, "DROP VIEW surface_cols")
  }

  test("ALTER VIEW: RENAME TO moves the definition, AS replaces it (SqlAlterView)") {
    GraftSql.sql(spark, "CREATE VIEW av_v AS SELECT 1 AS one")
    try {
      GraftSql.sql(spark, "ALTER VIEW av_v RENAME TO av_v2")
      assert(!spark.catalog.tableExists("av_v"))
      assert(spark.table("av_v2").first().getInt(0) === 1)
      // the front-door registry moved with it
      assert(GraftSql.sql(spark, "SHOW VIEWS").collect().map(_.getString(0))
        .contains("av_v2"))
      GraftSql.sql(spark, "ALTER VIEW av_v2 AS SELECT 2 AS two")
      assert(spark.table("av_v2").first().getInt(0) === 2)
      assert(spark.table("av_v2").columns.toSeq === Seq("two"))
      // unknown view / unsupported clause fail loudly
      intercept[IllegalArgumentException](
        GraftSql.sql(spark, "ALTER VIEW no_such_view RENAME TO x"))
      intercept[RuntimeException](
        GraftSql.sql(spark, "ALTER VIEW av_v2 SET ('k' = 'v')"))
      // a connector TABLE is not a view — renaming it here would
      // strand its catalog registrations under the old name
      graft.catalog.GraftCatalog.executeDdl(spark,
        """CREATE TABLE av_tbl (id BIGINT) WITH ('connector' = 'datagen',
          |  'number-of-rows' = '1')""".stripMargin)
      try {
        val t = intercept[IllegalArgumentException](
          GraftSql.sql(spark, "ALTER VIEW av_tbl RENAME TO av_tbl2"))
        assert(t.getMessage.contains("is a table"))
      } finally graft.catalog.GraftCatalog.executeDdl(spark, "DROP TABLE av_tbl")
    } finally GraftSql.sql(spark, "DROP VIEW av_v2")
  }

  test("ADD JAR / SHOW JARS / REMOVE JAR (SqlAddJar resource surface)") {
    // the file must OUTLIVE the session: Spark re-fetches added jars
    // on later jobs, so deleting it would break every subsequent test
    // in this JVM — a stable path, no cleanup
    val f = new java.io.File("/tmp/graft_surface_spec.jar")
    if (!f.exists()) {
      val jar = new java.util.jar.JarOutputStream(new java.io.FileOutputStream(f))
      jar.putNextEntry(new java.util.zip.ZipEntry("marker.txt"))
      jar.write("graft".getBytes); jar.closeEntry(); jar.close()
    }
    GraftSql.sql(spark, s"ADD JAR '${f.getAbsolutePath}'")
    assert(GraftSql.sql(spark, "SHOW JARS").collect().map(_.getString(0))
      .contains(f.getAbsolutePath))
    GraftSql.sql(spark, s"REMOVE JAR '${f.getAbsolutePath}'")
    assert(!GraftSql.sql(spark, "SHOW JARS").collect().map(_.getString(0))
      .contains(f.getAbsolutePath))
    // a missing file and an un-added jar both fail loudly
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, "ADD JAR '/no/such/file.jar'"))
    intercept[IllegalArgumentException](
      GraftSql.sql(spark, s"REMOVE JAR '${f.getAbsolutePath}'"))
  }

  test("CREATE CATALOG 'jdbc' federates a live database (JdbcCatalog analog); DROP CATALOG unregisters") {
    // a Derby database with a table created OUTSIDE Spark — the
    // catalog must see it live over the wire, not via any import
    val dir = java.nio.file.Files.createTempDirectory("graft_cat").toFile
    val url = s"jdbc:derby:${dir.getAbsolutePath}/catdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE CAT_T (ID BIGINT, V VARCHAR(10))")
      st.execute("INSERT INTO CAT_T VALUES (1, 'a'), (2, 'b')")
      st.close()
    } finally conn.close()
    GraftSql.sql(spark,
      s"CREATE CATALOG jcat WITH ('type' = 'jdbc', 'base-url' = '$url')")
    try {
      // the federated namespace is the database schema (Derby: APP)
      val got = spark.sql("SELECT ID, V FROM jcat.APP.CAT_T ORDER BY ID")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((1L, "a"), (2L, "b")))
      assert(GraftSql.sql(spark, "SHOW CATALOGS").collect()
        .map(_.getString(0)).contains("jcat"))
      // unknown/environment-bound types carry reasoned rejections
      val g = intercept[RuntimeException](GraftSql.sql(spark,
        "CREATE CATALOG c2 WITH ('type' = 'generic_in_memory')"))
      assert(g.getMessage.contains("already in-memory"))
      // hive now binds for real when the session was built with the
      // Hive catalog (HiveCatalogSpec); this in-memory-catalog session
      // gets the reasoned rejection with bind instructions instead
      val h = intercept[RuntimeException](GraftSql.sql(spark,
        "CREATE CATALOG c3 WITH ('type' = 'hive')"))
      assert(h.getMessage.contains("catalogImplementation=hive"))
    } finally {
      GraftSql.sql(spark, "DROP CATALOG jcat")
      assert(!spark.conf.getAll.keys.exists(_.startsWith("spark.sql.catalog.jcat")))
    }
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
