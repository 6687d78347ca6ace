package graft

import graft.tools.SqlShell

/** The sql-client REPL driver: statement splitting, tableau
  * rendering, execute loop semantics.
  */
class SqlShellSpec extends SparkSpec {

  test("splitStatements: top-level ';' only — literals keep theirs") {
    val s = SqlShell.splitStatements(
      "SELECT 'a;b' AS x; SET 'k' = 'v;w';\n-- c;\nSELECT 1")
    // the ';' inside the literal and the comment are not boundaries;
    // comment text rides with its statement (Spark strips it)
    assert(s === Seq("SELECT 'a;b' AS x", "SET 'k' = 'v;w'", "-- c;\nSELECT 1"))
  }

  test("execute renders query results, OK for side effects, ERROR without dying") {
    Tables.registerAll(spark, sfDir)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bos, true, "UTF-8")
    assert(SqlShell.execute(spark,
      "SELECT n_name FROM nation WHERE n_nationkey = 0", out))
    assert(SqlShell.execute(spark, "SET 'pipeline.name' = 'shell-job'", out))
    assert(SqlShell.execute(spark, "SELECT FROM WHERE", out)) // parse error
    assert(!SqlShell.execute(spark, "EXIT", out))
    val text = bos.toString("UTF-8")
    assert(text.contains("n_name") && text.contains("NATION_0"), text)
    assert(text.contains("1 row(s)"))
    assert(text.contains("OK"))
    assert(text.contains("[ERROR]"))
  }

  test("script mode runs a full dialect pipeline: DDL, INSERT, windowed query") {
    Tables.registerAll(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_shell").toString
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bos, true, "UTF-8")
    val script =
      s"""CREATE TABLE shell_sink (rf VARCHAR(1), n BIGINT)
         |WITH ('connector' = 'filesystem', 'path' = '$base/t', 'format' = 'parquet');
         |INSERT INTO shell_sink SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag;
         |SELECT rf, n FROM shell_sink ORDER BY rf;
         |DROP TABLE shell_sink""".stripMargin
    SqlShell.splitStatements(script).foreach(SqlShell.execute(spark, _, out))
    val text = bos.toString("UTF-8")
    assert(text.contains("| rf") && text.contains("3 row(s)"), text)
    assert(!text.contains("[ERROR]"), text)
  }
}
