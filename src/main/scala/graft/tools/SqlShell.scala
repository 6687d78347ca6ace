package graft.tools

import java.io.PrintStream

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sql.{GraftSql, SqlLexer}

/** Interactive SQL shell — the reference's sql-client REPL loop
  * (flink-sql-client SqlClient.java:62 / CliClient): read statements
  * terminated by ';', run them through the dialect front door, print
  * a tableau. All the statements already exist in GraftSql (DDL,
  * SET/RESET, SHOW/DESCRIBE/EXPLAIN, INSERT, STATEMENT SET, COMPILE/
  * EXECUTE PLAN, queries) — this is just the driver around them.
  *
  * `runMain graft.tools.SqlShell [-f script.sql] [sfDir]`
  *  - with -f: execute the script's statements in order and exit
  *    (CliClient's -f mode); without: interactive prompt on stdin.
  *  - sfDir (default /root/testdata/sf0.001): the test tables
  *    register as views first, so SELECTs work immediately.
  */
object SqlShell {

  /** Split script text into statements on TOP-LEVEL ';' tokens — a
    * ';' inside a string literal or comment is data (same contract as
    * STATEMENT SET's splitter).
    */
  def splitStatements(text: String): Seq[String] = {
    val toks = SqlLexer.tokenize(text)
    val out = Seq.newBuilder[String]
    var start = 0
    toks.foreach { t =>
      if (t.isPunct(";")) {
        out += text.substring(start, t.start)
        start = t.end
      }
    }
    out += text.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Fixed-width tableau, the sql-client result shape. */
  def render(df: DataFrame, maxRows: Int = 100): String = {
    val cols = df.columns
    val rows = df.take(maxRows + 1)
    val shown = rows.take(maxRows)
    val cells = shown.map(r => cols.indices.map(i =>
      Option(r.get(i)).map(_.toString).getOrElse("NULL")))
    val widths = cols.indices.map(i =>
      (cols(i).length +: cells.map(_(i).length)).max.min(40))
    def pad(s: String, w: Int) = {
      val t = if (s.length > w) s.substring(0, w - 1) + "…" else s
      t + " " * (w - t.length)
    }
    val sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    val header = cols.indices.map(i => pad(cols(i), widths(i)))
      .mkString("| ", " | ", " |")
    val body = cells.map(r => cols.indices.map(i => pad(r(i), widths(i)))
      .mkString("| ", " | ", " |"))
    val more = if (rows.length > maxRows) s"\n... (output capped at $maxRows rows)" else ""
    (Seq(sep, header, sep) ++ body :+ sep).mkString("\n") +
      s"\n${shown.length} row(s)$more"
  }

  /** Execute one statement, print its result (if any) to `out`.
    * Returns false when the statement asks to leave the shell.
    */
  def execute(spark: SparkSession, stmt: String, out: PrintStream): Boolean = {
    val head = stmt.trim.split("\\s+", 2).headOption.getOrElse("").toUpperCase
    if (head == "QUIT" || head == "EXIT") return false
    try {
      val df = GraftSql.sql(spark, stmt)
      // side-effect statements come back as an empty frame — print OK
      // like the sql-client's "[INFO] Execute statement succeed."
      if (df.columns.isEmpty) out.println("OK")
      else {
        // single text cell (EXPLAIN, SHOW CREATE TABLE) prints raw —
        // a tableau would truncate the plan
        val rows = if (df.columns.length == 1) df.take(2) else Array.empty[org.apache.spark.sql.Row]
        if (rows.length == 1 && rows(0).get(0).isInstanceOf[String] &&
            rows(0).getString(0).contains("\n"))
          out.println(rows(0).getString(0))
        else out.println(render(df))
      }
    } catch {
      case e: Exception =>
        out.println(s"[ERROR] ${Option(e.getMessage).getOrElse(e.toString)}")
    }
    true
  }

  def main(args: Array[String]): Unit = {
    val fIdx = args.indexOf("-f")
    val script = if (fIdx >= 0 && fIdx + 1 < args.length) Some(args(fIdx + 1)) else None
    val positional = args.zipWithIndex.collect {
      case (a, i) if i != fIdx && i != fIdx + 1 => a
    }
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, sfDir)
    val out = System.out
    script match {
      case Some(file) =>
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(file)), "UTF-8")
        splitStatements(text).foreach(execute(spark, _, out))
      case None =>
        out.println("graft sql shell — statements end with ';', EXIT; leaves")
        val in = new java.util.Scanner(System.in)
        val buf = new StringBuilder
        var go = true
        out.print("Flink SQL> "); out.flush()
        while (go && in.hasNextLine) {
          buf.append(in.nextLine()).append('\n')
          val text = buf.toString
          if (SqlLexer.tokenize(text).exists(_.isPunct(";"))) {
            buf.setLength(0)
            go = splitStatements(text).forall(execute(spark, _, out))
          }
          if (go) { out.print("Flink SQL> "); out.flush() }
        }
    }
    spark.stop()
  }
}
