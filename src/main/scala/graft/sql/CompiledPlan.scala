package graft.sql

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}

import SqlLexer._

/** Plan persistence — the reference's `COMPILE PLAN '<file>' FOR
  * <statement>` / `EXECUTE PLAN '<file>'` statement pair
  * (SqlCompilePlan / SqlExecutePlan, TableEnvironmentImpl.compilePlan
  * → CompiledPlan JSON of the ExecNodeGraph). Users pin a pipeline to
  * a file so it replays identically later — across sessions, restarts
  * and upgrades — independent of what the live catalog then says.
  *
  * What pins here: the statement text, its deterministic dialect
  * resolution ([[GraftSql.rewrite]] — window TVFs and the other
  * lexer-level rewrites), and the DDL closure of every connector
  * table the statement references (SHOW CREATE TABLE output: schema,
  * constraints, watermark, PRIMARY KEY, PARTITIONED BY, WITH options
  * at compile time). EXECUTE PLAN re-registers exactly those
  * declarations into the executing session before running, so a
  * later ALTER TABLE or re-CREATE cannot drift a compiled pipeline.
  * Physical planning is intentionally NOT pinned: Catalyst + AQE
  * re-derive it per run — at the 100 TB target the right physical
  * plan depends on runtime statistics (AQE join strategy, skew
  * splits), which a frozen exec graph would fight rather than help.
  */
object CompiledPlan {

  final case class Plan(version: Int, statement: String, rewritten: String,
      tables: Seq[(String, String)]) // (name, DDL)

  /** Connector tables the statement references, with their current
    * DDL — identifier tokens that resolve in the DDL catalog. (Views
    * are not captured: like the reference, a plan compiles the query
    * as resolved, and dialect views resolve before compile.)
    */
  private def referencedTables(text: String): Seq[(String, String)] =
    tokenize(text).collect {
      case t if t.kind == Ident => t.text.stripPrefix("`").stripSuffix("`")
    }.distinct
      .filter(graft.catalog.GraftCatalog.isRegistered)
      .map(n => n -> graft.catalog.GraftCatalog.showCreateTable(n))

  def compile(statement: String): Plan =
    Plan(1, statement.trim, GraftSql.rewrite(statement.trim),
      referencedTables(statement))

  def toJson(p: Plan): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("flinkVersion", "graft-spark") // provenance marker, like CompiledPlan's
    root.put("version", p.version)
    root.put("statement", p.statement)
    root.put("rewritten", p.rewritten)
    val arr = root.putArray("tables")
    p.tables.foreach { case (n, ddl) =>
      val o = arr.addObject(); o.put("name", n); o.put("ddl", ddl)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): Plan = {
    val root = new ObjectMapper().readTree(json)
    require(root.hasNonNull("statement"), "compiled plan: missing 'statement'")
    val version = if (root.hasNonNull("version")) root.get("version").asInt else 1
    require(version == 1, s"compiled plan version $version is not supported")
    val tables = Option(root.get("tables")).toSeq.flatMap { arr =>
      (0 until arr.size).map { i =>
        val o = arr.get(i)
        o.get("name").asText -> o.get("ddl").asText
      }
    }
    Plan(version, root.get("statement").asText,
      Option(root.get("rewritten")).map(_.asText).getOrElse(""), tables)
  }

  /** COMPILE PLAN: resolve + write. Fails if the file exists (the
    * reference's default; IF NOT EXISTS semantics would skip) unless
    * `overwrite`.
    */
  def write(file: String, statement: String, overwrite: Boolean): Unit = {
    val path = Paths.get(file)
    require(overwrite || !Files.exists(path),
      s"COMPILE PLAN: '$file' already exists (use COMPILE PLAN OVERWRITE)")
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path, toJson(compile(statement)).getBytes(StandardCharsets.UTF_8))
  }

  /** EXECUTE PLAN: re-register the pinned table declarations into
    * this session, then run the pinned statement through the front
    * door. DDL re-registration is a createOrReplace, so the plan's
    * declarations win over whatever the session currently has —
    * that is the plan-stability contract.
    */
  def execute(spark: SparkSession, file: String): DataFrame = {
    val p = fromJson(new String(
      Files.readAllBytes(Paths.get(file)), StandardCharsets.UTF_8))
    p.tables.foreach { case (_, ddl) =>
      graft.catalog.GraftCatalog.executeDdl(spark, ddl)
    }
    GraftSql.sql(spark, p.statement)
  }
}
