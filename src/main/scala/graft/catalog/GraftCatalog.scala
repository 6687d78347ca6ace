package graft.catalog

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** DDL catalog layer (SURVEY.md §7.1 layer 2 — the reference's
  * `CREATE TABLE ... WITH ('connector'=...)` surface backed by
  * GenericInMemoryCatalog): parses the reference's DDL dialect and
  * registers the table as a temp view over the matching Spark
  * source.
  *
  * Connectors supported this round: `filesystem` (format
  * parquet/csv/json), `datagen` (graft.sources.DatagenSource).
  * `print`/`blackhole` sinks map to Spark's `console`/`noop` at
  * write time and need no catalog entry.
  */
object GraftCatalog {

  private val CreateTable: Regex =
    """(?is)CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*WITH\s*\((.*)\)\s*""".r

  /** Flink type spellings → Spark DDL types. */
  private def mapType(t: String): String = {
    val up = t.trim.toUpperCase
    val noPrec = up.replaceAll("""\(\s*\d+\s*(,\s*\d+\s*)?\)""", "$0")
    up match {
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") => "STRING"
      case s if s.startsWith("TIMESTAMP_LTZ") => "TIMESTAMP"
      case s if s.startsWith("TIMESTAMP") => "TIMESTAMP"
      case "INT" | "INTEGER" => "INT"
      case s => s
    }
  }

  private def parseOptions(s: String): Map[String, String] =
    """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(s)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap

  private def parseSchema(cols: String): StructType = {
    // split on top-level commas (no nested generics handled this round)
    val fields = cols.split(",").map(_.trim).filter(_.nonEmpty)
      // skip computed columns / watermark clauses
      .filterNot(c => c.toUpperCase.startsWith("WATERMARK"))
      .map { c =>
        val parts = c.split("\\s+", 2)
        s"${parts(0)} ${mapType(parts(1))}"
      }
    StructType.fromDDL(fields.mkString(", "))
  }

  /** Execute a CREATE TABLE statement: the table becomes a temp view
    * readable by name in spark.sql / GraftSql.
    */
  def executeDdl(spark: SparkSession, ddl: String): Unit = ddl match {
    case CreateTable(name, cols, opts) =>
      val options = parseOptions(opts)
      val df: DataFrame = options.getOrElse("connector",
          sys.error("missing 'connector' option")) match {
        case "filesystem" =>
          val fmt = options.getOrElse("format", "parquet")
          val reader = spark.read.format(fmt)
          val withSchema =
            if (cols.trim.nonEmpty) reader.schema(parseSchema(cols)) else reader
          val r2 = if (fmt == "csv") withSchema.option("header",
            options.getOrElse("csv.header", "false")) else withSchema
          r2.load(options("path"))
        case "datagen" =>
          spark.read.format("graft.sources.DatagenSource")
            .option("partitions", options.getOrElse("partitions", "4"))
            .option("rowsPerPartition", options.getOrElse("rowsperpartition", "1000"))
            .option("seed", options.getOrElse("seed", "42"))
            .load()
        case other => sys.error(s"unsupported connector: $other")
      }
      df.createOrReplaceTempView(name)
    case other => sys.error(s"unsupported DDL (round 1 supports CREATE TABLE): $other")
  }
}
