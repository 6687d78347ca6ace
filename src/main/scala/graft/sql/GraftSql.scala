package graft.sql

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front door (SURVEY.md §7.1 layer 6): `spark.sql` for
  * everything Spark parses, plus a pre-parser that rewrites the
  * reference's Flink-only SQL surface into Spark SQL:
  *
  *  - window TVFs (FlinkSqlOperatorTable TUMBLE/HOP/CUMULATE):
  *    `TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' HOUR))`
  *    becomes a subquery projecting `window_start`/`window_end` via
  *    Spark's `window()` (tumble/hop) or an explicit slice-explode
  *    (cumulate — SliceAssigners.java:94 semantics);
  *  - `FOR SYSTEM_TIME AS OF <proctime>` lookup joins
  *    (StreamExecLookupJoin): the dimension snapshot IS the current
  *    version in batch/micro-batch Spark, so the clause erases to a
  *    plain join;
  *  - Flink-only function names via FlinkFunctions.registerAll.
  *
  * SESSION windows use `session_window()` directly in GROUP BY
  * (Spark-native); MATCH_RECOGNIZE stays DSL-only this round
  * (graft.streaming.StatefulOps.followedBy).
  */
object GraftSql {

  private val TumbleHop: Regex =
    """(?is)TABLE\s*\(\s*(TUMBLE|HOP)\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*(INTERVAL\s+'[^']+'\s+\w+)\s*(?:,\s*(INTERVAL\s+'[^']+'\s+\w+)\s*)?\)\s*\)""".r

  private val Cumulate: Regex =
    """(?is)TABLE\s*\(\s*CUMULATE\s*\(\s*TABLE\s+(\w+)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,\s*(INTERVAL\s+'[^']+'\s+\w+)\s*,\s*(INTERVAL\s+'[^']+'\s+\w+)\s*\)\s*\)""".r

  private val SystemTime: Regex =
    """(?is)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+[\w.()]+""".r

  private val IntervalLit: Regex =
    """(?is)INTERVAL\s+'([^']+)'\s+(\w+)""".r

  /** INTERVAL '1' HOUR -> "1 hour" (Spark window duration string). */
  private def durationOf(interval: String): String = interval match {
    case IntervalLit(n, unit) => s"$n ${unit.toLowerCase}"
    case other => sys.error(s"unsupported interval literal: $other")
  }

  private def intervalSeconds(interval: String): Long = interval match {
    case IntervalLit(n, unit) =>
      val v = n.trim.toLong
      unit.toUpperCase match {
        case "SECOND" | "SECONDS" => v
        case "MINUTE" | "MINUTES" => v * 60
        case "HOUR" | "HOURS" => v * 3600
        case "DAY" | "DAYS" => v * 86400
        case u => sys.error(s"unsupported cumulate unit: $u")
      }
    case other => sys.error(s"unsupported interval literal: $other")
  }

  /** Rewrite Flink-only syntax into Spark SQL text. */
  def rewrite(sql: String): String = {
    var out = sql
    out = TumbleHop.replaceAllIn(out, m => {
      val (kind, table, ts) = (m.group(1).toUpperCase, m.group(2), m.group(3))
      val winExpr = kind match {
        case "TUMBLE" =>
          s"window($ts, '${durationOf(m.group(4))}')"
        case "HOP" =>
          // Flink arg order: slide, size
          s"window($ts, '${durationOf(m.group(5))}', '${durationOf(m.group(4))}')"
      }
      Regex.quoteReplacement(
        s"(SELECT *, $winExpr.start AS window_start, $winExpr.end AS window_end FROM $table)")
    })
    out = Cumulate.replaceAllIn(out, m => {
      val (table, ts) = (m.group(1), m.group(2))
      val step = intervalSeconds(m.group(3))
      val max = intervalSeconds(m.group(4))
      val slices = max / step
      Regex.quoteReplacement(
        s"""(SELECT * EXCEPT (__ws, __j),
           |   __ws AS window_start,
           |   __ws + make_interval(0, 0, 0, 0, 0, 0, __j * $step) AS window_end
           | FROM (SELECT *,
           |         timestamp_seconds(floor(unix_timestamp($ts) / $max) * $max) AS __ws,
           |         explode(sequence(
           |           cast(floor((unix_timestamp($ts) - floor(unix_timestamp($ts) / $max) * $max) / $step) as int) + 1,
           |           $slices)) AS __j
           |       FROM $table))""".stripMargin)
    })
    out = SystemTime.replaceAllIn(out, "")
    out
  }

  /** Rewrite + register Flink-name functions + execute. */
  def sql(spark: SparkSession, text: String): DataFrame = {
    graft.functions.FlinkFunctions.registerAll(spark)
    spark.sql(rewrite(text))
  }
}
