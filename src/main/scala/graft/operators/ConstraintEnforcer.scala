package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side constraint enforcement — the reference's
  * ConstraintEnforcer.java (361 LoC, planned in front of every sink
  * by CommonExecSink): NOT NULL checks with ERROR/DROP modes
  * (table.exec.sink.not-null-enforcer) and CHAR/VARCHAR length
  * checks with ERROR/TRIM_PAD modes
  * (table.exec.sink.type-length-enforcer).
  *
  * Pure projection/filter over codegen'd expressions — executes
  * inside whole-stage codegen before the sink exchange; nothing here
  * shuffles or materializes.
  */
object ConstraintEnforcer {

  sealed trait NotNullMode
  /** raise on the first null (the reference's default) */
  case object ErrorOnNull extends NotNullMode
  /** silently drop violating rows */
  case object DropRow extends NotNullMode

  sealed trait LengthMode
  /** raise when a value exceeds the declared length */
  case object ErrorOnOversize extends LengthMode
  /** trim oversize; pad undersize CHAR with spaces */
  case object TrimPad extends LengthMode

  /** One length-constrained column: CHAR(n) pads AND trims, VARCHAR(n)
    * only trims (ConstraintEnforcer.CharFieldInfo semantics).
    */
  final case class LengthConstraint(column: String, length: Int, pad: Boolean)

  def enforce(df: DataFrame,
      notNull: Seq[String] = Nil,
      notNullMode: NotNullMode = ErrorOnNull,
      lengths: Seq[LengthConstraint] = Nil,
      lengthMode: LengthMode = TrimPad): DataFrame = {
    val afterNull = notNullMode match {
      case DropRow =>
        notNull.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
      case ErrorOnNull =>
        notNull.foldLeft(df) { (d, c) =>
          d.withColumn(c,
            when(col(c).isNull, raise_error(lit(
              s"Column '$c' is NOT NULL, however, a null value is being written into it. " +
                "You can set job configuration to suppress this exception and drop such records silently.")))
              .otherwise(col(c)))
        }
    }
    lengths.foldLeft(afterNull) { (d, lc) =>
      val c = col(lc.column)
      val enforced = lengthMode match {
        case ErrorOnOversize =>
          when(length(c) > lc.length, raise_error(lit(
            s"Column '${lc.column}' is ${if (lc.pad) "CHAR" else "VARCHAR"}(${lc.length}), " +
              "however, a string of longer length is being written into it.")))
            .otherwise(c)
        case TrimPad =>
          val trimmed = when(length(c) > lc.length, substring(c, 1, lc.length)).otherwise(c)
          if (lc.pad) when(trimmed.isNotNull, rpad(trimmed, lc.length, " ")).otherwise(trimmed)
          else trimmed
      }
      d.withColumn(lc.column, enforced)
    }
  }
}
