package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The datagen connector's per-field generator surface
  * (flink-connectors/flink-connector-datagen DataGenTableSourceFactory:
  * 'fields.<name>.kind' = random | sequence, 'fields.<name>.min/max'
  * (numeric random), 'fields.<name>.start/end' (sequence),
  * 'fields.<name>.length' (string random)) evaluated as DECLARATIVE
  * column expressions over a row index — batch rides spark.range,
  * streaming rides the rate source; both deterministic in (seed,
  * index), both fully codegen'd.
  */
object DatagenFields {

  /** option keys arrive lowercased from the DDL parser */
  private def opt(options: Map[String, String], field: String, key: String): Option[String] =
    options.get(s"fields.${field.toLowerCase(java.util.Locale.ROOT)}.$key")

  /** The row-count cap a bounded sequence imposes: the source is
    * exhausted once any sequence field passes its 'end' (the
    * reference's sequence-generator termination).
    */
  def rowCap(schema: StructType, options: Map[String, String]): Option[Long] =
    schema.fields.toSeq.flatMap { f =>
      if (opt(options, f.name, "kind").contains("sequence"))
        opt(options, f.name, "end").map { e =>
          val start = opt(options, f.name, "start").map(_.toLong).getOrElse(1L)
          require(e.toLong >= start,
            s"datagen field ${f.name}: sequence end before start")
          e.toLong - start + 1
        }
      else None
    }.minOption

  /** One generated column per declared field, driven by `idx` (the
    * 0-based row index column).
    */
  def columns(schema: StructType, options: Map[String, String], seed: Long,
      idx: Column): Seq[Column] = schema.fields.toSeq.map { f =>
    val kind = opt(options, f.name, "kind").getOrElse("random")
    // uniform [0,1) from a seeded per-field hash of the row index —
    // deterministic, reproducible, no RNG state
    val u = pmod(xxhash64(idx, lit(f.name), lit(seed)), lit(1000000L))
      .cast("double") / 1000000.0d
    val c: Column = (kind, f.dataType) match {
      case ("sequence", dt @ (ByteType | ShortType | IntegerType | LongType)) =>
        val start = opt(options, f.name, "start").map(_.toLong).getOrElse(1L)
        (lit(start) + idx).cast(dt)
      case ("random", dt @ (ByteType | ShortType | IntegerType | LongType)) =>
        // deliberate divergence: the reference defaults min/max to the
        // FULL type range; [0, 100] here keeps un-optioned tables
        // producing joinable/groupable keys (full-range longs never
        // collide) — declare min/max to override
        val min = opt(options, f.name, "min").map(_.toLong).getOrElse(0L)
        val max = opt(options, f.name, "max").map(_.toLong).getOrElse(100L)
        require(max >= min, s"datagen field ${f.name}: max < min")
        // u has 1e-6 granularity, so ranges wider than 1e6 hit at most
        // 1e6 distinct values (uniform over the range, just coarse);
        // ranges whose width overflows a Long would silently escape
        // [min,max] — reject those instead
        require(BigInt(max) - BigInt(min) + 1 <= BigInt(Long.MaxValue),
          s"datagen field ${f.name}: range [$min,$max] wider than Long.MaxValue " +
            "— narrow min/max (full-type-range randoms are not supported)")
        (lit(min) + (u * (max - min + 1)).cast("long")).cast(dt)
      case ("random", dt @ (FloatType | DoubleType)) =>
        val min = opt(options, f.name, "min").map(_.toDouble).getOrElse(0.0d)
        val max = opt(options, f.name, "max").map(_.toDouble).getOrElse(100.0d)
        require(max >= min, s"datagen field ${f.name}: max < min")
        (lit(min) + u * (max - min)).cast(dt)
      case ("random", BooleanType) =>
        (u >= 0.5d)
      case ("random", TimestampType) =>
        // the reference anchors random timestamps at now() − max-past;
        // a FIXED base keeps generation reproducible across reads
        // (the property the specs pin), so the anchor is an epoch
        // constant and 'max-past' (seconds, default 1 day) spreads
        // values behind it
        val maxPast = opt(options, f.name, "max-past").map(_.toLong).getOrElse(86400L)
        timestamp_seconds(lit(1700000000L) - (u * maxPast).cast("long"))
      case ("random", StringType) =>
        val len = opt(options, f.name, "length").map(_.toInt).getOrElse(100)
        // md5 hex repeated to cover the requested length
        substring(concat_ws("", Seq.fill(len / 32 + 1)(
          md5(concat_ws("-", idx.cast("string"), lit(f.name), lit(seed)))): _*), 1, len)
      case (other, dt) => sys.error(
        s"datagen field ${f.name}: unsupported kind '$other' for type ${dt.sql} " +
          "(random: numeric/boolean/string; sequence: numeric)")
    }
    c.as(f.name)
  }
}
