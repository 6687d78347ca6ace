package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import graft.sources.AvroFormat

/** Avro container-file format on avro-core (flink-avro analog):
  * lossless round-trip incl. nulls and micros timestamps, and column
  * pruning pushed into the DSv2 scan.
  */
class AvroFormatSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_avro_spec").toString + "/t"
    val df = Seq(
      (1L, Option("alpha"), 1.5, Timestamp.valueOf("2024-01-01 10:00:00.123456")),
      (2L, None, -2.25, Timestamp.valueOf("2024-06-30 23:59:59.999999")),
      (3L, Option("gamma"), 0.0, Timestamp.valueOf("1999-12-31 00:00:00")))
      .toDF("id", "name", "v", "ts")
      .repartition(2)
    AvroFormat.write(df, d)
    d
  }

  test("round-trip preserves longs, nullable strings, doubles, micros timestamps") {
    val back = spark.read.format("graft.sources.AvroSource").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType.typeName)).toSet ===
      Set(("id", "long"), ("name", "string"), ("v", "double"), ("ts", "timestamp")))
    val rows = back.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getTimestamp(3)))
      .toSet
    assert(rows === Set(
      (1L, Some("alpha"), 1.5, Timestamp.valueOf("2024-01-01 10:00:00.123456")),
      (2L, None, -2.25, Timestamp.valueOf("2024-06-30 23:59:59.999999")),
      (3L, Some("gamma"), 0.0, Timestamp.valueOf("1999-12-31 00:00:00"))))
  }

  test("one reader per written file; column pruning reaches the scan") {
    val back = spark.read.format("graft.sources.AvroSource").load(dir)
    val pruned = back.select("id")
    val scan = pruned.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r
    }.head
    assert(scan.output.map(_.name) === Seq("id"),
      s"scan must prune to the requested column: ${scan.output}")
    assert(pruned.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // written with 2 partitions and 3 rows -> 2 files -> 2 read tasks
    assert(back.rdd.getNumPartitions === 2)
  }

  test("pre-1970 fractional timestamps and empty frames round-trip") {
    import org.apache.spark.sql.functions.lit
    val base = java.nio.file.Files.createTempDirectory("graft_avro_edge").toString
    // -500 ms epoch: truncating division read this back as +500 ms
    val neg = Timestamp.valueOf("1969-12-31 23:59:59.5")
    val df = Seq((1L, neg)).toDF("id", "ts")
    AvroFormat.write(df, s"$base/neg")
    val back = spark.read.format("graft.sources.AvroSource").load(s"$base/neg")
      .collect().map(_.getTimestamp(1))
    assert(back.toSeq === Seq(neg))
    // an empty frame must stay a readable empty relation
    AvroFormat.write(df.filter(lit(false)), s"$base/empty")
    val empty = spark.read.format("graft.sources.AvroSource").load(s"$base/empty")
    assert(empty.schema.fieldNames.toSeq === Seq("id", "ts"))
    assert(empty.count() === 0)
  }

  test("a large file splits on sync markers: parallel reads, no lost or doubled rows") {
    import org.apache.spark.sql.functions.lit
    val base = java.nio.file.Files.createTempDirectory("graft_avro_split").toString
    // one file (coalesce(1)) with enough rows to span many avro blocks
    val n = 200000L
    val df = spark.range(n).toDF("id").withColumn("pad", lit("x" * 64))
      .coalesce(1)
    AvroFormat.write(df, s"$base/big")
    val back = spark.read.format("graft.sources.AvroSource")
      .option("splitSize", 256L * 1024) // force many byte-range splits
      .load(s"$base/big")
    assert(back.rdd.getNumPartitions > 4,
      s"expected many sync-split partitions, got ${back.rdd.getNumPartitions}")
    assert(back.count() === n, "each avro block must be read by exactly one split")
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).first().getLong(0)
      === n * (n - 1) / 2)
  }

  test("schema evolution: added nullable column reads as null from v1 files, " +
      "values from v2 files") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_avro_evolve").toString
    val d = s"$base/t"
    // v1 files: (id, name); later the table gains a nullable score
    AvroFormat.write(Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1), d)
    AvroFormat.append(Seq((3L, "c", 0.5), (4L, "d", 1.5)).toDF("id", "name", "score")
      .coalesce(1), d)
    val v2 = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("name", StringType), StructField("score", DoubleType)))
    val back = spark.read.format("graft.sources.AvroSource").schema(v2).load(d)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(back === Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.5)), (4L, "d", Some(1.5))))
    // a NON-nullable evolved column must fail loudly at open, not NPE per row
    val bad = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("boom", LongType, nullable = false)))
    val e = intercept[Exception] {
      spark.read.format("graft.sources.AvroSource").schema(bad).load(d).collect()
    }
    assert(e.getMessage != null)
  }

  test("schema evolution: int->long and float->double promotions widen old files; " +
      "narrowing fails loudly") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_avro_promote").toString
    val d = s"$base/t"
    AvroFormat.write(Seq((7, 1.5f), (8, -2.5f)).toDF("n", "x").coalesce(1), d)
    val widened = StructType(Seq(StructField("n", LongType, nullable = false),
      StructField("x", DoubleType, nullable = false)))
    val back = spark.read.format("graft.sources.AvroSource").schema(widened).load(d)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(back === Set((7L, 1.5), (8L, -2.5)))
    // narrowing (writer int -> reader... writer long -> reader int) must not
    // silently truncate
    val d2 = s"$base/longs"
    AvroFormat.write(Seq(Tuple1(1L)).toDF("id").coalesce(1), d2)
    val narrow = StructType(Seq(StructField("id", IntegerType, nullable = false)))
    intercept[Exception] {
      spark.read.format("graft.sources.AvroSource").schema(narrow).load(d2).collect()
    }
  }

  test("events table round-trips byte-for-byte through avro (driver query shape)") {
    val agg = operators.MiscQueries.avroRoundtrip(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val direct = Tables.load(spark, sfDir, "events")
      .groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(agg === direct)
  }
}
