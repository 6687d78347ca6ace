package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-generated TPC-H-ish star schema
  * (see /root/repo/TESTDATA.md). All queries take the scale-factor
  * directory as a parameter so the same code runs at sf0.001/0.01/0.1
  * — and, unchanged, against a 100 TB warehouse directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects outright; read it as raw long nanos and truncate
    // to micros — the same truncation DuckDB applies, so oracle
    // comparisons agree.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case (d, _) => d
    }
  }

  /** Register every table as a temp view named after itself, so
    * `spark.sql` text and the DuckDB oracle read identical relations.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
