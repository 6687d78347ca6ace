package graft

import org.apache.spark.sql.functions._
import graft.functions.{FlinkFunctions => F}
import graft.plans.GraftExtensions

/** Injected optimizer rule folds self-hamming to a constant. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("hamming64(x, x) folds to 0 in the optimized plan") {
    GraftExtensions.install(spark)
    val df = Seq(1L, 2L, 3L).toDF("sig")
      .select(F.hamming64($"sig", $"sig").as("hd"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("hamming64"), optimized)
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(0, 0, 0))
  }

  test("ANALYZE TABLE statistics flip an unsizable-relation join to broadcast " +
      "(statistics-injected planning)") {
    GraftExtensions.install(spark)
    // an RDD-backed view: Spark cannot size it (defaultSizeInBytes =
    // huge), the same blind spot as a federated JDBC catalog table
    val dimRows = (0L until 50L).map(i => org.apache.spark.sql.Row(i, s"name_$i"))
    val dimSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("nm", org.apache.spark.sql.types.StringType, true)))
    spark.createDataFrame(spark.sparkContext.parallelize(dimRows, 2), dimSchema)
      .createOrReplaceTempView("dim_unsized")
    val fact = Tables.load(spark, sfDir, "events")
      .select((col("event_id") % 50).as("k"), col("value"))
    def planOf(): String = fact.join(spark.table("dim_unsized"), Seq("k"))
      .groupBy(col("nm")).agg(sum(col("value")).as("v"))
      .queryExecution.executedPlan.toString

    // a threshold small enough that the parquet fact side cannot
    // broadcast by its file size — only the stats-fed dim can fit
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    try {
      graft.catalog.GraftCatalog.clearStats("dim_unsized")
      val before = planOf()
      assert(!before.contains("BroadcastHashJoin"),
        s"unsized relation must not broadcast before ANALYZE:\n$before")

      // the SQL front door's ANALYZE records the row count; the
      // injected rule then sizes the side and hints BROADCAST
      graft.sql.GraftSql.sql(spark, "ANALYZE TABLE dim_unsized COMPUTE STATISTICS")
      val after = planOf()
      assert(after.contains("BroadcastHashJoin"),
        s"analyzed 50-row dim must broadcast:\n$after")

      // a row count over the threshold must NOT hint
      graft.catalog.GraftCatalog.recordStats("dim_unsized",
        graft.catalog.GraftCatalog.TableStats(500000000L, Map.empty))
      val big = planOf()
      assert(!big.contains("BroadcastHashJoin"),
        s"over-threshold stats must not broadcast:\n$big")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      graft.catalog.GraftCatalog.clearStats("dim_unsized")
    }
  }

  test("rule preserves null semantics and leaves distinct args alone") {
    GraftExtensions.install(spark)
    val rows = Seq((Some(5L), 6L), (None, 6L)).toDF("a", "b")
      .select(F.hamming64($"a", $"a").as("self"), F.hamming64($"a", $"b").as("cross"))
      .collect()
    assert(rows(0).getInt(0) === 0)
    assert(rows(0).getInt(1) === java.lang.Long.bitCount(5L ^ 6L))
    assert(rows(1).isNullAt(0), "null input must stay null")
    // non-literal source: the cross-arg call must survive the rule
    val fromTable = Tables.load(spark, sfDir, "events")
      .select(F.hamming64($"event_id", $"user_id").as("cross"))
    val optimized = fromTable.queryExecution.optimizedPlan.toString
    assert(optimized.contains("hamming64"), "cross-arg call must survive: " + optimized)
  }
}
