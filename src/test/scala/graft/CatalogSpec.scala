package graft

import graft.catalog.GraftCatalog

/** Reference-dialect DDL → Spark temp views. */
class CatalogSpec extends SparkSpec {

  test("filesystem connector DDL registers a queryable table") {
    GraftCatalog.executeDdl(spark,
      s"""CREATE TABLE li_ddl (
         |  l_orderkey BIGINT,
         |  l_quantity DOUBLE,
         |  l_returnflag VARCHAR(1),
         |  l_shipdate TIMESTAMP(3)
         |) WITH (
         |  'connector' = 'filesystem',
         |  'path' = '$sfDir/lineitem.parquet',
         |  'format' = 'parquet'
         |)""".stripMargin)
    val n = spark.sql("SELECT count(*) FROM li_ddl WHERE l_quantity > 0").first().getLong(0)
    assert(n > 0)
    assert(spark.table("li_ddl").schema.fieldNames.toSeq ===
      Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
  }

  test("datagen connector DDL generates deterministic rows") {
    GraftCatalog.executeDdl(spark,
      """CREATE TABLE gen_ddl (id BIGINT, ts TIMESTAMP, key STRING, value DOUBLE)
        |WITH ('connector' = 'datagen', 'partitions' = '2', 'rowsPerPartition' = '10')""".stripMargin)
    assert(spark.table("gen_ddl").count() === 20)
  }
}
