package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-LAYOUT operators — how a 100 TB table is arranged on disk so
  * scans can skip most of it. Z-ordering (Morton order) is the
  * standard multi-dimension clustering move (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`; the reference delegates the same decision to the table
  * format): a single sort key interleaving the bits of several filter
  * columns, so files become tight HYPERCUBES in key space instead of
  * slabs along one axis — zone maps (per-file min/max) then prune
  * selective predicates on ANY interleaved dimension, where a linear
  * sort prunes only its leading column.
  */
object LayoutQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Spread the low 8 bits of `c` to even bit positions (three
    * shift-or-mask rounds — plain integer ops, codegen'd,
    * engine-exact).
    */
  private def spread8(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 4)).bitwiseAND(lit(0x0F0FL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 2)).bitwiseAND(lit(0x3333L))
    x2.bitwiseOR(shiftleft(x2, 1)).bitwiseAND(lit(0x5555L))
  }

  /** 16-bit Morton code of two 8-bit cell ids. */
  def zValue(a: Column, b: Column): Column =
    spread8(a).bitwiseOR(shiftleft(spread8(b), 1))

  /** Z-order layout audit for lineitem clustered on (l_partkey,
    * l_suppkey). Real OPTIMIZE ZORDER quantizes each dimension first
    * (raw key ranges are arbitrary; cell ids must fill the bit
    * budget), so each key min-max-scales to an 8-bit cell — the
    * 1-row min/max stats stay IN-PLAN as a broadcast crossjoin (no
    * driver action), and the scaling division is INTEGER `div`, exact
    * in any engine. The Morton code of the two cells assigns each row
    * a target file (top 8 z-bits — at scale this is
    * `repartitionByRange(zv)` into sized files at write time), and
    * the output is the resulting ZONE-MAP table: per-file row count
    * and min/max extents of BOTH dimensions. The extents are the
    * point: under z-order each file covers ~1/16 of the part range
    * AND ~1/16 of the supplier range simultaneously, so a predicate
    * on either column prunes ~15/16 of the files — the audit a
    * table-format OPTIMIZE job runs to prove its clustering. Scale
    * shape: one tiny stats aggregate broadcast back, one map-only
    * integer projection, one aggregate whose exchange carries file
    * ids, never rows; all arithmetic is integer, so the oracle
    * matches bit for bit.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
    val stats = li.agg(
      min(col("l_partkey")).as("minp"), max(col("l_partkey")).as("maxp"),
      min(col("l_suppkey")).as("mins"), max(col("l_suppkey")).as("maxs"))
    li.crossJoin(broadcast(stats))
      .withColumn("cp", expr("((l_partkey - minp) * 256) div (maxp - minp + 1)"))
      .withColumn("cs", expr("((l_suppkey - mins) * 256) div (maxs - mins + 1)"))
      .withColumn("bucket", shiftright(zValue(col("cp"), col("cs")), 8))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_p"), max(col("l_partkey")).as("max_p"),
        min(col("l_suppkey")).as("min_s"), max(col("l_suppkey")).as("max_s"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_layout_zorder" -> ((s: SparkSession, d: String) => zorderLayout(s, d)))

  val oracle: Map[String, String] = Map(
    "q_layout_zorder" ->
      """WITH st AS (
        |  SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
        |         min(l_suppkey) AS mins, max(l_suppkey) AS maxs
        |  FROM lineitem),
        |cells AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    ((l_partkey - minp) * 256) // (maxp - minp + 1) AS p,
        |    ((l_suppkey - mins) * 256) // (maxs - mins + 1) AS s
        |  FROM lineitem, st),
        |s1 AS (SELECT pk, sk, (p & 255) AS p, (s & 255) AS s FROM cells),
        |s2 AS (SELECT pk, sk, ((p | (p << 4)) & 3855) AS p,
        |              ((s | (s << 4)) & 3855) AS s FROM s1),
        |s3 AS (SELECT pk, sk, ((p | (p << 2)) & 13107) AS p,
        |              ((s | (s << 2)) & 13107) AS s FROM s2),
        |s4 AS (SELECT pk, sk, ((p | (p << 1)) & 21845) AS p,
        |              ((s | (s << 1)) & 21845) AS s FROM s3),
        |z AS (SELECT pk, sk, ((p | (s << 1)) >> 8) AS bucket FROM s4)
        |SELECT bucket, count(*) AS n_rows,
        |  min(pk) AS min_p, max(pk) AS max_p,
        |  min(sk) AS min_s, max(sk) AS max_s
        |FROM z GROUP BY bucket""".stripMargin)
}
