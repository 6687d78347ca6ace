package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact table profiler — the ANALYZE-style per-column census
  * (row count, null count, exact distinct count) a warehouse runs
  * before planning and a data pipeline runs as its ingest health
  * check. Schema-generic: the aggregate list derives from the
  * DataFrame's own schema, so any table profiles without
  * per-table code.
  *
  * Shape: ONE aggregate pass emits every column's counters as a
  * single row, then a `stack` generator melts it to one row per
  * column — the melt runs over the 1-row aggregate, never the
  * table. The exact distinct counts go through Catalyst's
  * multi-distinct rewrite (one Expand of width |columns|, the
  * honest cost of exactness); the at-scale variant swaps
  * `countDistinct` for `approx_count_distinct` and the Expand
  * disappears — one true streaming pass (the [[graft.operators
  * .AggQueries]] HLL battery covers that path).
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"null__${f.name}"),
        countDistinct(col(f.name)).as(s"dist__${f.name}"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields
      .map(f => s"'${f.name}', `null__${f.name}`, `dist__${f.name}`")
      .mkString(", ")
    row.select(col("n_rows"),
        expr(s"stack(${fields.length}, $stackArgs) AS (col_name, n_null, n_distinct)"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
  }

  /** The at-scale variant: `approx_count_distinct` (HLL++, rsd 5%)
    * replaces the exact distincts, which removes the multi-distinct
    * Expand entirely — ONE streaming aggregate pass whatever the
    * column count (ProfilerSpec pins the Expand-free plan and the
    * error band). Not oracle-checked: the sketch is engine-specific,
    * the `q_agg_approx` convention.
    */
  def profileApprox(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"null__${f.name}"),
        approx_count_distinct(col(f.name)).as(s"dist__${f.name}"))
    } :+ count(lit(1)).as("n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = fields
      .map(f => s"'${f.name}', `null__${f.name}`, `dist__${f.name}`")
      .mkString(", ")
    row.select(col("n_rows"),
        expr(s"stack(${fields.length}, $stackArgs) AS (col_name, n_null, n_distinct)"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
  }

  /** Driver query: profile the orders table. */
  def profileOrders(s: SparkSession, dir: String): DataFrame =
    profile(Tables.load(s, dir, "orders"))

  private val orderCols = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  /** Per-shard table checksum — the anti-entropy primitive a
    * replicated/warehouse pipeline uses to compare two copies of a
    * table without moving either (compare 32 checksums, re-sync only
    * shards that differ). Each row folds to a 60-bit integer via md5
    * over an explicit engine-stable rendering (integers, strings, and
    * epoch-micros — no raw float formatting, the cross-engine
    * hazard), and shards fold them with BIT_XOR: commutative and
    * associative (partition order can't matter) and overflow-free
    * where a BIGINT sum of 60-bit values is not. Map-only projection
    * into a |shards|-row aggregate.
    */
  def tableChecksum(s: SparkSession, dir: String, shards: Int = 32): DataFrame =
    checksumOn(Tables.load(s, dir, "orders"), shards)

  def checksumOn(o: DataFrame, shards: Int): DataFrame = {
    o.select(
        pmod(col("o_orderkey"), lit(shards.toLong)).as("shard"),
        conv(substring(md5(concat_ws("|",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), unix_micros(col("o_orderdate")))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("rh"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(rh)").as("checksum"))
  }

  /** Equi-width value histogram per event_type (20 bins over the
    * type's own min/max): the distribution sketch a profiler draws.
    * Two passes — a |types|-row min/max aggregate broadcast back,
    * then one binning aggregate; bin ids are floor((x−lo)/(hi−lo)·k)
    * clamped to k−1, every step an exactly-rounded IEEE op both
    * engines share.
    */
  def valueHistogram(s: SparkSession, dir: String, bins: Int = 20): DataFrame =
    histogramOn(Tables.load(s, dir, "events"), bins)

  def histogramOn(ev: DataFrame, bins: Int): DataFrame = {
    val span = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    ev.join(broadcast(span), Seq("event_type"))
      .withColumn("bin",
        least(floor((col("value") - col("lo")) / (col("hi") - col("lo")) * bins),
          lit(bins - 1L)).cast("int"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Snapshot diff — the keyed two-version audit a data pipeline runs
    * between ingest snapshots (what changed since the last run; the
    * freshness/regression gate before a training-data release): FULL
    * OUTER join on the key, row-content HASH compare, per-key status
    * added / removed / changed / unchanged. Each side collapses to
    * (key, md5(content)) map-side, so exactly one narrow column pair
    * crosses the key-partitioned join — co-partitioned/bucketed
    * snapshots make it exchange-free, and no corpus-wide sort exists
    * at any scale. The gate corpus ships one snapshot, so v2 derives
    * deterministically ([[snapshotV2]]) and the oracle replays it;
    * production passes two real snapshots to [[snapshotDiffOn]].
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "documents")
    snapshotDiffOn(base, snapshotV2(base))
  }

  /** The deterministic second snapshot: drop doc_id % 97 == 0,
    * rewrite text for doc_id % 53 == 0, add a re-keyed copy of the
    * doc_id % 101 == 0 slice above the id space.
    */
  def snapshotV2(base: DataFrame): DataFrame =
    base.filter(pmod(col("doc_id"), lit(97L)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(53L)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(base.filter(pmod(col("doc_id"), lit(101L)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L)))

  def snapshotDiffOn(base: DataFrame, v2: DataFrame): DataFrame = {
    def hashed(df: DataFrame, h: String): DataFrame =
      df.select(col("doc_id"),
        md5(concat_ws("", col("text"), col("lang"), col("source"),
          col("n_chars")).cast("binary")).as(h))
    hashed(base, "h1").join(hashed(v2, "h2"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Join-key skew audit — the diagnostic a pipeline runs BEFORE
    * choosing a mitigation (two-phase salting, AQE skew-join split,
    * broadcast): per-key counts of a candidate join key, the top-N
    * heaviest keys with their traffic share, and the max/avg skew
    * factor. One partial+final count per key (the fact stream
    * collapses map-side), a TakeOrdered top-N (never a global sort),
    * and a 1-row stats broadcast; the only window runs over the
    * top-N rows. All-integer output (ppm via floor division, avg
    * floored first so max_cnt·1e6 stays far from Long range at any
    * scale) — exact in both engines. Companion to
    * [[graft.operators.Salting]]: this op tells you WHERE to apply it.
    */
  def skewAudit(s: SparkSession, dir: String, topN: Int = 10): DataFrame =
    skewAuditOn(Tables.load(s, dir, "lineitem").select(col("l_suppkey").as("key")), topN)

  def skewAuditOn(keys: DataFrame, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = keys.groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    val t = c.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    val top = c.orderBy(col("cnt").desc, col("key").asc).limit(topN)
    val w = Window.orderBy(col("cnt").desc, col("key").asc)
    top.crossJoin(broadcast(t))
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("key"), col("cnt"),
        // integer `div`, not `/` (double division would round where
        // the oracle floors — the curriculum-bins lesson)
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr("max_cnt * 1000000 div (total div n_keys)").as("skew_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_audit" -> ((s: SparkSession, d: String) => skewAudit(s, d)),
    "q_profile_table" -> ((s: SparkSession, d: String) => profileOrders(s, d)),
    "q_table_checksum" -> ((s: SparkSession, d: String) => tableChecksum(s, d)),
    "q_snapshot_diff" -> ((s: SparkSession, d: String) => snapshotDiff(s, d)),
    "q_value_histogram" -> ((s: SparkSession, d: String) => valueHistogram(s, d)))

  val oracle: Map[String, String] = Map(
    "q_skew_audit" ->
      """WITH c AS (
        |  SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
        |t AS (
        |  SELECT sum(cnt) AS total, count(*) AS n_keys, max(cnt) AS max_cnt FROM c)
        |SELECT * FROM (
        |  SELECT row_number() OVER (ORDER BY cnt DESC, key) AS rank, key, cnt,
        |    (cnt * 1000000 // total)::BIGINT AS share_ppm,
        |    (max_cnt * 1000000 // (total // n_keys))::BIGINT AS skew_ppm
        |  FROM c, t)
        |WHERE rank <= 10""".stripMargin,
    "q_snapshot_diff" ->
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 53 = 0 THEN text || ' v2' ELSE text END AS text,
        |    lang, source, n_chars
        |  FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 101 = 0),
        |h1 AS (
        |  SELECT doc_id,
        |    md5(text || '|' || lang || '|' || source || '|' || n_chars) AS h
        |  FROM documents),
        |h2 AS (
        |  SELECT doc_id,
        |    md5(text || '|' || lang || '|' || source || '|' || n_chars) AS h
        |  FROM v2)
        |SELECT coalesce(h1.doc_id, h2.doc_id) AS doc_id,
        |  CASE WHEN h1.h IS NULL THEN 'added'
        |       WHEN h2.h IS NULL THEN 'removed'
        |       WHEN h1.h <> h2.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM h1 FULL OUTER JOIN h2 ON h1.doc_id = h2.doc_id""".stripMargin,
    "q_table_checksum" ->
      """SELECT o_orderkey % 32 AS shard, count(*) AS n_rows,
        |  bit_xor(('0x' || substr(md5(
        |    o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' ||
        |    o_orderpriority || '|' || epoch_us(o_orderdate)), 1, 15))::BIGINT)
        |    AS checksum
        |FROM orders GROUP BY 1""".stripMargin,
    "q_value_histogram" ->
      """WITH span AS (
        |  SELECT event_type, min(value) AS lo, max(value) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT event_type,
        |  least(floor((value - lo) / (hi - lo) * 20), 19)::INT AS bin,
        |  count(*) AS n
        |FROM events JOIN span USING (event_type)
        |GROUP BY 1, 2""".stripMargin,
    "q_profile_table" -> orderCols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n"))
}
