package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Bloom-prefiltered incremental dedup — the at-scale variant of
  * [[TextQueries.dedupIncremental]]. The daily-ingest join has an
  * asymmetry the plain plan ignores: the STORE side (every content
  * hash ever ingested) is orders of magnitude larger than the day's
  * batch, yet almost every batch row is genuinely new and learns
  * nothing from the join. A Bloom filter built over the store
  * (m = 2^20 bits here — 128 KiB regardless of store size at this
  * fill; size m with the store's key count in production) broadcasts
  * to the batch, and only the rows the filter CANNOT rule out pay
  * the exact store join; definite-new rows skip it entirely. No
  * false negatives by construction (every store key sets its own
  * bits), so the output is EXACTLY [[TextQueries.dedupIncremental]]
  * — same oracle — while the store-sized join shrinks to the
  * maybe-dup slice. False positives only cost a wasted probe
  * (~(nk/m)^k, spec-measured).
  *
  * Everything is deterministic md5 bit derivation + builtin
  * expressions: the filter builds as ONE distributed aggregate
  * (explode k positions → groupBy bit-word → bit_or), never a
  * driver-side loop, and probes as a broadcast join.
  */
object BloomDedup {

  /** Filter geometry: 2^20 bits (16 Ki longs), 5 hash functions. */
  val MBits = 1 << 20
  val KHashes = 5

  /** The k bit positions of a key: md5("bf<i>:" + key) truncated to
    * 32 bits, mod m — engine-reproducible, no RNG.
    */
  private def positions(key: Column): Column =
    array((0 until KHashes).map(h =>
      conv(substring(md5(concat(lit(s"bf$h:"), key).cast("binary")), 1, 8), 16, 10)
        .cast("long") % MBits): _*)

  /** Build the filter over `keys` (one string column named `h`):
    * returns (word_idx, bits) — at most m/64 rows, built with one
    * partial+final bit_or aggregate; the key stream shuffles only
    * its set-bit coordinates.
    */
  def build(keys: DataFrame): DataFrame =
    keys.select(explode(positions(col("h"))).as("pos"))
      .select(expr("pos div 64").as("word_idx"),
        expr("shiftleft(1L, cast(pos % 64 as int))").as("bit"))
      .groupBy(col("word_idx")).agg(expr("bit_or(bit)").as("bits"))

  /** Probe: adds `maybe_prior` (1 = the filter cannot rule the key
    * out; 0 = definitely not in the store). The k probe rows
    * broadcast-join the filter map-side; the only exchange carries
    * one row per input row (the partial-aggregated AND of hits).
    */
  def probe(batch: DataFrame, filter: DataFrame): DataFrame = {
    val hits = batch.select(col("doc_id"), explode(positions(col("h"))).as("pos"))
      .select(col("doc_id"), expr("pos div 64").as("word_idx"),
        expr("shiftleft(1L, cast(pos % 64 as int))").as("bit"))
      .join(broadcast(filter), Seq("word_idx"), "left")
      .select(col("doc_id"),
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("bit")) =!= 0L)
          .cast("int").as("hit"))
      .groupBy(col("doc_id")).agg(min(col("hit")).as("maybe_prior"))
    batch.join(hits, Seq("doc_id"))
  }

  /** The full operator: identical semantics (and oracle) to
    * [[TextQueries.dedupIncremental]], with the store join gated
    * behind the Bloom probe — at production scale the exact join's
    * probe side is the duplicate slice of the batch, not the batch.
    */
  def dedupIncrementalBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .withColumn("h", md5(col("text").cast("binary")))
    val prior = docs.filter(col("source") =!= "src1").select(col("h")).distinct()
    val batch = docs.filter(col("source") === "src1")
      .select(col("doc_id"), col("h"))
    val probed = probe(batch, build(prior))
    // only maybe-dups pay the store join; definite-new rows bypass it
    val maybes = probed.filter(col("maybe_prior") === 1)
      .join(prior.withColumn("in_prior", lit(1)), Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        coalesce(col("in_prior"), lit(0)).as("dup_prior"))
    val news = probed.filter(col("maybe_prior") === 0)
      .select(col("doc_id"), col("h"), lit(0).as("dup_prior"))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    maybes.unionByName(news)
      .withColumn("first_in_batch", (row_number().over(w) === 1).cast("int"))
      .withColumn("ingest",
        (col("dup_prior") === 0 && col("first_in_batch") === 1).cast("int"))
      .select(col("doc_id"), col("h"), col("dup_prior"),
        col("first_in_batch"), col("ingest"))
  }
}
