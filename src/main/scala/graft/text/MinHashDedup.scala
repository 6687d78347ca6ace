package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket-join.
  *
  * Pipeline (all distributed, no driver materialization):
  *  1. word n-gram shingles per doc, hashed to 64-bit via xxhash64
  *     (codegen'd built-in);
  *  2. k minhashes per doc from one shuffle: explode shingles,
  *     compute k permuted hashes `(a_i·x + b_i) mod p` as array
  *     columns, aggregate `min` per doc (map-side partial min keeps
  *     the shuffle at |docs|·k longs);
  *  3. split the signature into b bands of r rows, hash each band,
  *     self-join on (band index, band hash) — candidate pairs only
  *     ever compare within a bucket (the LSH blocking that avoids the
  *     all-pairs O(n²) at 100 TB);
  *  4. estimated Jaccard = fraction of agreeing signature positions;
  *     keep pairs above threshold.
  *
  * Permutation constants derive from splitmix64 of the index — fixed,
  * deterministic, data-independent.
  */
object MinHashDedup {

  // 2^31-1 (Mersenne prime). Shingle hashes are folded into [0, 2^31)
  // so a·x+b stays well under Long.MaxValue — no overflow under ANSI
  // arithmetic (Spark 4 default).
  private val Prime = 2147483647L

  private def mix(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Minhash signatures: one row per doc, `k`-element array. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, shingleLen: Int = 3): DataFrame = {
    val shingles = docs
      .withColumn("__toks", split(col(textCol), " "))
      .filter(size(col("__toks")) >= shingleLen)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, size(__toks) - $shingleLen),
           |  i -> concat_ws(' ', slice(__toks, i + 1, $shingleLen)))""".stripMargin)).as("__sh"))
      .select(col(idCol),
        xxhash64(col("__sh")).bitwiseAND(lit(0x7fffffffL)).as("__h"))
    // no distinct: min() over duplicate shingle hashes is the same
    // min, and the dedup shuffle costs more than the partial
    // aggregation absorbs — the groupBy's map-side min compresses
    // each partition to k longs per doc before anything moves
    // h_i(x) = (a_i * x + b_i) mod p, min-aggregated per doc
    val mins = (0 until k).map { i =>
      val a = math.abs(mix(2L * i)) % (Prime - 1) + 1
      val b = math.abs(mix(2L * i + 1)) % Prime
      min(pmod(col("__h") * a + b, lit(Prime))).as(s"mh_$i")
    }
    shingles.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** Banded LSH bucket keys: one row per (doc, band) with the band's
    * hash — the blocking key both the self-join ([[candidatePairs]])
    * and the incremental store-probe
    * ([[TextQueries.dedupIncrementalMinhash]]) bucket on. `sigs` must
    * come from [[signatures]] with the same `k`.
    */
  def banded(sigs: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    sigs.select(col(idCol), col("sig"),
        posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $r + 1, $r)))")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate near-dup pairs via banded LSH + signature-agreement
    * Jaccard estimate, filtered at `threshold`.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val sigs = signatures(docs, idCol, textCol, k)
    val banded0 = banded(sigs, idCol, k, bands)
    val a = banded0.select(col("band"), col("band_hash"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = banded0.select(col("band"), col("band_hash"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast($k as double)"))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }
}
