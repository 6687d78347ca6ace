package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense float-vector kernels over Catalyst ArrayData, called from
  * generated code (see [[CosineSimilarity]] / [[DotProduct]]).
  * Accumulation is in double, sequential order — bit-identical to
  * a scalar loop in any other engine that upcasts float→double.
  */
object VectorOps {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def norm2(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val v = a.getFloat(i).toDouble
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = norm2(a)
    val nb = norm2(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Random-hyperplane LSH bucket: sign bits of the dot product with
    * `nBits` pseudo-random (seed-derived, data-independent)
    * hyperplanes. Cosine-similar vectors land in the same bucket with
    * high probability — the blocking step for ANN at scale. `seed`
    * selects an independent hyperplane family, enabling multi-table
    * LSH (each table is an independent chance to co-bucket true
    * neighbors).
    */
  /** Sign of the dot product with hyperplane (seed, bit): components
    * are a deterministic splitmix-style avalanche of (seed, bit, i)
    * in [-0.5, 0.5). Shared by [[lshBucket]] and [[lshSignature]].
    */
  private def hyperplaneSign(a: ArrayData, seed: Int, bit: Int): Boolean = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      var z = ((seed.toLong * 1024 + bit).toLong << 32 | i.toLong) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      val r = (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
      s += a.getFloat(i).toDouble * r
      i += 1
    }
    s >= 0
  }

  def lshBucket(a: ArrayData, nBits: Int, seed: Int): Int = {
    var code = 0
    var bit = 0
    while (bit < nBits) {
      if (hyperplaneSign(a, seed, bit)) code |= (1 << bit)
      bit += 1
    }
    code
  }

  def lshBucket(a: ArrayData, nBits: Int): Int = lshBucket(a, nBits, 0)

  /** Wide random-hyperplane signature: `nBits` sign bits packed into
    * longs. Hamming distance between signatures estimates the angle
    * (E[ham] = nBits·θ/π, σ ∝ √nBits), so a popcount scan over
    * signatures is a cheap prefilter for exact cosine rerank — the
    * ANN structure that still works when embeddings have no cluster
    * structure for buckets to exploit (measured on the test corpus:
    * 64-bit sigs top-64 rerank ≈ 0.66 recall, 512-bit ≈ 1.0).
    */
  def lshSignature(a: ArrayData, nBits: Int, seed: Int = 0): Array[Long] = {
    val words = new Array[Long]((nBits + 63) / 64)
    var bit = 0
    while (bit < nBits) {
      if (hyperplaneSign(a, seed, bit)) words(bit >> 6) |= 1L << (bit & 63)
      bit += 1
    }
    words
  }

  def lshSignatureData(a: ArrayData, nBits: Int): ArrayData = lshSignatureData(a, nBits, 0)

  def lshSignatureData(a: ArrayData, nBits: Int, seed: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(lshSignature(a, nBits, seed))

  /** Hamming distance between two packed signatures. */
  def hammingSig(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0
    var i = 0
    while (i < n) {
      d += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    d
  }

  /** Achlioptas ±1 sign matrices for [[rpProject]], keyed by
    * (dIn, dOut) and built once per JVM (so once per executor). Entry
    * rule: first hex nibble of md5("rp:i:j") < 8 → +1 else -1 — the
    * identical derivation the DuckDB oracle evaluates in SQL, so any
    * engine regenerates the same matrix from nothing but the index
    * pair. Layout is row-major [j][i] for a cache-friendly inner loop.
    */
  private val rpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def rpSigns(dIn: Int, dOut: Int): Array[Array[Double]] =
    rpCache.computeIfAbsent((dIn, dOut), { key =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(key._2, key._1) { (j, i) =>
        md.reset()
        val d = md.digest(
          s"rp:$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (((d(0) & 0xff) >>> 4) < 8) 1.0 else -1.0
      }
    })

  /** Sign random projection of an ARRAY<FLOAT> vector to `dOut` dims,
    * each component quantized floor(v*1000) and the results joined to
    * a CSV string — the whole q_embed_rp row body in one codegen'd
    * static call. The sign matrix comes from the per-JVM cache above;
    * the hot loop is dOut fused multiply-accumulate passes with no
    * hashing and no allocation beyond the output string.
    * Accumulation is left-to-right in double (float→double products
    * are exact), bit-identical to the oracle's list_sum fold.
    */
  def rpProject(a: ArrayData, dOut: Int): org.apache.spark.unsafe.types.UTF8String = {
    val n = a.numElements()
    val signs = rpSigns(n, dOut)
    val sb = new java.lang.StringBuilder(dOut * 8)
    var j = 0
    while (j < dOut) {
      val row = signs(j)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += a.getFloat(i).toDouble * row(i)
        i += 1
      }
      if (j > 0) sb.append(',')
      sb.append(math.floor(acc * 1000.0).toLong)
      j += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
}
