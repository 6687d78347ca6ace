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
    * high probability — the blocking step for ANN at scale.
    */
  def lshBucket(a: ArrayData, nBits: Int): Int = {
    var code = 0
    var bit = 0
    while (bit < nBits) {
      var s = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        // deterministic pseudo-random component in [-0.5, 0.5):
        // splitmix-style avalanche of (bit, i)
        var z = (bit.toLong << 32 | i.toLong) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        val r = (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
        s += a.getFloat(i).toDouble * r
        i += 1
      }
      if (s >= 0) code |= (1 << bit)
      bit += 1
    }
    code
  }
}
