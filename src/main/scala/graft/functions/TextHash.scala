package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text-hashing kernels, called from generated code by
  * the expressions in [[expressions]] (static-style calls keep the
  * whole-stage-codegen path allocation-free apart from the byte-array
  * copy).
  *
  * FNV-1a is used as the base 64-bit hash: public-domain algorithm,
  * stable across JVMs, cheap in a tight loop.
  */
object TextHash {
  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** 64-bit content fingerprint of a document (rolling FNV-1a over
    * the UTF-8 bytes). Analog of a dedup fingerprint column in a
    * training-data pipeline.
    */
  def fingerprint64(s: UTF8String): Long = {
    val b = s.getBytes
    fnv1a(b, 0, b.length)
  }

  /** 64-bit SimHash over whitespace tokens: each token votes its
    * hash bits up/down; the sign of each bit's vote forms the
    * signature. Near-duplicate texts differ in few bits (small
    * Hamming distance).
    */
  def simhash64(s: UTF8String): Long = {
    val b = s.getBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= b.length) {
      val atEnd = i == b.length
      if (atEnd || b(i) == ' '.toByte || b(i) == '\n'.toByte || b(i) == '\t'.toByte) {
        if (i > start) {
          val h = fnv1a(b, start, i)
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Unicode NFC normalization. Pure-ASCII strings (most web text)
    * are detected by a byte scan over the raw UTF8String — high bit
    * clear for every byte — and return the input instance untouched:
    * no String copy, no Normalizer call, one scan per string. Only
    * non-ASCII input pays the toString + isNormalized check (itself
    * usually cheaper than normalize for already-NFC text).
    */
  def nfc(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
