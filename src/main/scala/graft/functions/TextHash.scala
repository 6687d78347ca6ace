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

  private val Log2: Double = math.log(2.0)

  /** -Σ (c/n)·log2(c/n) from a histogram, computed as
    * log2(n) - Σ c·log2(c) / n so each term is one log call.
    */
  private def entropyOf(counts: Iterable[Int], n: Int): Double = {
    if (n == 0) return 0.0
    var s = 0.0
    counts.foreach { c => if (c > 1) s += c * (math.log(c.toDouble) / Log2) }
    val h = (math.log(n.toDouble) / Log2) - s / n
    if (h < 0.0) 0.0 else h // clamp -0.0 / rounding residue on uniform input
  }

  /** Shannon entropy (bits) of the CODE-POINT distribution — the
    * gibberish/boilerplate detector of a web-scale quality gate: long
    * low-entropy runs (repeated padding, ASCII art, binary spill) sit
    * far below prose (English ~4.1–4.5 bits/char). ASCII (most web
    * text) takes a 128-slot array fast path — no boxing, no map — and
    * only strings with a high bit pay the code-point HashMap.
    */
  def charEntropy(s: UTF8String): Double = {
    val n0 = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n0) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) {
      val counts = new Array[Int](128)
      var j = 0
      while (j < n0) { counts(s.getByte(j) & 0x7f) += 1; j += 1 }
      var sum = 0.0
      var k = 0
      while (k < 128) {
        val c = counts(k)
        if (c > 1) sum += c * (math.log(c.toDouble) / Log2)
        k += 1
      }
      if (n0 == 0) 0.0
      else {
        val h = (math.log(n0.toDouble) / Log2) - sum / n0
        if (h < 0.0) 0.0 else h
      }
    } else {
      val str = s.toString
      val counts = new java.util.HashMap[Integer, Int]()
      var j = 0
      var n = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        j += Character.charCount(cp)
        counts.merge(cp, 1, (a: Int, b: Int) => a + b)
        n += 1
      }
      import scala.jdk.CollectionConverters._
      entropyOf(counts.values().asScala, n)
    }
  }

  /** Shannon entropy (bits) of the whitespace-TOKEN distribution —
    * near zero for keyword-stuffed / template pages whose few tokens
    * repeat, high for natural prose. Same tokenizer as the rest of
    * the text family (split on ' ', empties dropped).
    */
  def tokenEntropy(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.HashMap[String, Int]()
    var n = 0
    var from = 0
    val len = str.length
    while (from <= len) {
      val sp = str.indexOf(' ', from)
      val until = if (sp < 0) len else sp
      if (until > from) {
        counts.merge(str.substring(from, until), 1, (a: Int, b: Int) => a + b)
        n += 1
      }
      if (sp < 0) from = len + 1 else from = sp + 1
    }
    import scala.jdk.CollectionConverters._
    entropyOf(counts.values().asScala, n)
  }

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
