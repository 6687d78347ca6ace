package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Static runtime for the Count–Min probe expression — the same
  * static-call codegen discipline as [[TextHash]] / [[VectorOps]].
  *
  * Spark's `count_min_sketch` aggregate (the mergeable
  * Cormode–Muthukrishnan summary; the reference exposes the same
  * family through its ProcessFunction state + flink-statefun users)
  * produces the sketch BYTES but ships no scalar to read them back
  * inside a query, so estimates normally require driver-side
  * deserialization. `cmsEstimate` closes that gap as a codegen-safe
  * static: probe frames are candidate-sized (top-N tokens), the
  * sketch column is a broadcast 1-row frame, and the per-thread memo
  * keyed on the byte-array reference means each task deserializes the
  * sketch once, not once per row.
  *
  * String items are probed through the byte[] overload on UTF-8
  * bytes, which is byte-identical to how the aggregate inserts
  * STRING columns (CountMinSketchAgg calls addBinary(getBytes) —
  * sql/catalyst aggregate/CountMinSketchAgg.scala), so probe hashes
  * equal insert hashes by construction.
  */
object SketchOps {
  private val memo =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  def cmsEstimate(bytes: Array[Byte], item: UTF8String): Long = {
    var m = memo.get()
    if (m == null || (m._1 ne bytes)) {
      m = (bytes, CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
      memo.set(m)
    }
    m._2.estimateCount(item.getBytes)
  }
}
