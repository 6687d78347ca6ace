package graft

import java.util.concurrent.atomic.AtomicLong
import scala.collection.concurrent.TrieMap

import graft.streaming.LookupJoin
import graft.streaming.LookupJoin._

/** Caching + retrying lookup-join contract (CachingLookupFunction /
  * retryable delegator semantics).
  */
object LookupCounters {
  val calls: TrieMap[String, AtomicLong] = TrieMap.empty
  def inc(id: String): Long =
    calls.getOrElseUpdate(id, new AtomicLong).incrementAndGet()
}

/** top-level so the closure serializes without dragging the suite in */
class CountingDim(id: String) extends LookupFunction[Long, String] {
  override def lookup(key: Long): Seq[String] = {
    LookupCounters.inc(id)
    if (key % 2 == 0) Seq(s"dim$key") else Nil
  }
}

class LookupJoinSpec extends SparkSpec {
  import spark.implicits._

  test("caching lookup hits the delegate once per distinct key per task") {
    val id = "cache-test"
    val fn = new CachingLookup(new CountingDim(id), maxEntries = 100)
    val probe = spark.createDataset(Seq(2L, 2L, 2L, 4L, 4L, 3L)).repartition(1)
    val out = LookupJoin.lookupJoin(probe, fn)(identity) {
      (k, vs) => (k, vs.headOption.getOrElse("none"))
    }.collect().toSet
    assert(out === Set((2L, "dim2"), (4L, "dim4"), (3L, "none")))
    // 6 probe rows, 3 distinct keys, single partition -> 3 delegate calls
    assert(LookupCounters.calls(id).get() === 3)
  }

  test("cache evicts least-recently-used beyond maxEntries") {
    val id = "evict-test"
    val fn = new CachingLookup(new CountingDim(id), maxEntries = 1)
    fn.lookup(2L); fn.lookup(4L); fn.lookup(2L) // 2 evicted by 4, re-fetched
    assert(LookupCounters.calls(id).get() === 3)
  }

  test("full-cache lookup: one load serves all keys; reload swaps values; no per-key hits") {
    val id = "fullcache-test"
    var version = "v1"
    var now = 0L
    val fn = new FullCachingLookup[Long, String](
      loader = () => {
        LookupCounters.inc(id)
        Map(1L -> Seq(s"one-$version"), 2L -> Seq(s"two-$version"))
      },
      reloadIntervalMs = 1000L,
      clock = () => now)
    // first access loads the snapshot; subsequent keys are pure hits
    assert(fn.lookup(1L) === Seq("one-v1"))
    assert(fn.lookup(2L) === Seq("two-v1"))
    assert(fn.lookup(99L) === Nil) // missing key: no delegate probe either
    assert(LookupCounters.calls(id).get() === 1)
    // inside the period: still the stale snapshot, still one load
    version = "v2"
    now = 999L
    assert(fn.lookup(1L) === Seq("one-v1"))
    assert(LookupCounters.calls(id).get() === 1)
    // period boundary: reload swaps in the new dimension version
    now = 1000L
    assert(fn.lookup(1L) === Seq("one-v2"))
    assert(fn.lookup(2L) === Seq("two-v2"))
    assert(LookupCounters.calls(id).get() === 2)
  }

  test("retrying lookup retries failures then succeeds") {
    val id = "retry-test"
    val flaky = new LookupFunction[Long, String] {
      override def lookup(key: Long): Seq[String] = {
        val n = LookupCounters.inc(id)
        if (n < 3) throw new RuntimeException(s"transient #$n")
        Seq("ok")
      }
    }
    val fn = new RetryingLookup(flaky, maxAttempts = 5)
    assert(fn.lookup(1L) === Seq("ok"))
    assert(LookupCounters.calls(id).get() === 3)
  }

  test("retrying lookup rethrows after max attempts") {
    val fn = new RetryingLookup(new LookupFunction[Long, String] {
      override def lookup(key: Long): Seq[String] = throw new RuntimeException("down")
    }, maxAttempts = 3)
    assertThrows[RuntimeException](fn.lookup(1L))
  }

  test("async lookup preserves input order with concurrent in-flight requests") {
    val fn = new AsyncLookupFunction[Long, String] {
      override def asyncLookup(key: Long)(
          implicit ec: scala.concurrent.ExecutionContext): scala.concurrent.Future[Seq[String]] =
        scala.concurrent.Future {
          Thread.sleep(if (key % 2 == 0) 50 else 1) // evens finish LAST
          Seq(s"dim$key")
        }
    }
    val probe = spark.createDataset(1L to 8L).repartition(1)
    val out = LookupJoin.asyncLookupJoin(probe, fn, capacity = 8)(identity) {
      (k, vs) => s"$k:${vs.head}"
    }.collect().toList
    // ORDERED mode: output follows input order despite odd keys completing first
    assert(out === (1L to 8L).map(k => s"$k:dim$k").toList)
  }

  test("unordered async lookup emits fast completions before a slow one") {
    val fn = new AsyncLookupFunction[Long, String] {
      override def asyncLookup(key: Long)(
          implicit ec: scala.concurrent.ExecutionContext): scala.concurrent.Future[Seq[String]] =
        scala.concurrent.Future {
          Thread.sleep(if (key == 100L) 400 else 10) // one straggler
          Seq(s"dim$key")
        }
    }
    val probe = spark.createDataset(Seq(100L, 1L, 2L, 3L)).repartition(1)
    val out = LookupJoin.asyncLookupJoinUnordered(probe, fn, capacity = 4)(identity) {
      (k, vs) => s"$k:${vs.head}"
    }.collect().toList
    assert(out.toSet === Set("100:dim100", "1:dim1", "2:dim2", "3:dim3"))
    // UNORDERED mode: the straggler (first in input) must emit LAST
    assert(out.last === "100:dim100",
      s"slow head-of-line request should not block fast ones: $out")
  }

  test("retry-on-empty keeps probing until rows appear or attempts end") {
    val id = "empty-test"
    val lateDim = new LookupFunction[Long, String] {
      override def lookup(key: Long): Seq[String] =
        if (LookupCounters.inc(id) >= 2) Seq("late") else Nil
    }
    val fn = new RetryingLookup(lateDim, maxAttempts = 4, retryOnEmpty = true)
    assert(fn.lookup(1L) === Seq("late"))
    assert(LookupCounters.calls(id).get() === 2)
  }
}
