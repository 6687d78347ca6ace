package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}

/** Lookup-join function contract with caching and retry — the
  * reference's per-record dimension lookup stack
  * (flink-table-runtime functions/table/lookup/CachingLookupFunction
  * .java:53, LookupCacheManager, and the retryable delegator used by
  * AsyncLookupJoinRunner). The batch/broadcast snapshot lookup join
  * stays the Catalyst-planned path (MiscQueries.lookupJoin); this is
  * the imperative contract for dimension sources that are external
  * services: per-task LRU caching so hot keys don't re-hit the
  * service, and bounded fixed-delay retry for transient failures.
  *
  * Scale: the cache lives per task (deserialized closure), so memory
  * is maxEntries·|row| per core and no coordination exists between
  * executors — the same locality the reference's per-subtask
  * LookupCache has.
  */
object LookupJoin {

  /** User-defined lookup into a dimension source (the reference's
    * LookupFunction.lookup(RowData)).
    */
  trait LookupFunction[K, V] extends Serializable {
    def lookup(key: K): Seq[V]
    /** Release per-task resources (the reference's FunctionContext
      * close()) — connection-holding implementations override.
      */
    def close(): Unit = ()
  }

  /** LRU caching wrapper (CachingLookupFunction): delegate hit only
    * on cache miss; negative results (empty) are cached too, like the
    * reference's cacheMissingKey=true default.
    */
  final class CachingLookup[K, V](delegate: LookupFunction[K, V], maxEntries: Int)
      extends LookupFunction[K, V] {
    @transient private lazy val cache =
      new java.util.LinkedHashMap[K, Seq[V]](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[K, Seq[V]]): Boolean =
          size() > maxEntries
      }
    override def lookup(key: K): Seq[V] = cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val v = delegate.lookup(key)
        cache.put(key, v)
        v
      }
    }
    override def close(): Unit = delegate.close()
  }

  /** Full-cache mode (the reference's LookupFullCache.java:36 with
    * its CacheLoader): the ENTIRE dimension snapshot loads on first
    * access and re-loads after each `reloadIntervalMs`; lookups
    * between reloads are pure in-memory hits — the loader (a full
    * dimension scan) runs once per period, never per record. For
    * dimensions small enough to hold per task this trades a bounded
    * staleness (the reload period) for zero per-record service
    * traffic. The clock is injectable so specs drive the reload
    * boundary deterministically.
    */
  final class FullCachingLookup[K, V](loader: () => Map[K, Seq[V]],
      reloadIntervalMs: Long,
      clock: () => Long = () => System.currentTimeMillis())
      extends LookupFunction[K, V] {
    @transient private var snapshot: Map[K, Seq[V]] = _
    @transient private var loadedAt: Long = Long.MinValue
    override def lookup(key: K): Seq[V] = this.synchronized {
      val now = clock()
      if (snapshot == null || now - loadedAt >= reloadIntervalMs) {
        snapshot = loader()
        loadedAt = now
      }
      snapshot.getOrElse(key, Nil)
    }
  }

  /** Fixed-delay retry wrapper (the reference's retryable lookup
    * delegator): retries on exception, and optionally on empty
    * results (RetryPredicates.EMPTY_RESULT_PREDICATE).
    */
  final class RetryingLookup[K, V](delegate: LookupFunction[K, V],
      maxAttempts: Int, delayMs: Long = 0L, retryOnEmpty: Boolean = false)
      extends LookupFunction[K, V] {
    override def lookup(key: K): Seq[V] = {
      var attempt = 0
      while (true) {
        attempt += 1
        try {
          val r = delegate.lookup(key)
          if (r.nonEmpty || !retryOnEmpty || attempt >= maxAttempts) return r
        } catch {
          case e: Exception if attempt < maxAttempts => // retry
        }
        if (delayMs > 0) Thread.sleep(delayMs)
      }
      Nil // unreachable
    }
    override def close(): Unit = delegate.close()
  }

  /** Per-record lookup join over a (bounded or streaming) dataset:
    * `combine` receives the probe row and the looked-up dimension
    * rows (empty Seq = no match, i.e. LEFT join shape).
    */
  def lookupJoin[T, K, V, U: Encoder](ds: Dataset[T], fn: LookupFunction[K, V])(
      key: T => K)(combine: (T, Seq[V]) => U): Dataset[U] =
    ds.mapPartitions(it => it.map(t => combine(t, fn.lookup(key(t)))))

  /** Async lookup contract (the reference's AsyncLookupFunction /
    * AsyncWaitOperator): lookups for up to `capacity` records are in
    * flight concurrently; output preserves input order (ORDERED
    * mode). Hides per-record latency of remote dimension services —
    * throughput ≈ capacity / RTT instead of 1 / RTT per task.
    */
  trait AsyncLookupFunction[K, V] extends Serializable {
    def asyncLookup(key: K)(
        implicit ec: scala.concurrent.ExecutionContext): scala.concurrent.Future[Seq[V]]
  }

  /** UNORDERED async mode (the reference's AsyncWaitOperator in
    * UNORDERED output mode / AsyncDataStream.unorderedWait):
    * completions emit as soon as they finish, so one slow request
    * delays only itself — max throughput when downstream doesn't
    * need arrival order.
    */
  def asyncLookupJoinUnordered[T, K, V, U: Encoder](ds: Dataset[T],
      fn: AsyncLookupFunction[K, V], capacity: Int = 32,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(5, "min"))(
      key: T => K)(combine: (T, Seq[V]) => U): Dataset[U] =
    ds.mapPartitions { it =>
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      // completion queue: each future registers ONE callback at
      // submission and pushes its result when done — O(1) per element
      // (firstCompletedOf-style polling would re-register a callback
      // on every pending future per emitted row)
      val done = new java.util.concurrent.LinkedBlockingQueue[Either[Throwable, U]]()
      var inFlight = 0
      new Iterator[U] {
        override def hasNext: Boolean = inFlight > 0 || it.hasNext
        override def next(): U = {
          while (inFlight < capacity && it.hasNext) {
            val t = it.next()
            fn.asyncLookup(key(t)).map(vs => combine(t, vs)).onComplete {
              case scala.util.Success(u) => done.put(Right(u))
              case scala.util.Failure(e) => done.put(Left(e))
            }
            inFlight += 1
          }
          val r = done.poll(timeout.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
          if (r == null) throw new java.util.concurrent.TimeoutException(
            s"async lookup did not complete within $timeout")
          inFlight -= 1
          r match {
            case Right(u) => u
            case Left(e) => throw e
          }
        }
      }
    }

  def asyncLookupJoin[T, K, V, U: Encoder](ds: Dataset[T], fn: AsyncLookupFunction[K, V],
      capacity: Int = 32, timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(5, "min"))(
      key: T => K)(combine: (T, Seq[V]) => U): Dataset[U] =
    ds.mapPartitions { it =>
      import scala.concurrent.{Await, Future}
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      // true sliding window: a new lookup launches as soon as the
      // OLDEST completes (ordered emission), so one slow request
      // stalls only its own slot, not a whole batch barrier
      val inFlight = scala.collection.mutable.Queue.empty[Future[U]]
      new Iterator[U] {
        override def hasNext: Boolean = inFlight.nonEmpty || it.hasNext
        override def next(): U = {
          while (inFlight.size < capacity && it.hasNext) {
            val t = it.next()
            inFlight.enqueue(fn.asyncLookup(key(t)).map(vs => combine(t, vs)))
          }
          Await.result(inFlight.dequeue(), timeout)
        }
      }
    }
}
