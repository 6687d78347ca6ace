package graft.datastream

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed DataStream-style facade (SURVEY.md §2.10 — tier 2 of the
  * reference: DataStream.java map/flatMap/filter/keyBy/process,
  * KeyedStream reduce). Thin by design: each call delegates straight
  * to the equivalent Dataset/KeyValueGroupedDataset operation so the
  * plan stays fully Catalyst-optimizable; the facade only restores
  * the reference's API shape.
  *
  * Works identically over bounded (read) and unbounded (readStream)
  * datasets — the same unified surface as the reference.
  */
final case class FStream[T](ds: Dataset[T]) {

  def map[U: Encoder](f: T => U): FStream[U] = FStream(ds.map(f))

  def flatMap[U: Encoder](f: T => IterableOnce[U]): FStream[U] =
    FStream(ds.flatMap(f))

  def filter(p: T => Boolean): FStream[T] = FStream(ds.filter(p))

  def union(other: FStream[T]): FStream[T] = FStream(ds.union(other.ds))

  def keyBy[K: Encoder](key: T => K): FKeyedStream[K, T] =
    FKeyedStream(ds.groupByKey(key))

  /** DataStream.assignTimestampsAndWatermarks → withWatermark. */
  def assignWatermark(tsCol: String, delay: String): FStream[T] =
    FStream(ds.withWatermark(tsCol, delay).as[T](ds.encoder))

  /** Watermark with idleness (WatermarkStrategy.withIdleness,
    * flink-core WatermarkStrategy.java:147): a source that goes
    * silent must stop holding back the fan-in watermark — Spark's
    * global watermark is the MIN across sources, so one idle input
    * stalls every downstream window of a union/connect/join, the
    * exact operational pain the reference API addresses.
    *
    * Spark-first shape: a 1 row/s rate-source heartbeat is unioned in
    * BEFORE the watermark node carrying event time = processing time
    * − idleness, and filtered back out right AFTER it. The watermark
    * node observes the heartbeat (advancing this stream's watermark
    * to a processing-time floor once real data pauses longer than the
    * idleness gap), while downstream operators never see a synthetic
    * row. Net effect matches the reference: an idle stream's
    * watermark follows wall clock at distance `idleness`, so the
    * fan-in min tracks the live sources; on resume, rows younger than
    * `idleness` are still on time.
    */
  def assignWatermark(tsCol: String, delay: String, idleness: String): FStream[T] = {
    import org.apache.spark.sql.functions._
    val schema = ds.schema
    val real = ds.toDF().withColumn("__hb", lit(false))
    val heartbeats = ds.sparkSession.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .select(schema.fields.map { f =>
        if (f.name == tsCol)
          (col("timestamp") - expr(s"INTERVAL $idleness")).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
      .withColumn("__hb", lit(true))
    val hbIdx = schema.length // __hb sits after the payload columns
    val merged = real.unionByName(heartbeats)
      .withWatermark(tsCol, delay)
      // TYPED filter on purpose: a Column predicate on __hb would be
      // pushed below the watermark node (it does not reference the
      // event-time column) and constant-fold the heartbeat branch
      // away — the watermark operator would never see a heartbeat.
      // The lambda is opaque to the optimizer, so it stays above.
      .filter((r: org.apache.spark.sql.Row) => !r.getBoolean(hbIdx))
      .drop("__hb")
    FStream(merged.as[T](ds.encoder))
  }

  /** DataStream.connect (DataStream.java:253): two typed streams, one
    * downstream operator seeing both. Encoded as a tagged union so the
    * merged stream shuffles once on the common key.
    */
  def connect[B](other: FStream[B])(
      implicit e: Encoder[CoRecord[T, B]]): FConnectedStream[T, B] =
    FConnectedStream(
      ds.map(a => CoRecord[T, B](Some(a), None))
        .union(other.ds.map(b => CoRecord[T, B](None, Some(b)))))

  /** Broadcast-state pattern (BroadcastProcessFunction): every element
    * of this stream sees the whole (small) control stream. The control
    * side is collected and broadcast to executors — the same
    * replicate-the-small-side plan a broadcast join produces, exposed
    * imperatively. Control must be bounded (it is the rule/config
    * stream in the reference's pattern too).
    */
  def withBroadcast[C, U: Encoder](control: Dataset[C])(f: (T, Seq[C]) => U): FStream[U] = {
    val rules = control.sparkSession.sparkContext.broadcast(control.collect().toSeq)
    FStream(ds.map(t => f(t, rules.value)))
  }

  /** Side outputs (ProcessFunction ctx.output(tag, ...)): one logical
    * pass classifies every element to the main (Left) or side (Right)
    * output. Caller should persist `ds` upstream if recomputation
    * matters — Spark's DAG re-evaluates per sink, the same trade the
    * reference's side outputs avoid via its push runtime.
    */
  def sideOutput[U: Encoder, V: Encoder](f: T => Either[U, V])(
      implicit e: Encoder[CoRecord[U, V]]): (FStream[U], FStream[V]) = {
    val tagged = ds.map(t => f(t) match {
      case Left(u) => CoRecord[U, V](Some(u), None)
      case Right(v) => CoRecord[U, V](None, Some(v))
    })
    (FStream(tagged.filter(_.left.isDefined).map(_.left.get)),
      FStream(tagged.filter(_.right.isDefined).map(_.right.get)))
  }

  /** DataStream.coGroup (DataStream.java:720): per-key iterators of
    * both inputs — Spark's KeyValueGroupedDataset.cogroup is the
    * exact operator (one co-partitioned shuffle).
    */
  def coGroup[B, K: Encoder, U: Encoder](other: FStream[B])(
      k1: T => K, k2: B => K)(
      f: (K, Iterator[T], Iterator[B]) => IterableOnce[U]): FStream[U] =
    FStream(ds.groupByKey(k1).cogroup(other.ds.groupByKey(k2))(
      (k: K, a: Iterator[T], b: Iterator[B]) => f(k, a, b).iterator))

  /** AsyncDataStream.orderedWait / unorderedWait (flink-streaming-java
    * api/datastream/AsyncDataStream.java:115,165): async I/O per
    * element with a bounded in-flight window of `capacity` futures per
    * partition. `ordered = true` emits in input order (head-of-window
    * await — a slow element delays its successors' EMISSION, never
    * their launch); `ordered = false` emits in completion order within
    * the window, the reference's lower-latency mode. The per-element
    * timer starts at LAUNCH (registration) exactly as the reference's
    * AsyncFunction#timeout does: an element that exceeds
    * `timeoutMillis` from its launch fails the task even while other
    * in-window elements keep completing, and a queued ordered element
    * never gets capacity × timeout of budget. One deliberate
    * divergence: a future that completes before we check its expired
    * timer is emitted, not failed — completion wins the timer race
    * (the reference cancels the timer on completion; here the check
    * happens at emission). The delegate runs on its own
    * ExecutionContext (the caller builds the Future); this operator
    * only windows and awaits, so no thread pool is owned here.
    */
  def asyncMap[U: Encoder](capacity: Int, timeoutMillis: Long, ordered: Boolean)(
      f: T => scala.concurrent.Future[U]): FStream[U] = {
    require(capacity > 0, "capacity must be positive")
    FStream(ds.mapPartitions { it =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      if (ordered) new Iterator[U] {
        // (future, launchNanos): the timer runs from launch, so a
        // queued element's remaining budget shrinks while it waits
        // behind the head — never capacity × timeout
        private val window = scala.collection.mutable.Queue.empty[(Future[U], Long)]
        private def fill(): Unit =
          while (window.size < capacity && it.hasNext)
            window += ((f(it.next()), System.nanoTime()))
        fill()
        override def hasNext: Boolean = window.nonEmpty
        override def next(): U = {
          val (fu, t0) = window.dequeue()
          val remainMs = timeoutMillis - (System.nanoTime() - t0) / 1000000L
          // budget 0 => immediate TimeoutException unless already done
          val r = Await.result(fu, math.max(0L, remainMs).millis)
          fill(); r
        }
      } else new Iterator[U] {
        private val ec = scala.concurrent.ExecutionContext.parasitic
        // ONE completion callback per future, registered at launch,
        // feeding a shared queue — never firstCompletedOf per wait,
        // which would re-register callbacks on every spurious wakeup
        // and accumulate them on a long-hung future until it resolves
        private val done =
          new java.util.concurrent.LinkedBlockingQueue[(Long, scala.util.Try[U])]()
        private var inflight = Map.empty[Long, (Future[U], Long)]
        private var nextId = 0L
        private def fill(): Unit =
          while (inflight.size < capacity && it.hasNext) {
            val id = nextId; nextId += 1
            val fu = f(it.next())
            fu.onComplete(r => done.put((id, r)))(ec)
            inflight += id -> ((fu, System.nanoTime()))
          }
        fill()
        override def hasNext: Boolean = inflight.nonEmpty
        override def next(): U = {
          while (inflight.nonEmpty) {
            // wait only up to the EARLIEST in-flight deadline: a hung
            // future fails at its own launch+timeout even while other
            // in-window elements keep completing around it
            val now = System.nanoTime()
            val waitMs = inflight.values
              .map { case (_, t0) => timeoutMillis - (now - t0) / 1000000L }.min
            val polled = done.poll(
              math.max(1L, waitMs), java.util.concurrent.TimeUnit.MILLISECONDS)
            if (polled != null) {
              val (id, r) = polled
              inflight -= id; fill()
              return r.get // a failed future rethrows its cause, as Await did
            }
            val t = System.nanoTime()
            if (inflight.values.exists { case (fu2, t0) =>
              !fu2.isCompleted && (t - t0) / 1000000L >= timeoutMillis
            }) throw new java.util.concurrent.TimeoutException(
              s"async element exceeded $timeoutMillis ms from launch")
            // else: spurious wake at a deadline whose future just
            // completed — loop and collect it from the queue
          }
          throw new IllegalStateException("next() on empty async window")
        }
      }
    })
  }

  def sinkTo(writer: Dataset[T] => Unit): Unit = writer(ds)
}

/** Tagged union record for [[FStream.connect]] / side outputs. */
final case class CoRecord[A, B](left: Option[A], right: Option[B])

/** Two connected streams; key both sides to process them with shared
  * per-key state (the reference's ConnectedStreams → CoProcessFunction).
  */
final case class FConnectedStream[A, B](merged: Dataset[CoRecord[A, B]]) {

  def keyBy[K: Encoder](k1: A => K, k2: B => K): FKeyedConnectedStream[K, A, B] =
    FKeyedConnectedStream(merged.groupByKey {
      case CoRecord(Some(a), _) => k1(a)
      case CoRecord(_, Some(b)) => k2(b)
      case _ => throw new IllegalStateException("empty CoRecord")
    })
}

final case class FKeyedConnectedStream[K, A, B](
    grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, CoRecord[A, B]]) {

  /** CoProcessFunction analog: both elements arrive in one iterator,
    * tagged; state is shared across the two inputs (the defining
    * property of the reference's connected streams).
    */
  def process[S: Encoder, U: Encoder](
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      mode: OutputMode = OutputMode.Append())(
      f: (K, Iterator[CoRecord[A, B]], GroupState[S]) => Iterator[U]): Dataset[U] =
    grouped.flatMapGroupsWithState[S, U](mode, timeout)(f)
}

final case class FKeyedStream[K, T](grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, T]) {

  /** KeyedStream.reduce — incremental per-key fold. */
  def reduce(f: (T, T) => T): Dataset[(K, T)] = grouped.reduceGroups(f)

  def mapGroups[U: Encoder](f: (K, Iterator[T]) => U): Dataset[U] =
    grouped.mapGroups(f)

  def flatMapGroups[U: Encoder](f: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    grouped.flatMapGroups((k: K, it: Iterator[T]) => f(k, it).iterator)

  /** KeyedProcessFunction analog: per-key state + timeout timers via
    * flatMapGroupsWithState (processElement ≈ the row iterator,
    * onTimer ≈ state.hasTimedOut invocations, ValueState ≈ S).
    */
  def process[S: Encoder, U: Encoder](
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      mode: OutputMode = OutputMode.Append())(
      f: (K, Iterator[T], GroupState[S]) => Iterator[U]): Dataset[U] =
    grouped.flatMapGroupsWithState[S, U](mode, timeout)(f)

  /** KeyedStream.countWindow(n).reduce — tumbling COUNT window: every
    * n-th element of a key closes a window and emits the reduce of
    * its n elements; the partial tail folds incrementally in state
    * (the reference's count-trigger GlobalWindow,
    * WindowOperator + PurgingTrigger.of(CountTrigger.of(n))). Because
    * the reduce is a left fold, state per key is ONE accumulator plus
    * a count — O(1) per element, never n-1 buffered rows.
    */
  def countWindowReduce(n: Int)(f: (T, T) => T)(
      implicit eS: Encoder[(List[T], Long)], eU: Encoder[(K, T)]): Dataset[(K, T)] =
    grouped.flatMapGroupsWithState[(List[T], Long), (K, T)](
      OutputMode.Append(), GroupStateTimeout.NoTimeout) {
      (key: K, rows: Iterator[T], state: GroupState[(List[T], Long)]) =>
        // acc is empty-or-single: the running left-fold of the open window
        var (acc, cnt) = state.getOption.getOrElse((Nil: List[T], 0L))
        val out = scala.collection.mutable.ListBuffer.empty[(K, T)]
        rows.foreach { t =>
          acc = acc match {
            case Nil => t :: Nil
            case prev :: _ => f(prev, t) :: Nil
          }
          cnt += 1
          if (cnt == n) {
            out += (key -> acc.head)
            acc = Nil
            cnt = 0
          }
        }
        if (cnt == 0) state.remove() else state.update((acc, cnt))
        out.iterator
    }
}
