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

  def sinkTo(writer: Dataset[T] => Unit): Unit = writer(ds)
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
}
