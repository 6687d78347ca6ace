package graft.state

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** State-processor API — the reference's flink-state-processing-api
  * (`SavepointReader.java:59` reading keyed/list/broadcast state out
  * of a savepoint, `SavepointWriter.java:62` +
  * `StateBootstrapTransformation` seeding a new savepoint), mapped
  * onto Spark's native state surfaces:
  *
  * - READ: Structured Streaming checkpoints are Spark's savepoints,
  *   and the DSv2 `statestore` / `state-metadata` sources
  *   (`org.apache.spark.sql.execution.datasources.v2.state
  *   .StateDataSource`) read them offline as DataFrames — state
  *   inspection/migration/debugging without replaying the stream,
  *   exactly SavepointReader's job. The read is a normal distributed
  *   scan (one task per state-store partition), so it scales to
  *   checkpoints from any shuffle-partition count.
  *
  * - BOOTSTRAP: Spark has no offline savepoint writer; its native
  *   equivalent is the `initialState` overload of
  *   [mapGroups|flatMapGroups]WithState — the first micro-batch
  *   merges the seeded state exactly like a job restored from a
  *   bootstrapped savepoint. [[withInitialState]] /
  *   [[flatWithInitialState]] wrap that, taking the seed as a plain
  *   Dataset[(key, state)] — which can itself come from
  *   [[keyedState]] of an old checkpoint (read old job's state →
  *   reshape → seed new job), the reference's read-modify-write
  *   savepoint migration loop.
  */
object StateProcessor {

  /** Keyed state of one operator in a checkpoint, as `(key struct,
    * value struct, partition_id)` rows — SavepointReader
    * .readKeyedState. `batchId` defaults to the last committed batch;
    * `storeName`/`operatorId` address jobs with several stateful
    * operators (the reference's operator uid).
    */
  def keyedState(spark: SparkSession, checkpointDir: String,
      operatorId: Int = 0, storeName: String = "default",
      batchId: Option[Long] = None): DataFrame = {
    val r = spark.read.format("statestore")
      .option("path", checkpointDir)
      .option("operatorId", operatorId.toString)
      .option("storeName", storeName)
    batchId.fold(r)(b => r.option("batchId", b.toString)).load()
  }

  /** Savepoint manifest — which operators hold state, their store
    * names, partition counts and batch range (the reference's
    * SavepointMetadataV2). Source: the `state-metadata` DSv2 format.
    */
  def metadata(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.format("state-metadata").load(checkpointDir)

  /** mapGroupsWithState with bootstrapped initial state
    * (SavepointWriter + StateBootstrapTransformation#keyedTransform:
    * the seeded state is what the operator sees on its first record,
    * as if restored from a written savepoint).
    */
  def withInitialState[K: Encoder, V, S: Encoder, U: Encoder](
      grouped: KeyValueGroupedDataset[K, V], seed: Dataset[(K, S)],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      fn: (K, Iterator[V], GroupState[S]) => U): Dataset[U] = {
    import seed.sparkSession.implicits._
    grouped.mapGroupsWithState(timeout,
      seed.groupByKey(_._1).mapValues(_._2))(fn)
  }

  /** flatMapGroupsWithState variant for multi-emit operators (the
    * shape every StatefulOps operator uses).
    */
  def flatWithInitialState[K: Encoder, V, S: Encoder, U: Encoder](
      grouped: KeyValueGroupedDataset[K, V], seed: Dataset[(K, S)],
      outputMode: OutputMode = OutputMode.Append,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      fn: (K, Iterator[V], GroupState[S]) => Iterator[U]): Dataset[U] = {
    import seed.sparkSession.implicits._
    grouped.flatMapGroupsWithState(outputMode, timeout,
      seed.groupByKey(_._1).mapValues(_._2))(fn)
  }
}
