package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert sink materialization — the reference's
  * SinkUpsertMaterializer.java (225 LoC) / upsert-kafka sink
  * semantics on Structured Streaming's foreachBatch: each micro-batch
  * merges into the keyed current-state table, keeping the latest row
  * per key.
  *
  * The merge itself is distributed (union + keep-last window, one
  * shuffle on the key); the target swap is an atomic directory
  * rename. At warehouse scale the same merge runs against a
  * table format's MERGE INTO — the operator shape is identical.
  */
object UpsertSink {

  /** writeStream.foreachBatch(UpsertSink.merge(keys, orderCol, dir)) */
  def merge(keys: Seq[String], orderCol: String, targetDir: String)
      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val target = new java.io.File(targetDir)
    val current =
      if (target.exists()) spark.read.parquet(targetDir).unionByName(batch.toDF())
      else batch.toDF()
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc)
    val merged = current
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val tmp = targetDir + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    // atomic swap
    val tmpDir = new java.io.File(tmp)
    if (target.exists()) {
      val old = new java.io.File(targetDir + ".old")
      deleteRecursively(old)
      target.renameTo(old)
      tmpDir.renameTo(target)
      deleteRecursively(old)
    } else tmpDir.renameTo(target)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) f.delete()
  }
}
