package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 stage probe for the dedup-CC composition: splits q_dedup_cc's
  * cost into (a) the candidate mining alone, (b) mining + the CC
  * closure, (c) the full labeled query, and counts the closure's
  * Spark jobs (the per-round scheduling floor suspects). Scratch
  * tool, not part of the battery.
  */
object CcStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def timed(name: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"CCPROBE $name median=${ts.sorted.apply(1)}%.3f min=${ts.min}%.3f")
    }
    val sc = spark.sparkContext
    timed("A_mining_only") {
      graft.text.DedupCluster.sharedShingleEdges(docs)
        .write.format("noop").mode("overwrite").save()
    }
    timed("B_mining_plus_cc") {
      val pairs = graft.text.DedupCluster.sharedShingleEdges(docs)
        .select(col("ida"), col("idb"))
      graft.text.DedupCluster.connectedComponents(pairs)
        .write.format("noop").mode("overwrite").save()
    }
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    timed("C_full_dedup_cc") {
      graft.text.DedupCluster.dedupCluster(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    println(s"CCPROBE jobs_in_C_runs=${sc.statusTracker.getJobIdsForGroup(null).length - before}")
    spark.stop()
  }
}
