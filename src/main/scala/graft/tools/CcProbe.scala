package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: phase timing for q_dedup_cc (mining vs closure). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    var t0 = System.nanoTime()
    val edges = graft.text.DedupCluster.sharedShingleEdges(docs).localCheckpoint(true)
    println(f"mine: ${(System.nanoTime()-t0)/1e9}%.2f s, edges=${edges.count()}")
    t0 = System.nanoTime()
    val labels = graft.text.DedupCluster.connectedComponents(edges)
    println(f"cc: ${(System.nanoTime()-t0)/1e9}%.2f s, nodes=${labels.count()}")
    spark.stop()
  }
}
