package graft.tools

import org.apache.spark.sql.SparkSession

/** r17 A/B for VERDICT item 7: the stream-harness state-store floor.
  * Times the 8 stream-to-completion rows under (a) the default
  * HDFS-backed state store and (b) RocksDB, plus (c) an unsafe-row
  * format check is not applicable locally — the candidates are the
  * provider class and the commit-log/min-batches knobs. Scratch tool,
  * not part of the battery.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    root.sparkContext.setLogLevel("ERROR")
    val streams = Seq("q_stream_q3", "q_stream_q93", "q_stream_sessionize",
      "q_stream_cep", "q_stream_topn", "q_stream_funnel",
      "q_stream_asof", "q_stream_interval")
      .filter(graft.SparkEntry.queries.contains)
    val variants = Seq(
      "default" -> Map.empty[String, String],
      "rocksdb" -> Map("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "asynclog" -> Map(
        "spark.sql.streaming.async.log.enabled" -> "true"))
    variants.foreach { case (label, confs) =>
      var total = 0.0
      streams.foreach { q =>
        val s = root.newSession()
        graft.plans.GraftExtensions.install(s)
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        graft.Tables.registerAll(s, sfDir)
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(s, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm
        val ts = (1 to 3).map(_ => once())
        val med = ts.sorted.apply(1)
        total += med
        println(f"STREAMPROBE $label $q%-22s median=$med%.2f")
      }
      println(f"STREAMPROBE $label TOTAL=$total%.2f")
    }
    root.stop()
  }
}
