package graft.tools

import org.apache.spark.sql.SparkSession

/** r17 scale probe for the TPC-DS subtree-sharing candidates: times
  * named SparkEntry queries at x16 (and optionally x64) fact volume,
  * with an optional per-run conf override — used to A/B the
  * size-gated q23 materialization (`spark.graft.q23.matRows`) at the
  * volume where the gate flips, and to decide whether q64/q75/q80
  * warrant the q2/q14 treatment (VERDICT r16 item 6). Scratch tool,
  * not part of the battery.
  *
  * Usage: runMain graft.tools.R17Probe <mult> [conf=k:v] <query...>
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toInt).getOrElse(16)
    val (confArgs, queries) = args.tail.partition(_.startsWith("conf="))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/tmp/graft_scale/x$m"
    ScaleProbe.buildScaled(spark, "/root/testdata/sf0.1", m, dir)
    val explainOnly = sys.env.get("R17_EXPLAIN").contains("1")
    queries.foreach { q =>
      val sess = spark.newSession()
      confArgs.foreach { c =>
        val Array(k, v) = c.stripPrefix("conf=").split(":", 2)
        sess.conf.set(k, v)
      }
      if (explainOnly) {
        println(s"\n========== $q (x$m${if (confArgs.nonEmpty) " " + confArgs.mkString(" ") else ""}) ==========")
        graft.SparkEntry.queries(q)(sess, dir).explain("formatted")
      } else {
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(sess, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm
        val ts = (1 to 3).map(_ => once())
        println(f"PROBE17 x$m $q%-22s median=${ts.sorted.apply(1)}%.2f min=${ts.min}%.2f" +
          (if (confArgs.nonEmpty) s" [${confArgs.mkString(" ")}]" else ""))
      }
    }
    spark.stop()
  }
}
