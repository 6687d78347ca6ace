package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * seconds.
  *
  * Methodology: each query executes fully via a noop-sink write —
  * `.count()` would let Catalyst prune every computed column and time
  * an emptier plan than the one users run. One JVM-warmup query runs
  * first (uncounted) so JIT/classloading is not billed to the first
  * query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (JIT + parquet footer cache), not reported
    execute("q1_agg")

    // two timed passes, min per query: transient host contention on a
    // single pass otherwise reads as a 3x regression
    val names = SparkEntry.queries.keys.toSeq.sorted
    val pass1 = names.map(n => n -> execute(n)).toMap
    val results = names.map { n =>
      val t2 = execute(n)
      val best = (pass1(n), t2) match {
        case (a, b) if a < 0 => b
        case (a, b) if b < 0 => a
        case (a, b) => math.min(a, b)
      }
      n -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // sbt interleaves its own logging into stdout, which broke the
    // driver's JSON parse in round 1 — also write the line to a file.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(Some("/tmp/graft_bench.json")).foreach { p =>
      val w = new java.io.PrintWriter(new java.io.File(p))
      try w.println(json) finally w.close()
    }
    println(json)
    spark.stop()
  }
}
