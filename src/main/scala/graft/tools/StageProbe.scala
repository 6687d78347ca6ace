package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the dedup mining path (r16
  * optimization round) — times each sub-plan of sharedShingleEdges
  * with the noop sink. Not part of the battery. The shingle stream
  * comes from the REAL operator ([[graft.text.DedupCluster
  * .shingleStream]]), so the probe cannot drift from the code it
  * profiles (ADVICE r16); sfDir is an argument, defaulting to the
  * battery SF.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val n = 3
    def timed(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name ${ts.sorted.apply(1)}%.3f s (min ${ts.min}%.3f)")
    }
    val sh = graft.text.DedupCluster.shingleStream(docs, n)
    timed("A_shingle_stream")(sh)
    timed("B_shingle_stream_hashed")(sh.select(col("doc_id"), xxhash64(col("g")).as("g")))
    val grouped = sh.groupBy(col("g"))
      .agg(count(lit(1)).as("c"))
    timed("C_group_count_only")(grouped)
    val hashedGrouped = sh.select(col("doc_id"), xxhash64(col("g")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
    timed("D_group_count_hashed")(hashedGrouped)
    timed("E_full_edges")(graft.text.DedupCluster.sharedShingleEdges(docs))
    // F: collect_list-based bounded gather (built-in, codegen agg)
    val maxDf = 50
    val groupedList = sh.groupBy(col("g"))
      .agg(slice(collect_list(col("doc_id")), 1, maxDf + 1).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      .select(sort_array(col("ds")).as("ds"))
    timed("F_gather_collect_list")(groupedList)
    val pairsF = groupedList
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ds) - 2),
          |  i -> transform(slice(ds, i + 2, size(ds) - i - 1),
          |    y -> struct(ds[i] AS ida, y AS idb))))""".stripMargin)).as("p"))
      .groupBy(col("p.ida").as("ida"), col("p.idb").as("idb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
    timed("G_full_edges_via_collect_list")(pairsF)
    val groupedE = sh.groupBy(col("g"))
      .agg(slice(collect_list(col("doc_id")), 1, maxDf + 1).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      .select(sort_array(col("ds")).as("ds"))
    println("npairs=" + pairsF.agg(sum(col("shared"))).head())
    // V2: double explode + filter (no slicing/struct building)
    val v2 = groupedE
      .select(explode(col("ds")).as("ida"), col("ds"))
      .select(col("ida"), explode(col("ds")).as("idb"))
      .where(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
    timed("V2_double_explode")(v2)
    // V3: packed-long pair key, unpack after the count
    val v3 = groupedE
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ds) - 2),
          |  i -> transform(slice(ds, i + 2, size(ds) - i - 1),
          |    y -> ds[i] * 4294967296L + y)))""".stripMargin)).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
      .select((col("pk") / 4294967296L).cast("long").as("ida"),
        pmod(col("pk"), lit(4294967296L)).as("idb"), col("shared"))
    timed("V3_packed_long")(v3)
    // V4: the real candidate — bounded-UDAF gather + double-explode pairs
    val groupedU = sh.groupBy(col("g"))
      .agg(graft.text.DedupCluster.boundedCollect(maxDf + 1)(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      .select(col("ds"))
    val v4 = groupedU
      .select(explode(col("ds")).as("ida"), col("ds"))
      .select(col("ida"), explode(col("ds")).as("idb"))
      .where(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
    timed("V4_udaf_double_explode")(v4)
    spark.stop()
  }
}
