package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 A/B for VERDICT item 5: the BPE encode tokenization — nested
  * expression folds (the shipped form: one map-only projection of 8
  * chained `aggregate` HOFs over the distinct-word vocab) vs an
  * init-once Scala tokenizer (§4.5) applying the whole merge table in
  * one pass per word. Times (a) the vocab tokenization sub-plan alone
  * and (b) the full q_bpe_encode composition with each tokenizer, and
  * cross-checks the two tokenizers agree on every word. Scratch tool,
  * not part of the battery.
  */
object BpeProbe {
  /** Greedy left-to-right non-overlapping merge application — the
    * imperative twin of ChunkOps.spliceSql, applied for all merges in
    * ORDER (same semantics: one full pass per merge).
    */
  private def tokenize(w: String, merges: Seq[(String, String)]): Int = {
    var syms = w.map(_.toString).toArray
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (out.nonEmpty && out.last == l && syms(i) == r) {
            out(out.length - 1) = l + r
          } else out += syms(i)
          i += 1
        }
        syms = out.toArray
      }
    }
    syms.length
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val merges = graft.text.ChunkOps.bpeLearn(spark, docs).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    println(s"merges: $merges")

    def timed(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BPEPROBE $name median=${ts.sorted.apply(1)}%.3f min=${ts.min}%.3f")
    }

    val vocab0 = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .withColumn("sym", expr("filter(split(w, ''), x -> x <> '')"))
    // (a) shipped form: 8 chained aggregate-HOF folds
    val foldSyms = merges.foldLeft(vocab0) { case (v, (l, r)) =>
      v.withColumn("sym", graft.text.ChunkOps.spliceExpr(l, r))
    }.select(col("w"), size(col("sym")).as("n_sym"))
    timed("vocab_folds")(foldSyms)
    // (b) init-once Scala tokenizer, one pass over the merge table
    val mergesB = spark.sparkContext.broadcast(merges)
    val tokUdf = udf((w: String) => tokenize(w, mergesB.value))
    val udfSyms = vocab0.select(col("w"), tokUdf(col("w")).as("n_sym"))
    timed("vocab_udf")(udfSyms)
    // agreement check
    val disagree = foldSyms.withColumnRenamed("n_sym", "a")
      .join(udfSyms.withColumnRenamed("n_sym", "b"), Seq("w"))
      .filter(col("a") =!= col("b")).count()
    println(s"BPEPROBE disagree=$disagree")
    // full composition with each tokenizer
    def encodeWith(wordSyms: org.apache.spark.sql.DataFrame) = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(wordSyms), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
    timed("encode_folds")(encodeWith(foldSyms))
    timed("encode_udf")(encodeWith(udfSyms))
    spark.stop()
  }
}
