package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.text.SelectionQueries
import graft.sim.SimilarityQueries

/** Round-9 selection operators: quality-classifier inference,
  * token-budget selection, winnowing fingerprints, SemDeDup.
  */
class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
  private def tokenWeight(tok: String): Long = {
    val bucket = java.lang.Integer.parseInt(md5hex("qb:" + tok).take(4), 16) % 1024
    java.lang.Integer.parseInt(md5hex("qw:" + bucket).take(4), 16).toLong - 32768L
  }

  test("quality classifier: logit equals the hand-computed hashed-model sum") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "a b")).toDF("doc_id", "text")
    val got = SelectionQueries.qualityFlags(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    val exp1 = Seq("the", "quick", "brown", "fox").map(tokenWeight).sum
    val exp2 = Seq("a", "b").map(tokenWeight).sum
    assert(got(1L) === ((4, exp1, if (exp1 > 0) 1 else 0)))
    assert(got(2L) === ((2, exp2, if (exp2 > 0) 1 else 0)))
  }

  test("quality classifier: stateless core runs unchanged on a streaming frame") {
    val rows = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "zeta eta theta iota"))
    val batch = SelectionQueries.qualityFlags(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val input = MemoryStream[(Long, String)](91, spark, None)
    val q = SelectionQueries.qualityFlags(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("quality_stream").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("quality_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("token budget: greedy top-bucket selection never exceeds the budget, next bucket would") {
    val sel = SelectionQueries.tokenBudgetSelect(spark, sfDir, budgetPermille = 250)
    val rows = sel.collect().map(r => (r.getInt(1).toLong, r.getLong(2), r.getInt(3)))
    val total = rows.map(_._1).sum
    val budget = total * 250 / 1000
    val keptToks = rows.filter(_._3 == 1).map(_._1).sum
    assert(keptToks <= budget, s"kept $keptToks over budget $budget")
    // kept set is exactly the top buckets: every kept bucket is above
    // every dropped bucket, and the best dropped bucket would overshoot
    val keptBuckets = rows.filter(_._3 == 1).map(_._2).toSet
    val dropBuckets = rows.filter(_._3 == 0).map(_._2).toSet
    assert(keptBuckets.intersect(dropBuckets).isEmpty)
    if (keptBuckets.nonEmpty && dropBuckets.nonEmpty)
      assert(keptBuckets.min > dropBuckets.max)
    if (dropBuckets.nonEmpty) {
      val nextToks = rows.filter(_._2 == dropBuckets.max).map(_._1).sum
      assert(keptToks + nextToks > budget,
        s"selection stopped early: $keptToks + $nextToks <= $budget")
    }
  }

  test("token budget: streaming twin assigns from the static snapshot, batch-equal") {
    val rows = Seq(
      (1L, "alpha beta gamma delta"), (2L, "ee ff"), (3L, "gg hh ii"),
      (4L, "jj kk ll mm nn"), (5L, "oo pp"))
    val batchDf = rows.toDF("doc_id", "text")
    val flags = SelectionQueries.budgetFlags(
      SelectionQueries.scoreBuckets(batchDf), 500)
    val expected = SelectionQueries.assignTokenBudget(batchDf, flags)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
    val input = MemoryStream[(Long, String)](92, spark, None)
    val q = SelectionQueries.assignTokenBudget(
        input.toDF().toDF("doc_id", "text"), flags)
      .writeStream.outputMode("append").format("memory")
      .queryName("budget_stream").start()
    try {
      input.addData(rows.take(3): _*)
      q.processAllAvailable()
      input.addData(rows.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("budget_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("keep-best dedup: one kept per cluster, and it attains the cluster's max quality") {
    val out = graft.text.DedupCluster.dedupKeepBest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byComp = out.groupBy(_._2)
    assert(byComp.nonEmpty && byComp.exists(_._2.size > 1), "no non-trivial cluster")
    byComp.foreach { case (comp, members) =>
      val kept = members.filter(_._4 == 1)
      assert(kept.size === 1, s"cluster $comp kept ${kept.size}")
      val best = members.map(_._3).max
      assert(kept.head._3 === best, s"cluster $comp kept non-best")
      // tie-break: lowest doc_id among max-logit members
      val tied = members.filter(_._3 == best).map(_._1).min
      assert(kept.head._1 === tied)
    }
    // every document is labeled (singletons included)
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(out.length.toLong === nDocs)
  }

  test("pipeline select: shards partition the selection, tokens within budget") {
    val out = SelectionQueries.pipelineSelect(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet.size === out.length) // one row per shard
    assert(out.forall(_._2 > 0))
    val gatedToks = SelectionQueries
      .scoreBuckets(Tables.load(spark, sfDir, "documents"))
      .filter(col("logit") > 0L)
      .agg(sum(col("n_tok"))).collect().head.getLong(0)
    val selToks = out.map(_._3).sum
    assert(selToks <= gatedToks / 2,
      s"selected $selToks tokens over the 500-permille budget of $gatedToks")
    assert(selToks > 0)
  }

  test("winnowing: shared run of w+k-1 tokens guarantees a shared fingerprint") {
    // two docs embedding the same 11-token passage at different
    // offsets, padded past the 11-token minimum with distinct noise
    val passage = (1 to 11).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"n1 n2 n3 $passage n4 n5"),
      (2L, s"m1 $passage m2 m3 m4 m5 m6")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = SelectionQueries.winnowFingerprints(spark, dir)
    // recompute selected VALUE sets per doc through the same plan's
    // intermediate (fps column) to check intersection
    val sets = Tables.load(spark, dir, "documents")
      .withColumn("l", split(col("text"), " "))
      .withColumn("hs", expr(
        """transform(sequence(0, size(l) - 4), i ->
          |  cast(conv(substring(md5(cast(
          |    concat_ws(' ', l[i], l[i+1], l[i+2], l[i+3]) as binary)),
          |    1, 8), 16, 10) as bigint))""".stripMargin))
      .withColumn("fps", expr(
        "array_distinct(transform(sequence(0, size(hs) - 8), j -> array_min(slice(hs, j + 1, 8))))"))
      .select(col("doc_id"), col("fps")).as[(Long, Seq[Long])].collect().toMap
    assert(sets(1L).toSet.intersect(sets(2L).toSet).nonEmpty,
      "shared 11-token passage yielded no shared winnowing fingerprint")
    // and the summary query agrees with the intermediate
    val row = fp.filter(col("doc_id") === 1L).collect().head
    assert(row.getAs[Int]("n_fp") === sets(1L).size)
    assert(row.getAs[Long]("fp_min") === sets(1L).min)
  }

  test("winnowing: stateless core runs unchanged on a streaming frame") {
    val rows = (1L to 6L).map(i =>
      (i, (1 to 14).map(j => s"w${i}_$j").mkString(" ")))
    val batch = SelectionQueries.winnowCore(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
    val input = MemoryStream[(Long, String)](93, spark, None)
    val q = SelectionQueries.winnowCore(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("winnow_stream").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("winnow_stream")
        .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("quality classifier: SQL scalar quality_logit matches the DataFrame operator") {
    graft.functions.FlinkFunctions.registerAll(spark)
    val docs = Seq((1L, "the quick brown fox"), (2L, "alpha beta")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ql_docs")
    val viaSql = spark.sql("SELECT doc_id, quality_logit(text) AS logit FROM ql_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = SelectionQueries.qualityFlags(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaSql === viaDf)
  }

  test("winnowing: selection density is ~2/(w+1) of gram hashes") {
    val fp = SelectionQueries.winnowFingerprints(spark, sfDir)
      .agg(sum(col("n_fp")).cast("double").as("fp"),
        sum(col("n_win") + lit(7)).cast("double").as("grams"))
      .collect().head
    val density = fp.getDouble(0) / fp.getDouble(1)
    assert(density > 0.1 && density < 0.4, s"winnow density $density outside [0.1, 0.4]")
  }

  test("semdedup: planted twins collapse into their source's component, min id canonical") {
    val out = SimilarityQueries.semDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val twinIds = out.keys.filter(_ >= 1000000000L)
    assert(twinIds.nonEmpty)
    twinIds.foreach { tid =>
      val src = tid - 1000000000L
      assert(out(tid)._1 === src, s"twin $tid not labeled by its source")
      assert(out(tid)._2 === 0, s"twin $tid wrongly canonical")
      assert(out(src)._1 === src && out(src)._2 === 1,
        s"source $src not canonical of its own cluster")
    }
    // non-planted vectors are their own singleton clusters
    val singles = out.filter { case (id, (comp, canon)) =>
      id < 1000000000L && id % 100 != 0 }
    assert(singles.forall { case (id, (comp, canon)) => comp == id && canon == 1 })
  }
}
