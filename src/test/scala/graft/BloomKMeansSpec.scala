package graft

import org.apache.spark.sql.functions._
import graft.text.{BloomDedup, TextQueries}
import graft.sim.KMeansDataflow

/** Round-9: Bloom-prefiltered incremental dedup + deterministic
  * dataflow k-means.
  */
class BloomKMeansSpec extends SparkSpec {
  import spark.implicits._

  test("bloom: zero false negatives — every stored key probes maybe") {
    val keys = (1 to 2000).map(i => s"key-$i").toDF("h")
    val filter = BloomDedup.build(keys)
    val probed = BloomDedup.probe(
      keys.withColumn("doc_id", monotonically_increasing_id()), filter)
    assert(probed.filter(col("maybe_prior") === 0).count() === 0)
  }

  test("bloom: false-positive rate on fresh keys stays under 1%") {
    val stored = (1 to 2000).map(i => s"key-$i").toDF("h")
    val fresh = (1 to 5000).map(i => s"other-$i").toDF("h")
    val filter = BloomDedup.build(stored)
    val fp = BloomDedup.probe(
        fresh.withColumn("doc_id", monotonically_increasing_id()), filter)
      .filter(col("maybe_prior") === 1).count()
    // n=2000, k=5, m=2^20 → expected fp ≈ (nk/m)^k ≈ 8e-11; 1% is a
    // generous determinism-safe ceiling
    assert(fp < 50, s"bloom fp count $fp out of 5000")
  }

  test("bloom-prefiltered incremental dedup equals the plain operator") {
    val plain = TextQueries.dedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
    val bloom = BloomDedup.dedupIncrementalBloom(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
    assert(bloom === plain)
  }

  test("kmeans: separates two planted clusters, assignment deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("kmeans").toString
    // two tight 4-d blobs far apart; vec_ids interleave the blobs so
    // the lowest-id init picks one seed from each
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      (i.toLong, Seq(base + 0.001f * i, base, base - 0.001f * i, base))
    }
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = KMeansDataflow.kmeansAssign(spark, dir, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cellsLow = (0 until 40 by 2).map(i => out(i.toLong)).toSet
    val cellsHigh = (1 until 40 by 2).map(i => out(i.toLong)).toSet
    assert(cellsLow.size === 1 && cellsHigh.size === 1 && cellsLow != cellsHigh,
      s"blobs not separated: low=$cellsLow high=$cellsHigh")
    // vec_id 0 (lowest id, first blob) seeds cell 0; vec_id 1 cell 1
    assert(out(0L) === 0 && out(1L) === 1)
    val again = KMeansDataflow.kmeansAssign(spark, dir, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again === out)
  }

  test("ivf deterministic: nProbe = nCells degenerates to exact brute-force top-k") {
    import graft.sim.SimilarityQueries
    import graft.functions.{FlinkFunctions => F}
    val ann = SimilarityQueries.ivfAnnDeterministic(spark, sfDir,
        nCells = 4, nProbe = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val brute = emb.crossJoin(q).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(ann === brute)
  }

  test("kmeans: equidistant point breaks ties to the lowest cell id") {
    val dir = java.nio.file.Files.createTempDirectory("kmeans_tie").toString
    // centroids stay at exactly (0,0) and (4,0) (each blob is a
    // single repeated point); (2, 0) is exactly equidistant
    val rows = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(4.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f)), (3L, Seq(4.0f, 0.0f)),
      (4L, Seq(2.0f, 0.0f)))
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = KMeansDataflow.kmeansAssign(spark, dir, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(4L) === 0, s"tie not broken to lowest cell: ${out(4L)}")
  }
}
