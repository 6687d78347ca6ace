package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{FlinkFunctions => F}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (ARRAY<FLOAT>, 64-dim) — north-star similarity-search operators.
  *
  * Scale design: the query set is small and broadcast; the corpus
  * streams through executors once (brute force), or is blocked by a
  * random-hyperplane LSH bucket first so each query only scans its
  * bucket (the IVF/LSH scale path). Cosine is a native codegen'd
  * expression (graft.functions.CosineSimilarity) — no UDF boxing on
  * the 100 TB path.
  */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Brute-force cosine top-k: every 50th vector is a query; top-5
    * neighbors (excluding self) per query by exact cosine scan.
    */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = t(s, dir, "embeddings")
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 5)
  }

  /** LSH-bucketed ANN: 8-bit random-hyperplane code blocks the
    * corpus into 256 buckets; each query is compared only against its
    * own bucket (~1/256 of the corpus at scale). Approximation:
    * recall < 1 vs the brute-force oracle — spec-tested for recall,
    * rows-only checked by the driver.
    */
  def lshAnn(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), F.lshBucket(col("embedding"), 8).as("bucket"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
    val scored = emb
      .join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        F.cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("cos"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 5)
  }

  /** Embedding-cosine near-duplicate pairs: adjacent-id pairing
    * (vec_id, vec_id+1) with exact cosine — the SQL-expressible slice
    * of embedding dedup, oracle-checked against DuckDB's
    * list_cosine_similarity.
    */
  def cosineAdjacent(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "embeddings")
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = t(s, dir, "embeddings")
      .select((col("vec_id") - 1).as("id_a"), col("vec_id").as("id_b"),
        col("embedding").as("emb_b"))
    a.join(b, Seq("id_a"))
      .select(col("id_a"), col("id_b"),
        F.cosineSimilarity(col("emb_a"), col("emb_b")).as("cos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk"     -> (cosineTopK _),
    "q_sim_lsh_ann"  -> (lshAnn _),
    "q_sim_adjacent" -> (cosineAdjacent _))

  // DuckDB's list_cosine_similarity accumulates in FLOAT; our native
  // expression upcasts each element and accumulates in DOUBLE. The
  // ~1e-7 disagreement flipped the driver's 1e-2 rounding at .xx5
  // boundaries (round-1 hash fails). Oracle therefore computes
  // dot/norms explicitly in DOUBLE via lambdas — bit-identical math.
  private val dotD =
    "list_sum(list_transform(range(1, len(%A)+1), i -> %A[i]::DOUBLE * %B[i]::DOUBLE))"
  private val normD =
    "sqrt(list_sum(list_transform(%A, x -> x::DOUBLE * x::DOUBLE)))"
  private def cosD(a: String, b: String): String =
    dotD.replace("%A", a).replace("%B", b) +
      " / (" + normD.replace("%A", a) + " * " + normD.replace("%A", b) + ")"

  val oracle: Map[String, String] = Map(
    "q_sim_topk" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q_id, vec_id, ${cosD("q_emb", "embedding")} AS cos
        |  FROM embeddings CROSS JOIN q
        |  WHERE vec_id <> q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
        |  FROM scored)
        |SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 5""".stripMargin,
    "q_sim_adjacent" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ${cosD("a.embedding", "b.embedding")} AS cos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin)
}
