package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic k-means (Lloyd's) as pure dataflow — the clustering
  * operator itself, engine-native (the reference ecosystem ships this
  * as a library algorithm: Flink ML's KMeans iteration; Spark's MLlib
  * version backs [[SimilarityQueries.ivfAnn]]'s index). This variant
  * exists because library k-means is not REPRODUCIBLE across engines
  * (RNG init, float accumulation order), which makes it untestable
  * against an oracle and unusable where a pipeline must re-derive
  * identical clusters (SemDeDup's clustering stage, IVF rebuilds,
  * curriculum grouping). Three choices make it exact:
  *
  *  - inputs quantize to integers (floor(x·1000) — exact in double,
  *    the q_embed_rp discipline), so every distance is an exact
  *    BIGINT and every comparison is engine-identical;
  *  - init is the k lowest-id vectors (no RNG);
  *  - centroid updates use integer floor-division means with a
  *    non-negativity shift, identical under Spark's `div` and
  *    DuckDB's `//`; ties in assignment break to the lowest cell id
  *    (lexicographic struct min).
  *
  * Scale shape per iteration — the canonical distributed k-means:
  * assignment is MAP-ONLY (k·d centroid literals ride in the plan,
  * the argmin is one codegen'd expression per row — no join, no
  * shuffle); the update aggregates (cell, dim) sums with map-side
  * partials, so the only exchange carries k·d rows per partition,
  * never the corpus. The k·d model state collected per round is the
  * bounded iterate-broadcast loop every distributed k-means pays
  * (same class as DedupCluster's per-round convergence scalar), not
  * a data collect.
  */
object KMeansDataflow {

  /** Non-negativity shift for integer means: must exceed any
    * |quantized component| (|x|·1000 for unit-scale embeddings).
    */
  private val Off = 1L << 20

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000.0d) as bigint))")
        .as("q"))

  /** Exact squared L2 distance between the `q` column and a centroid
    * literal, as one codegen'd fold.
    */
  private def d2(cent: Seq[Long]): Column =
    expr(s"""aggregate(zip_with(q, array(${cent.mkString("L, ")}L),
            |  (x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)""".stripMargin)

  /** Map-only assignment: lexicographic min over (d2, cell) structs —
    * nearest centroid, ties to the lowest cell id.
    */
  private def assign(q: DataFrame, cents: Seq[Seq[Long]]): DataFrame =
    q.withColumn("m", array_min(array(cents.zipWithIndex.map { case (c, j) =>
        struct(d2(c).as("d"), lit(j).as("c")) }: _*)))
      .select(col("vec_id"), col("q"),
        col("m.c").as("cell"), col("m.d").as("d2"))

  /** Run `iters` Lloyd iterations; returns the final assignment
    * frame (vec_id, q, cell, d2) plus the fitted centroids — the
    * model half feeds [[SimilarityQueries.ivfAnnDeterministic]].
    */
  def fit(s: SparkSession, dir: String,
      k: Int = 8, iters: Int = 3): (DataFrame, Seq[Seq[Long]]) = {
    val q = quantized(s, dir)
    // deterministic init: the k lowest-id vectors, cell = id rank
    var cents: Seq[Seq[Long]] = q.orderBy(col("vec_id")).limit(k).collect()
      .map(_.getSeq[Long](1).toIndexedSeq).toSeq
    for (_ <- 1 to iters) {
      // (cell, dim) integer means; shuffle carries k·d partial rows
      val sums = assign(q, cents)
        .select(col("cell"), posexplode(col("q")).as(Seq("d", "v")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (Math.floorDiv(r.getLong(2) + Off * r.getLong(3), r.getLong(3)) - Off))
        .toMap
      cents = cents.zipWithIndex.map { case (old, cell) =>
        // empty cell keeps its previous centroid
        old.indices.map(d => sums.getOrElse((cell, d), old(d)))
      }
    }
    (assign(q, cents), cents)
  }

  /** The `queries()` entry: final per-vector (vec_id, cell, d2). */
  def kmeansAssign(s: SparkSession, dir: String,
      k: Int = 8, iters: Int = 3): DataFrame =
    fit(s, dir, k, iters)._1.select(col("vec_id"), col("cell"), col("d2"))

  /** Exact squared L2 between the quantized column `q` and each
    * centroid, exposed for the IVF probe (cell ranked by distance,
    * ties to the lowest cell id).
    */
  def cellRanking(cents: Seq[Seq[Long]]): Column =
    array_sort(array(cents.zipWithIndex.map { case (c, j) =>
      struct(d2(c).as("d"), lit(j).as("c")) }: _*))

  /** DuckDB oracle CTE chain: the same quantization, init,
    * iterations and integer means, unrolled (one assignment + one
    * update CTE per iteration), ending at `afin` (final assignment)
    * with the fitted centroids still addressable as [[finalCentCte]]
    * — the prefix the deterministic-IVF oracle extends.
    */
  def oracleCtes(k: Int = 8, iters: Int = 3): String = {
    val header =
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS q
         |  FROM embeddings),
         |dims AS (
         |  SELECT vec_id, i AS d, q[i] AS v
         |  FROM (SELECT vec_id, q, unnest(range(1, len(q) + 1)) AS i FROM q)),
         |c0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, q
         |  FROM (SELECT vec_id, q FROM q ORDER BY vec_id LIMIT $k))""".stripMargin
    def assignCte(a: String, c: String) =
      s"""$a AS (
         |  SELECT vec_id, cell, d2 FROM (
         |    SELECT q.vec_id, c.cell,
         |      list_sum(list_transform(range(1, len(q.q) + 1),
         |        i -> (q.q[i] - c.q[i]) * (q.q[i] - c.q[i])))::BIGINT AS d2,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        list_sum(list_transform(range(1, len(q.q) + 1),
         |          i -> (q.q[i] - c.q[i]) * (q.q[i] - c.q[i]))), c.cell) AS rn
         |    FROM q, $c c)
         |  WHERE rn = 1)""".stripMargin
    def updateCte(cNew: String, a: String, cPrev: String) =
      s"""$cNew AS (
         |  SELECT $cPrev.cell, coalesce(u.q, $cPrev.q) AS q
         |  FROM $cPrev LEFT JOIN (
         |    SELECT cell, list(m ORDER BY d) AS q FROM (
         |      SELECT $a.cell, dims.d,
         |        ((sum(dims.v) + ${Off} * count(*)) // count(*)) - ${Off} AS m
         |      FROM $a JOIN dims USING (vec_id)
         |      GROUP BY $a.cell, dims.d)
         |    GROUP BY cell) u USING (cell))""".stripMargin
    val body = (1 to iters).map { i =>
      assignCte(s"a$i", s"c${i - 1}") + ",\n" + updateCte(s"c$i", s"a$i", s"c${i - 1}")
    }.mkString(",\n")
    val fin = assignCte("afin", s"c$iters")
    s"$header,\n$body,\n$fin"
  }

  /** Name of the final-centroid CTE inside [[oracleCtes]]. */
  def finalCentCte(iters: Int = 3): String = s"c$iters"

  def oracleSql(k: Int = 8, iters: Int = 3): String =
    s"${oracleCtes(k, iters)}\nSELECT vec_id, cell, d2 FROM afin"
}
