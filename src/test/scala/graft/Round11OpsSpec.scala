package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphQueries
import graft.operators.TpcdsQueries
import graft.text.SelectionQueries

/** Round-11 operators: bounded k-core peel (cascade on a hand-built
  * path+clique graph), priority sampling (Duffield–Lund–Thorup keys
  * recomputed in plain Scala), and the TPC-DS q11/q74 YoY-ratio
  * shape's decimal-exact growth cut.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("k-core peel cascades down a path and keeps the clique") {
    // path 1-2-3-4 hanging off clique {10,11,12,13}: at k=2 the path
    // peels ONE NODE PER ROUND (degree falls to 1 only after the
    // outer neighbor left), the clique's internal degree stays 3
    val clique = for {
      a <- Seq(10L, 11L, 12L, 13L); b <- Seq(10L, 11L, 12L, 13L) if a < b
    } yield (a, b)
    val e = (clique ++ Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 10L)))
      .toDF("src", "dst")
    val out = GraphQueries.kcoreOnEdges(e, k = 2, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L))
    assert(out.values.forall(_ == 3L))
    // under-budgeted peel (2 rounds) still holds a path remnant: node
    // 4 keeps degree 2 until round 4 removes its inner neighbor (node
    // 3 survives e2 but fails the final residual-degree bar)
    val part = GraphQueries.kcoreOnEdges(e, k = 2, rounds = 2)
      .collect().map(_.getLong(0)).toSet
    assert(part == Set(4L, 10L, 11L, 12L, 13L))
  }

  test("priority sample matches the hand-computed DLT sample and estimator") {
    val rows = Seq((1L, 3L), (2L, 50L), (3L, 7L), (4L, 41L), (5L, 2L),
      (6L, 19L), (7L, 11L), (8L, 29L))
    val k = 3
    // replicate the operator's key derivation in plain Scala
    def u60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ps:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val pri = rows.map { case (id, w) => (id, w, u60(id).toDouble / w.toDouble) }
      .sortBy { case (id, _, p) => (p, id) }
    val tau = pri(k)._3
    val expected = pri.take(k)
      .map { case (id, w, _) => (id, w, math.max(w.toDouble, tau)) }.toSet
    val got = SelectionQueries.prioritySampleCore(rows.toDF("doc_id", "w"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    // the estimator never reports less than the true weight
    assert(got.forall { case (_, w, est) => est >= w.toDouble })
  }

  test("exact percentile interpolates the SQL:2003 inverse-distribution way") {
    // sorted [10,20,40]: rank = f*(n-1); 0.25 -> 10+0.5*(20-10)=15,
    // 0.5 -> 20, 0.9 -> 20+0.8*(40-20)=36
    val r = Seq(10.0, 40.0, 20.0).toDF("x")
      .agg(expr("percentile(x, array(0.25D, 0.5D, 0.9D))").as("q"))
      .head().getSeq[Double](0)
    assert(r == Seq(15.0, 20.0, 36.0))
    val agg = graft.operators.AggQueries.aggPercentile(spark, sfDir).collect()
    assert(agg.length == 3) // one row per return flag
    agg.foreach { row =>
      // quartiles are three scalar columns (qty_q1..q3) since r12
      val (q1, q2, q3) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
      assert(q1 <= q2 && q2 <= q3) // quartiles ordered
    }
  }

  test("regression aggregates match the closed-form least-squares fit") {
    // points (1,2),(2,4),(3,7): slope = cov/var = 5/2, icept = mean_y - slope*mean_x
    val r = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 7.0)).toDF("x", "y")
      .agg(regr_slope(col("y"), col("x")).as("s"),
        regr_intercept(col("y"), col("x")).as("i"),
        regr_count(col("y"), col("x")).as("n"),
        corr(col("x"), col("y")).as("c"))
      .head()
    assert(math.abs(r.getDouble(0) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - (13.0 / 3.0 - 2.5 * 2.0)) < 1e-12)
    assert(r.getLong(2) == 3L)
    assert(r.getDouble(3) > 0.99) // near-collinear fixture
  }

  test("Morton interleave puts dim-a bits even, dim-b bits odd") {
    import graft.operators.LayoutQueries
    val out = Seq((15L, 0L), (0L, 15L), (255L, 255L), (0L, 0L))
      .toDF("a", "b")
      .select(LayoutQueries.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(85L, 170L, 65535L, 0L)) // 0b01010101, 0b10101010
  }

  test("z-order layout yields files narrow in BOTH dimensions") {
    val zones = graft.operators.LayoutQueries.zorderLayout(spark, sfDir).collect()
    assert(zones.length > 50)
    val (gp, gs) = {
      val li = Tables.load(spark, sfDir, "lineitem")
        .agg(min(col("l_partkey")), max(col("l_partkey")),
          min(col("l_suppkey")), max(col("l_suppkey"))).head()
      ((li.getLong(1) - li.getLong(0)).toDouble, (li.getLong(3) - li.getLong(2)).toDouble)
    }
    // every file's zone-map extent covers a small fraction of BOTH key
    // ranges on average — the property a single-column sort cannot give
    val frP = zones.map(r => (r.getLong(3) - r.getLong(2)) / gp).sum / zones.length
    val frS = zones.map(r => (r.getLong(5) - r.getLong(4)) / gs).sum / zones.length
    assert(frP < 0.2, s"partkey extent fraction $frP")
    assert(frS < 0.2, s"suppkey extent fraction $frS")
    // and the files tile the whole table
    assert(zones.map(_.getLong(1)).sum ==
      Tables.load(spark, sfDir, "lineitem").count())
  }

  test("per-dimension standardization centers and scales every dimension") {
    val rows = graft.sim.SimilarityQueries.embedStandardize(spark, sfDir)
      .collect().map(_.getString(1).split(",").map(_.toLong / 1000.0))
    val nDims = rows.head.length
    assert(rows.forall(_.length == nDims))
    // each dimension's z-scores: mean ~0 (floor bias pulls slightly
    // low), std ~1
    (0 until nDims by 17).foreach { d =>
      val zs = rows.map(_(d))
      val mu = zs.sum / zs.length
      val sd = math.sqrt(zs.map(z => (z - mu) * (z - mu)).sum / zs.length)
      assert(math.abs(mu) < 0.05, s"dim $d mean $mu")
      assert(math.abs(sd - 1.0) < 0.05, s"dim $d std $sd")
    }
  }

  test("Misra-Gries keeps every local heavyweight at bounded width") {
    import graft.text.FrequencyOps
    // 1000 'hot' + 600 distinct cold tokens through a width-3 summary:
    // eviction rounds fire constantly, yet hot (freq > n/3) must survive
    val stream = Seq.fill(1000)("hot") ++ (1 to 600).map(i => s"cold$i")
    val out = FrequencyOps.misraGries(stream.iterator, k = 3).toSeq
    val survivors = out.filter(_._1 != null)
    assert(survivors.size <= 3)
    assert(survivors.exists(_._1 == "hot"))
    assert(out.find(_._1 == null).get._3 == 1600L) // totals sentinel
    // MG lower bound: survivor count undercounts by at most n/k
    val hotLb = survivors.find(_._1 == "hot").get._2
    assert(hotLb >= 1000L - 1600L / 3)
  }

  test("heavy hitters equals brute force under adversarial partitioning") {
    import graft.text.FrequencyOps
    // tokens shuffled across 7 partitions; the pigeonhole bound must
    // hold whatever slice of each heavy token a partition sees
    val toks = (Seq.fill(300)("aaa") ++ Seq.fill(120)("bbb") ++
      (1 to 500).map(i => s"tail$i") ++ Seq.fill(80)("ccc")).toDS()
      .repartition(7)
    val got = FrequencyOps.heavyHittersOn(toks, phi = 10, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = 300 + 120 + 500 + 80
    val brute = Map("aaa" -> 300L, "bbb" -> 120L, "ccc" -> 80L)
      .filter { case (_, c) => c * 10 > n } // 1000/10=100: aaa, bbb
    assert(got == brute)
  }

  test("entropy expressions match closed-form values on both code paths") {
    import graft.text.FrequencyOps
    val rows = Seq(
      (1L, "aab"),            // ASCII path: H = log2(3) - (2 log2 2)/3
      (2L, "abcd"),           // uniform: exactly 2.0 bits
      (3L, "x x x x"),        // tokens all equal -> tok_h = 0
      (4L, "éaé"),  // non-ASCII path, 2-cp alphabet
      (5L, "𝄞𝄞")) // surrogate pair = ONE code point
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        graft.functions.FlinkFunctions.charEntropy(col("text")).as("ch"),
        graft.functions.FlinkFunctions.tokenEntropy(col("text")).as("th"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val h3 = math.log(3.0) / math.log(2.0) - 2.0 / 3.0
    assert(math.abs(got(1L)._1 - h3) < 1e-12)
    assert(got(2L)._1 == 2.0)
    assert(got(3L)._2 == 0.0)
    assert(math.abs(got(4L)._1 -
      (math.log(3.0) / math.log(2.0) - 2.0 / 3.0)) < 1e-12)
    assert(got(5L)._1 == 0.0) // two copies of one code point
    // the corpus projection is map-only: no exchange in the plan
    val plan = FrequencyOps.textEntropy(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("entropy projection runs unchanged on a stream (batch == stream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.FrequencyOps
    val docs = Seq((1L, "aab"), (2L, "a b a b c"))
    val expected = FrequencyOps.textEntropyOn(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, String)](97, spark, None)
    val q = FrequencyOps.textEntropyOn(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("entropy_stream").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      assert(spark.table("entropy_stream").collect().map(_.toSeq).toSet == expected)
    } finally q.stop()
  }

  test("PQ with nVec <= k and no Lloyd rounds degenerates to exact brute force") {
    import graft.sim.PqAnn
    // 12 vectors, 8 dims, m=2: with k=16 >= nVec and iters=0 the
    // codebook IS the corpus subvectors, every code hits d2=0, and
    // ADC distances equal exact distances — PQ == brute force
    val vecs = (0L until 12L).map(i =>
      (i, (0 until 8).map(j => ((i * 7 + j * 13) % 19) - 9L)))
    val q = vecs.toDF("vec_id", "q")
    val out = PqAnn.pqAnnOn(q, m = 2, k = 16, iters = 0,
        nq = 2, topK = 3, shortR = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val brute = (0L until 2L).flatMap { qid =>
      val qv = vecs(qid.toInt)._2
      vecs.filter(_._1 != qid)
        .map { case (vid, v) =>
          (vid, v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (vid, d) => (d, vid) }
        .take(3).zipWithIndex
        .map { case ((vid, d), i) => (qid, vid, d, i + 1) }
    }
    assert(out.sortBy(r => (r._1, r._4)).toSeq == brute)
  }

  test("PQ shortlist plus exact rerank reaches high recall on the gate corpus") {
    import graft.sim.PqAnn
    val out = PqAnn.pqAnn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 50) // 5 queries x top-10
    // brute force over the same quantized vectors, in plain Scala
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000.0d) as bigint))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq)
    val byId = vecs.toMap
    val qids = vecs.map(_._1).sorted.take(5)
    def d2(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val brute = qids.flatMap { qid =>
      vecs.filter(_._1 != qid)
        .map { case (vid, v) => (qid, vid, d2(byId(qid), v)) }
        .sortBy { case (_, vid, d) => (d, vid) }.take(10)
    }.toSet
    // every reported distance is EXACT (the rerank contract) ...
    out.foreach { case (qid, vid, d) => assert(d == d2(byId(qid), byId(vid))) }
    // ... and the 4-bit-code shortlist keeps ~94% of the true top-10
    val recall = out.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.85, s"recall@10 $recall")
  }

  test("q88-shape multiband counts run as ONE scan of conditional aggregates") {
    val df = TpcdsQueries.timeBands(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // eight bands, one fact scan, no join — the rewrite that beats
    // q88's literal eight-subquery cross join
    assert(plan.split("Scan parquet").length - 1 == 1, plan)
    assert(!plan.contains("Join"), plan)
    val row = df.head()
    assert((0 until 8).map(row.getLong).sum > 0)
  }

  test("YoY ratio joins only both-year customers and cuts on exact decimal compare") {
    val out = TpcdsQueries.yoyRatio(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every surviving row grew: ratio > 1 and spend_1997 > spend_1996
    assert(rows.forall(r => r.getDouble(3) > 1.0 && r.getDouble(2) > r.getDouble(1)))
    // the cut happens on the decimal sums: recompute one customer's
    // years from the raw table and confirm membership agrees
    val byYear = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy(col("o_custkey"), col("yr")).agg(sum(col("p")).as("spend"))
      .filter(col("yr").isin(1996, 1997))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val grew = byYear.collect {
      case ((ck, 1996), s96) if byYear.get((ck, 1997)).exists(_.compareTo(s96) > 0) => ck
    }.toSet
    assert(rows.map(_.getLong(0)).toSet == grew)
  }

  test("clustering coefficient: triangle corners score 1, the bridge scores 1/3") {
    // triangle {1,2,3} plus pendant 3-4: deg(3)=3, others cap at the
    // convention (deg<2 excluded -> node 4 absent)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = GraphQueries.clusteringOnEdges(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      1L -> (2L, 1L, 1.0), 2L -> (2L, 1L, 1.0), 3L -> (3L, 1L, 1.0 / 3)))
  }

  test("profiler melts one aggregate row into exact per-column censuses") {
    val df = Seq(
      (Option(1), "x"), (Option.empty[Int], "x"), (Option(2), "y"))
      .toDF("a", "b")
    val got = graft.operators.Profiler.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map("a" -> (3L, 1L, 2L), "b" -> (3L, 0L, 2L)))
  }

  test("table checksum: order-independent, JVM-recomputable, perturbation-localized") {
    def mkOrders(rows: Seq[(Long, Long, String, String, Long)]) =
      rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "us")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"),
          timestamp_micros(col("us")).as("o_orderdate"))
    val base = Seq(
      (1L, 7L, "O", "1-URGENT", 1000000L),
      (2L, 8L, "F", "5-LOW", 2000000L),
      (33L, 9L, "O", "2-HIGH", 3000000L)) // 33 % 32 = shard 1 with key 33
    val a = graft.operators.Profiler.checksumOn(mkOrders(base), shards = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b = graft.operators.Profiler.checksumOn(
        mkOrders(base).repartition(7), shards = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b) // commutative fold: partitioning cannot matter
    // JVM recompute of shard 2's single row (key 2)
    def rowHash(k: Long, c: Long, st: String, pr: String, us: Long): Long = {
      val s = s"$k|$c|$st|$pr|$us"
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(x => f"$x%02x").mkString.take(15), 16)
    }
    assert(a(2L) == (1L, rowHash(2L, 8L, "F", "5-LOW", 2000000L)))
    // perturb the shard-1 rows only: shards 1 changes, 2 doesn't
    val pert = base.map { case r @ (k, c, st, pr, us) =>
      if (k % 32 == 1) (k, c + 1, st, pr, us) else r
    }
    val p = graft.operators.Profiler.checksumOn(mkOrders(pert), shards = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p(2L) == a(2L) && p(1L) != a(1L))
  }

  test("approx profiler: Expand-free single pass, distincts inside the HLL band") {
    val orders = Tables.load(spark, sfDir, "orders")
    val approx = graft.operators.Profiler.profileApprox(orders)
    // the exactness cost (multi-distinct Expand) must be GONE
    val plan = approx.queryExecution.executedPlan.toString()
    assert(!plan.contains("Expand"), s"approx profile still expands:\n${plan.take(1500)}")
    val exactPlan = graft.operators.Profiler.profile(orders)
      .queryExecution.executedPlan.toString()
    assert(exactPlan.contains("Expand")) // and the exact one documents why
    val exact = graft.operators.Profiler.profile(orders).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.operators.Profiler.profileApprox(orders).collect().foreach { r =>
      val (c, est) = (r.getString(0), r.getLong(3))
      assert(math.abs(est - exact(c)) <= math.max(2.0, 0.15 * exact(c)), c)
    }
  }

  test("value histogram: bins derive from per-type min/max with a clamped top edge") {
    val ev = Seq(
      (1L, "a", 0.0), (2L, "a", 5.0), (3L, "a", 10.0),
      (4L, "b", 1.0), (5L, "b", 1.0), (6L, "b", 3.0))
      .toDF("event_id", "event_type", "value")
    val got = graft.operators.Profiler.histogramOn(ev, bins = 20).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // type a: lo 0 hi 10 -> bins 0, 10, clamp(20)->19
    // type b: lo 1 hi 3  -> bins 0 (x2), clamp(20)->19
    assert(got == Map(
      ("a", 0) -> 1L, ("a", 10) -> 1L, ("a", 19) -> 1L,
      ("b", 0) -> 2L, ("b", 19) -> 1L))
  }

  test("temperature mixing flattens shares: alpha=0.3 upsamples the small source") {
    val docs = Seq(
      (1L, "a b c d e f g h", "big"),   // 8 tokens
      (2L, "z", "small"))               // 1 token
      .toDF("doc_id", "text", "source")
    val got = SelectionQueries.temperatureMixOn(docs, alpha = 0.3).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val pBig = 8.0 / 9; val pSmall = 1.0 / 9
    val z = math.pow(pBig, 0.3) + math.pow(pSmall, 0.3)
    val (qBig, qSmall) = (math.pow(pBig, 0.3) / z, math.pow(pSmall, 0.3) / z)
    assert(got("big")._1 == 8L && got("small")._1 == 1L)
    assert(math.abs(got("big")._3 - qBig) < 1e-12)
    assert(math.abs(got("small")._3 - qSmall) < 1e-12)
    assert(got("small")._4 > 1.0 && got("big")._4 < 1.0) // flattening direction
    assert(math.abs(got("small")._4 - qSmall / pSmall) < 1e-9)
  }

  test("recursive-CTE BFS: hop bound prunes, min(d) collapses cycle revisits") {
    // path 1-2-3-4 plus cycle edge 1-3: dists 1:0, 2:1, 3:1, 4:2 at 2 hops
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("a", "b")
    val got = GraphQueries.sqlRecursiveBfsOn(spark, e, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("HITS: two mutual-reinforcement rounds match the hand-unrolled scores") {
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    // h0=1: a1 = {10:2, 11:1}; h1 = {1:3, 2:2}
    // a2 = {10:5, 11:3}; h2 = {1:8, 2:5} -> L1-normalized per side
    val got = GraphQueries.hitsOnEdges(e, iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expect = Map(
      ("hub", 1L) -> 8.0 / 13, ("hub", 2L) -> 5.0 / 13,
      ("auth", 10L) -> 5.0 / 8, ("auth", 11L) -> 3.0 / 8)
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12, k) }
  }
}
