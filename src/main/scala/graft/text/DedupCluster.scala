package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate CLUSTERING: pair mining gives edges, but a corpus
  * dedup has to turn pairs into clusters and keep one canonical doc
  * per cluster — A~B and B~C must collapse to one kept doc even when
  * A~C was never mined. That's connected components over the
  * candidate-pair graph (the reference's world has no CC operator;
  * Flink's Gelly library ships it as
  * flink-libraries/flink-gelly/src/main/java/org/apache/flink/graph/
  * library/ConnectedComponents.java:51 — iterative min-id
  * propagation; here it's re-expressed as DataFrame joins).
  *
  * Algorithm: hash-min label propagation with pointer jumping.
  * Each round every node takes the min label over itself and its
  * neighbors — the "itself" half rides on self-loop edges added once
  * up front, so the whole step is ONE join edges→labels + groupBy
  * dst min (no separate merge join) — then compresses paths by
  * re-resolving its label through the label table
  * (comp := comp(comp)). Plain hash-min needs O(diameter) rounds;
  * the jumping step halves label-chain depth each round, giving
  * O(log d) — the Kiveris et al. (2014) "Connected Components in
  * MapReduce" two-phase scheme's behavior with simpler dataflow.
  * Convergence detection is a single sum(comp) aggregate per round:
  * labels only ever decrease, so an unchanged sum means a fixed
  * point (no join-and-compare pass needed).
  *
  * Scale shape: each round is two shuffles (join on src, groupBy
  * dst) plus one broadcast-sized aggregate; per-round state is one
  * (id, comp) row per node, persisted and replaced — at 1000
  * executors the edge table shuffles on src/dst exactly like any
  * equi-join, and near-dup graphs have tiny diameters (clusters are
  * cliques-ish), so 3-5 rounds is typical.
  */
object DedupCluster {

  /** Bounded doc-list collector: gathers up to `cap` values per
    * group and then stops. Any shingle whose list hits `cap` has
    * document frequency >= cap and gets dropped wholesale, so (a)
    * no aggregation buffer ever holds more than `cap` ids — a
    * stop-shingle appearing in 10^8 docs costs the same memory as
    * one appearing in 51 — and (b) truncation never corrupts a kept
    * group (a group below `cap` was collected exactly). Which ids
    * survive inside an over-cap buffer is arbitrary; it doesn't
    * matter, the group is discarded.
    */
  private[graft] def boundedCollect(cap: Int) = udaf(
    new org.apache.spark.sql.expressions.Aggregator[
        Long, scala.collection.mutable.ArrayBuffer[Long], Array[Long]] {
      def zero = scala.collection.mutable.ArrayBuffer.empty[Long]
      def reduce(b: scala.collection.mutable.ArrayBuffer[Long], a: Long) = {
        if (b.length < cap) b += a; b
      }
      def merge(b1: scala.collection.mutable.ArrayBuffer[Long],
                b2: scala.collection.mutable.ArrayBuffer[Long]) = {
        val need = cap - b1.length
        if (need > 0) b1 ++= b2.take(need); b1
      }
      def finish(b: scala.collection.mutable.ArrayBuffer[Long]) = b.toArray
      def bufferEncoder =
        org.apache.spark.sql.Encoders.kryo[scala.collection.mutable.ArrayBuffer[Long]]
      def outputEncoder =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    })

  /** Candidate edges: docs sharing >= `minShared` distinct word
    * n-grams, with shingles appearing in more than `maxDf` docs
    * dropped (the standard stop-shingle cut). Shape: per-doc
    * distinct shingles are computed map-side (array_distinct before
    * the explode — no dedup shuffle), then ONE groupBy(shingle)
    * gathers each rare shingle's doc list with bounded memory, the
    * i<j pairs explode from the sorted list (<= maxDf²/2 per
    * shingle), and one final groupBy counts shared shingles per
    * pair. Two shuffles of the shingle stream total — the earlier
    * distinct + df-join + self-join shape paid four — and candidate
    * volume stays <= |shingles|·maxDf²/2, never corpus-quadratic.
    */
  /** The per-doc distinct word-n-gram stream — factored out so the
    * stage profiler ([[graft.tools.StageProbe]]) times the REAL
    * sub-plan instead of a drifting copy (ADVICE r16).
    */
  private[graft] def shingleStream(docs: DataFrame, n: Int): DataFrame =
    docs
      .withColumn("l", split(col("text"), " "))
      .filter(size(col("l")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"""transform(sequence(0, size(l) - $n),
           |  i -> concat_ws(' ', ${(0 until n).map(j => s"l[i+$j]").mkString(", ")}))"""
          .stripMargin))).as("g"))

  def sharedShingleEdges(docs: DataFrame, n: Int = 3, maxDf: Int = 50,
                         minShared: Int = 3): DataFrame = {
    val sh = shingleStream(docs, n)
    val grouped = sh.groupBy(col("g"))
      .agg(boundedCollect(maxDf + 1)(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
      .select(col("ds"))
    // i<j pairs via two chained generators + an a<b filter: the
    // earlier sorted-list slice comprehension (flatten ∘ transform ∘
    // slice ∘ struct) allocated O(k²) subarray copies and struct
    // arrays PER GROUP, and that construction — not pair volume —
    // dominated the mining (r16 stage probe: pair stage 1.6 s of the
    // 2.6 s total; this form cut the operator to 1.67 s, 0.65×).
    // Generating k² rows and filtering half is cheaper than building
    // k²/2 sliced structs, and the a<b cut canonicalizes pairs
    // without the sort_array the slice form needed. Per-group work
    // stays O(maxDf²) either way — the scale cap is unchanged.
    grouped
      .select(explode(col("ds")).as("ida"), col("ds"))
      .select(col("ida"), explode(col("ds")).as("idb"))
      .where(col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Connected components of an undirected pair graph.
    * @param pairs (ida, idb) candidate pairs, one direction
    * @param checkpointDir when set, per-round state snapshots use
    *   RELIABLE checkpoints into this directory instead of
    *   executor-local storage — on a multi-executor cluster a lost
    *   executor then re-reads its slice of the label table from
    *   shared storage instead of failing the job. Local mode and
    *   tests run fine without it.
    * @return (id, comp) — comp is the min id reachable from id
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
                          checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    // Every round references the previous label table twice
    // (neighbor-min join, the jump LUT) — without
    // lineage truncation the logical plan doubles per round and the
    // driver dies analyzing it long before the data is big.
    // localCheckpoint materializes each round's ~|V| rows and cuts
    // the plan back to a leaf; on a multi-executor cluster swap in
    // reliable checkpoint(dir) so a lost executor can't drop a slice
    // of the label table mid-computation.
    var edges = snap(pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .union(pairs.select(col("idb").as("src"), col("ida").as("dst"))))
    // Size the loop's parallelism from the measured edge count (the
    // checkpoint already materialized it, so count() is ~free): each
    // round is 4 tiny jobs, and running a 200-edge graph on the
    // session's 32 shuffle partitions spends 10x more time scheduling
    // empty tasks than computing. ~500k edges per partition keeps a
    // web-scale graph at the session default while a small one
    // collapses to a couple of tasks.
    val spark = pairs.sparkSession
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.max(1, math.min(sessionParts, (edges.count() / 500000L).toInt + 1))
    // Run the loop's shuffles at the graph's own parallelism, not the
    // session's: every round is three shuffles over |V|+|E| rows, and
    // a 10k-edge graph scheduled across 32 partitions spends its
    // wall-clock on empty tasks. At web scale parts == sessionParts
    // and this is a no-op. Restored in finally — the session is
    // shared with whatever query runs next.
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      var labels = snap(edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("comp")))
      // Empty graph → nothing to propagate; skip the loop entirely
      // (replica corpora can stop-shingle every edge away — the cap
      // doing its job shouldn't still pay iteration scheduling).
      if (labels.isEmpty) { edges.unpersist(); return labels }
      // Self-loops fold the "least(own, neighbor-min)" merge INTO the
      // neighbor-min aggregate: with (id, id) edges present, one
      // join + groupBy-min computes the stepped label directly — the
      // separate labels left-join the first formulation paid per
      // round is gone (a join and its exchange fewer per round).
      edges = snap(edges.union(labels.select(col("id").as("src"), col("id").as("dst")))
        .repartition(parts, col("src")))
      var lastSum = labels.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
      var iter = 0
      var converged = false
      while (iter < maxIter && !converged) {
        val stepped = edges.join(labels, edges("src") === labels("id"))
          .groupBy(col("dst")).agg(min(col("comp")).as("comp"))
          .select(col("dst").as("id"), col("comp"))
        // pointer jump: follow the label one hop (comp := comp(comp)),
        // compressing chains so rounds go O(log d) not O(d)
        val lut = stepped.select(col("id").as("cid"), col("comp").as("ccomp"))
        val next = snap(stepped.join(lut, stepped("comp") === lut("cid"), "left")
          .select(stepped("id"), coalesce(col("ccomp"), stepped("comp")).as("comp")))
        val s = next.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
        labels.unpersist()
        labels = next
        converged = s == lastSum
        lastSum = s
        iter += 1
      }
      edges.unpersist()
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", sessionParts)
  }

  /** The candidate-edge half alone, oracle-checked separately so the
    * mining join's plan (the scale-relevant piece — see EXPLAINS.md)
    * is pinned independently of the iterative closure.
    */
  def ccEdges(s: SparkSession, dir: String): DataFrame =
    sharedShingleEdges(Tables.load(s, dir, "documents"))

  /** The full operator over `documents`: mine edges, cluster, mark
    * the canonical (min-id) member of each cluster. Oracle: DuckDB
    * recomputes the same edge set and closes it with a recursive CTE.
    */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val comps = connectedComponents(sharedShingleEdges(docs))
    comps.select(col("id").as("doc_id"), col("comp"),
      (col("comp") === col("id")).cast("int").as("is_canonical"))
  }

  /** Cluster-then-KEEP-BEST — the selection policy real pipelines
    * want from near-dup clustering: within each duplicate cluster
    * keep the HIGHEST-QUALITY member (here the quality-classifier
    * logit; ties to the lowest doc_id), not an arbitrary canonical.
    * Composition of three operators already in the engine: candidate
    * mining → CC closure → per-cluster argmax as a struct-min
    * AGGREGATE over the CLUSTERED slice only (min over (-logit,
    * doc_id) ≡ rank 1 of (logit desc, doc_id asc)), joined back;
    * docs outside any cluster (comp null) are is_kept = 1 by
    * definition and never touch the argmax. No window, no sort —
    * the corpus crosses the wire for the label join only. Every doc
    * reports (cluster, quality, kept), so the downstream filter is
    * `is_kept = 1`.
    */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val comps = connectedComponents(sharedShingleEdges(docs))
    val scored = graft.text.SelectionQueries.qualityFlags(docs)
      .select(col("doc_id"), col("logit"))
    // Per-cluster argmax WITHOUT the corpus-wide window: the old
    // comp-partitioned row_number() sorted EVERY doc (singletons are
    // 1-row partitions, but they still ride the sort shuffle);
    // clusters only exist for docs the mining emitted, so the argmax
    // is a struct-min aggregate over the CLUSTERED slice — min over
    // (-logit, doc_id) is exactly (logit desc, doc_id asc) rank 1 —
    // and unclustered docs are is_kept=1 by definition. The winner
    // table is dup-bounded (one row per multi-doc cluster), the
    // corpus crosses the wire for the label join only — no sort
    // anywhere (r16, guide §4/§2.3).
    val labeled = docs.select(col("doc_id"))
      .join(comps, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), col("comp"))
      .join(scored, Seq("doc_id"))
    // -logit stays in LONG: logit is an exact bigint precisely so the
    // ordering is bit-identical, and a double negation would lose
    // exactness past 2^53 (ADVICE r16)
    val best = labeled.where(col("comp").isNotNull)
      .groupBy(col("comp"))
      .agg(min(struct((col("logit") * -1L).as("nl"), col("doc_id").as("d"))).as("m"))
      .select(col("comp"), col("m.d").as("best_doc"))
    labeled
      .join(best, Seq("comp"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"),
        col("logit"),
        when(col("comp").isNull, lit(1))
          .otherwise((col("doc_id") === col("best_doc")).cast("int")).as("is_kept"))
  }
}
