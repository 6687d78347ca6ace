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
  * neighbors (join edges→labels, groupBy dst, min), then compresses
  * paths by re-resolving its label through the label table
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

  /** Candidate edges: docs sharing >= `minShared` distinct word
    * n-grams, with shingles appearing in more than `maxDf` docs
    * dropped first (the standard stop-shingle cut — it bounds every
    * join bucket to `maxDf` docs, so candidate volume is at most
    * |shingles|·maxDf² and never quadratic in the corpus).
    */
  def sharedShingleEdges(docs: DataFrame, n: Int = 3, maxDf: Int = 50,
                         minShared: Int = 3): DataFrame = {
    val sh = docs
      .withColumn("l", split(col("text"), " "))
      .filter(size(col("l")) >= n)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(l) - $n),
           |  i -> concat_ws(' ', ${(0 until n).map(j => s"l[i+$j]").mkString(", ")}))"""
          .stripMargin)).as("g"))
      .distinct()
    val rare = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("g")
    val shr = sh.join(rare, Seq("g"))
    shr.as("a")
      .join(shr.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ida"), col("b.doc_id").as("idb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select("ida", "idb")
  }

  /** Connected components of an undirected pair graph.
    * @param pairs (ida, idb) candidate pairs, one direction
    * @return (id, comp) — comp is the min id reachable from id
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // Every round references the previous label table THREE times
    // (neighbor-min join, the least() merge, the jump LUT) — without
    // lineage truncation the logical plan doubles per round and the
    // driver dies analyzing it long before the data is big.
    // localCheckpoint materializes each round's ~|V| rows and cuts
    // the plan back to a leaf; on a multi-executor cluster swap in
    // reliable checkpoint(dir) so a lost executor can't drop a slice
    // of the label table mid-computation.
    val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .union(pairs.select(col("idb").as("src"), col("ida").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var lastSum = labels.agg(sum(col("comp"))).head().getLong(0)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("comp")).as("nmin"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("nmin"), labels("comp"))).as("comp"))
      // pointer jump: follow the label one hop (comp := comp(comp)),
      // compressing chains so rounds go O(log d) not O(d)
      val lut = stepped.select(col("id").as("cid"), col("comp").as("ccomp"))
      val next = stepped.join(lut, stepped("comp") === lut("cid"), "left")
        .select(stepped("id"), coalesce(col("ccomp"), stepped("comp")).as("comp"))
        .localCheckpoint(true)
      val s = next.agg(sum(col("comp"))).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = s == lastSum
      lastSum = s
      iter += 1
    }
    edges.unpersist()
    labels
  }

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
}
