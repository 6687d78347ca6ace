package graft.cep

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MATCH_RECOGNIZE over Datasets: per-key, event-time-ordered NFA
  * matching (StreamExecMatch.java:59's batch shape; the streaming
  * twin buffers by watermark like StatefulOps.asOfJoin and runs the
  * same [[Nfa]] core on flush).
  *
  * Scale: one shuffle on the partition key; per-key rows are sorted
  * inside flatMapGroups (Spark's group iterator is already clustered
  * per key), NFA state is O(match length).
  */
object CepOps {

  /** Generic batch matcher: partition by key, order by `order`,
    * apply the pattern, map each match through `measure`.
    */
  def matchPattern[E, K: Encoder, O: Encoder](
      ds: Dataset[E], key: E => K, order: E => (Long, Long),
      steps: List[Nfa.Step[E]])(measure: (K, Map[String, List[E]]) => O): Dataset[O] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)(implicitly[Encoder[K]])
      .flatMapGroups { (k: K, it: Iterator[E]) =>
        val sorted = it.toIndexedSeq.sortBy(order)
        Nfa.matchAll(sorted, steps).iterator.map(m => measure(k, m))
      }
  }

  case class Ev(user_id: Long, event_id: Long, tsMillis: Long, event_type: String)
  case class ViewRunMatch(user_id: Long, n_views: Long, first_view: Long, purchase_id: Long)

  /** `PATTERN (V+ P)` over the events table: one-or-more consecutive
    * views immediately followed by a purchase, greedy, skip past last
    * row. MEASURES: count(V.*), first(V.event_id), P.event_id.
    */
  def viewRunsThenPurchase(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMillis"), // micros: full-precision ordering
        col("event_type"))
      .as[Ev]
    val steps = List(
      Nfa.Step[Ev]("V", _.event_type == "view", Nfa.Plus),
      Nfa.Step[Ev]("P", _.event_type == "purchase", Nfa.One))
    matchPattern(ev, (e: Ev) => e.user_id, (e: Ev) => (e.tsMillis, e.event_id), steps) {
      (k, m) =>
        val vs = m("V")
        ViewRunMatch(k, vs.length.toLong, vs.head.event_id, m("P").head.event_id)
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cep_quantified" -> (viewRunsThenPurchase _))

  /** Oracle: gaps-and-islands formulation of `PATTERN (V+ P)` —
    * maximal runs of consecutive views whose immediately-next event
    * is a purchase.
    */
  val oracle: Map[String, String] = Map(
    "q_cep_quantified" ->
      """WITH ordered AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER w AS rn,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY rn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM ordered),
        |v AS (SELECT user_id, island, count(*) AS n_views,
        |        arg_min(event_id, rn) AS first_view, max(rn) AS last_rn
        |      FROM isl WHERE event_type = 'view' GROUP BY user_id, island),
        |p AS (SELECT user_id, event_id AS purchase_id, rn FROM isl
        |      WHERE event_type = 'purchase')
        |SELECT p.user_id, v.n_views, v.first_view, p.purchase_id
        |FROM p JOIN v ON v.user_id = p.user_id AND v.last_rn = p.rn - 1""".stripMargin)
}
