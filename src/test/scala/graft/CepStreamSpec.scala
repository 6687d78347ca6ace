package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.cep.{CepOps, Nfa}
import graft.cep.CepOps.Ev

/** top-level so the encoder needs no outer instance */
case class CepStreamMatch(user_id: Long, n_views: Long, purchase_id: Long)

/** Streaming MATCH_RECOGNIZE: the full NFA over a watermarked keyed
  * stream — matches emit once the watermark proves them final, state
  * drops consumed rows.
  */
class CepStreamSpec extends SparkSpec {
  import spark.implicits._
  import graft.{CepStreamMatch => M}

  private val pat = Nfa.Cat[Ev](List(
    Nfa.Rep(Nfa.Sym[Ev]("V", _.event_type == "view"), 1, Int.MaxValue),
    Nfa.Sym[Ev]("P", _.event_type == "purchase")))

  test("greedy V+ P emits once the watermark finalizes the match") {
    val input = MemoryStream[Ev](51, spark, None)
    val withWm = input.toDF()
      .withColumn("eventTime", timestamp_millis($"tsMillis"))
      .withWatermark("eventTime", "0 seconds")
      .as[Ev]
    val out = CepOps.matchPatternStream(withWm,
      (e: Ev) => e.user_id, (e: Ev) => (e.tsMillis, e.event_id),
      (e: Ev) => e.tsMillis, pat) { (k: Long, m: Nfa.PatMatch[Ev]) =>
      M(k, m.caps("V").length.toLong, m.caps("P").head.event_id)
    }
    val q = out.writeStream.format("memory").queryName("cep_stream")
      .outputMode("append").start()
    try {
      def rows() = spark.table("cep_stream").as[M].collect().toList

      // views then purchase, but watermark hasn't passed the purchase:
      // nothing emits (the match's last row is the newest complete row)
      input.addData(
        Ev(1, 1, 1000, "view"), Ev(1, 2, 2000, "view"), Ev(1, 3, 3000, "purchase"))
      q.processAllAvailable()
      input.addData(Ev(2, 9, 10000, "click")) // wm -> 3s; match still open-ended
      q.processAllAvailable()
      // a later complete row for key 1 proves the match final
      input.addData(Ev(1, 4, 20000, "click"))
      q.processAllAvailable()
      input.addData(Ev(2, 10, 30000, "click")) // wm -> 20s
      q.processAllAvailable()
      input.addData(Ev(2, 11, 31000, "click")) // wm -> 30s; key-1 timer fires
      q.processAllAvailable()
      assert(rows() === List(M(1, 2, 3)), rows().toString)

      // consumed rows left state: a second run matches independently
      // (events stay above the current watermark of 31s)
      input.addData(Ev(1, 5, 40000, "view"), Ev(1, 6, 41000, "purchase"),
        Ev(1, 7, 42000, "click"))
      q.processAllAvailable()
      input.addData(Ev(2, 12, 50000, "click")) // wm -> 42s; finalize
      q.processAllAvailable()
      input.addData(Ev(2, 13, 60000, "click")) // one more nudge for the timer
      q.processAllAvailable()
      assert(rows().toSet === Set(M(1, 2, 3), M(1, 1, 6)), rows().toString)
    } finally q.stop()
  }
}
