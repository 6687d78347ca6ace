package graft

import org.apache.spark.sql.functions._
import graft.operators.TpcdsPublished

/** Harness-machinery goldens for the published-text battery. The
  * published rows' CORRECTNESS lives in the oracle battery (97 files
  * hash-checked); these specs pin the two pieces of harness logic
  * that could silently change semantics if edited: the DuckDB-side
  * NULLS FIRST rewriter and the analyzed-plan-driven result
  * canonicalizer.
  */
class TpcdsPublishedSpec extends SparkSpec {

  test("nullsFirst touches ONLY the final top-level ORDER BY's asc items") {
    val in =
      """with v as (select a, row_number() over (order by b desc) rn
        |from t order by c limit 5)
        |select * from v order by a, b desc, c asc
        |limit 100""".stripMargin
    val out = TpcdsPublished.nullsFirst(in)
    // the window's ORDER BY and the subquery's ORDER BY are untouched
    assert(out.contains("over (order by b desc)"), out)
    assert(out.contains("from t order by c limit 5)"), out)
    // final list: asc items get NULLS FIRST, desc stays
    assert(out.contains("order by a NULLS FIRST , b desc, c asc NULLS FIRST limit 100")
      || out.replaceAll("\\s+", " ")
        .contains("order by a NULLS FIRST , b desc, c asc NULLS FIRST limit 100"), out)
  }

  test("nullsFirst without LIMIT still rewrites to end-of-text") {
    val out = TpcdsPublished.nullsFirst("select a from t order by a")
    assert(out.replaceAll("\\s+", " ").trim.endsWith("order by a NULLS FIRST"), out)
    // no ORDER BY at top level → unchanged
    val none = "select a from (select b from t order by b limit 3) s"
    assert(TpcdsPublished.nullsFirst(none) == none)
  }

  test("castSumColumns: integer-sum outputs -> double (through a CTE), " +
      "counts and plain columns untouched, count(*) name aligned") {
    spark.range(1, 100).toDF("x").createOrReplaceTempView("pub_cast_t")
    val df = spark.sql(
      """with agg as (select x % 3 as k, sum(x) s from pub_cast_t group by x % 3)
        |select k, s, count(*) from agg group by k, s""".stripMargin)
    val out = TpcdsPublished.castSumColumns(df)
    val types = out.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("s") == "double", types.toString)      // sum through CTE
    assert(types("k") == "bigint", types.toString)      // plain column
    assert(types("count_star()") == "bigint", types.toString) // renamed count
    assert(out.count() > 0)
  }

  test("published battery text loads for every included key and the Spark " +
      "side never rewrites customer inside a quoted literal") {
    TpcdsPublished.INCLUDED.foreach { k =>
      val t = TpcdsPublished.sparkSql(k) // throws on a corruptible literal
      assert(t.nonEmpty && !t.contains("`customer`"), k)
    }
  }

  test("dedupNames renames repeated output columns positionally the way " +
      "DuckDB's pandas layer does (cov, cov_1, ...) and leaves unique " +
      "frames untouched") {
    val df = spark.sql("select 1 as cov, 2 as cov, 3 as mean, 4 as cov")
    assert(TpcdsPublished.dedupNames(df).columns.toSeq ===
      Seq("cov", "cov_1", "mean", "cov_2"))
    val unique = spark.sql("select 1 as a, 2 as b")
    assert(TpcdsPublished.dedupNames(unique) eq unique)
  }

  test("truncIntCasts wraps only int casts, balanced through nesting, " +
      "leaving other casts alone — DuckDB rounds cast(double as int) " +
      "where Spark truncates") {
    assert(TpcdsPublished.truncIntCasts("cast((revenue/50) as int) as segment")
      === "cast(trunc((revenue/50)) as int) as segment")
    // nested parens inside the cast body survive the depth scan
    assert(TpcdsPublished.truncIntCasts("cast(((a+b)/(c-d)) as integer)")
      === "cast(trunc(((a+b)/(c-d))) as int)")
    // non-int casts and bare words untouched
    val s = "cast(x as decimal(7, 2)) + broadcast(y)"
    assert(TpcdsPublished.truncIntCasts(s) === s)
  }

  test("the quoted-literal guard rejects texts whose literals would be " +
      "corrupted by the mechanical rewrites, and passes clean ones") {
    TpcdsPublished.guardLiterals("ok", "select 'TN', 'Williamson County' from t")
    for (bad <- Seq(
      "select * from t where c = 'ss_net_paid'",      // rename key
      "select * from t where c = 'a -- b'",           // comment marker
      "select * from t where c = 'f(x)'",             // paren
      "select * from t where c = 'no ORDER BY here'")) // scanner keyword
      assertThrows[IllegalArgumentException](
        TpcdsPublished.guardLiterals("bad", bad))
  }

  test("PINNED_EMPTY names exactly the two analyzed rows and every pinned " +
      "key is an included battery row") {
    assert(TpcdsPublished.PINNED_EMPTY ===
      Set("q_tpcdsgen_q64_published", "q_tpcdsgen_q85_published"))
    val keys = TpcdsPublished.queries.keySet
    TpcdsPublished.PINNED_EMPTY.foreach(k => assert(keys.contains(k), k))
  }
}
