package graft

import org.apache.spark.sql.functions._
import graft.functions.{FlinkFunctions => F, TextHash, VectorOps}
import org.apache.spark.unsafe.types.UTF8String

/** Expression-semantics tests (analog of the reference's
  * flink-table-planner expressions test suites): exact values, null
  * behavior, and algebraic properties of the custom expressions.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint64 is deterministic and content-sensitive") {
    val a = TextHash.fingerprint64(UTF8String.fromString("hello world"))
    val b = TextHash.fingerprint64(UTF8String.fromString("hello world"))
    val c = TextHash.fingerprint64(UTF8String.fromString("hello worlD"))
    assert(a === b)
    assert(a !== c)
    // catalyst expression path returns the same value as the kernel
    val viaExpr = Seq("hello world").toDF("t")
      .select(F.fingerprint64($"t")).first().getLong(0)
    assert(viaExpr === a)
  }

  test("simhash64: identical texts => distance 0; near-dups close, distinct far") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val near = base.replace("lazy", "sleepy")
    val far = "completely different words entirely unrelated content " * 5
    val h0 = TextHash.simhash64(UTF8String.fromString(base))
    val h1 = TextHash.simhash64(UTF8String.fromString(near))
    val h2 = TextHash.simhash64(UTF8String.fromString(far))
    assert(TextHash.hamming64(h0, h0) === 0)
    assert(TextHash.hamming64(h0, h1) < TextHash.hamming64(h0, h2))
  }

  test("cosine similarity: identity 1, orthogonal 0, scale-invariant") {
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 3f), Array(2f, 4f, 6f))
    ).toDF("a", "b").select(F.cosineSimilarity($"a", $"b").as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) === 0.0)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("split_index: 0-based, NULL out of range (Flink SPLIT_INDEX semantics)") {
    val df = Seq("a,b,c").toDF("s").select(
      F.splitIndex($"s", ",", 1).as("mid"),
      F.splitIndex($"s", ",", 5).as("oob"))
    val r = df.first()
    assert(r.getString(0) === "b")
    assert(r.isNullAt(1))
  }

  test("truncateNum truncates toward zero on both signs") {
    val df = Seq((3.19, -3.19)).toDF("p", "n").select(
      F.truncateNum($"p", 1), F.truncateNum($"n", 1))
    val r = df.first()
    assert(math.abs(r.getDouble(0) - 3.1) < 1e-9)
    assert(math.abs(r.getDouble(1) - -3.1) < 1e-9)
  }

  test("temporal_overlaps: overlapping and disjoint periods") {
    val df = Seq((1, 5, 4, 9), (1, 2, 3, 4)).toDF("s1", "e1", "s2", "e2")
      .select(F.temporalOverlaps($"s1", $"e1", $"s2", $"e2").as("o"))
    val got = df.collect().map(_.getBoolean(0))
    assert(got(0) === true)
    assert(got(1) === false)
  }

  test("lsh bucket: deterministic, within bit range") {
    val v = Array.fill(8)(0.5f)
    val b1 = VectorOps.lshBucket(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), 8)
    val b2 = VectorOps.lshBucket(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), 8)
    assert(b1 === b2)
    assert(b1 >= 0 && b1 < 256)
  }

  test("nfc_normalize unifies composed and decomposed unicode; ASCII is identity (no copy)") {
    val composed = "caf\u00e9 r\u00e9sum\u00e9"
    val decomposed = "cafe\u0301 re\u0301sume\u0301"
    assert(composed != decomposed)
    val nc = TextHash.nfc(UTF8String.fromString(composed))
    val nd = TextHash.nfc(UTF8String.fromString(decomposed))
    assert(nc === nd, "NFC must unify the two spellings")
    // the dedup property this exists for: identical fingerprints after NFC
    assert(TextHash.fingerprint64(nc) === TextHash.fingerprint64(nd))
    // ASCII fast path returns the SAME UTF8String instance — no allocation
    val ascii = UTF8String.fromString("plain ascii text")
    assert(TextHash.nfc(ascii) eq ascii)
    // catalyst expression path (codegen) matches the kernel
    val viaExpr = Seq(decomposed).toDF("t")
      .select(F.nfcNormalize($"t")).first().getString(0)
    assert(viaExpr === nc.toString)
    // SQL-registered name
    F.registerAll(spark)
    val viaSql = Seq(decomposed).toDF("t").createOrReplaceTempView("nfc_in")
    assert(spark.sql("SELECT nfc_normalize(t) FROM nfc_in").first().getString(0)
      === nc.toString)
  }

  test("entropy expressions are SQL-callable under their registered names") {
    F.registerAll(spark)
    Seq("aab").toDF("t").createOrReplaceTempView("ent_in")
    val r = spark.sql("SELECT char_entropy(t) AS ch, token_entropy(t) AS th FROM ent_in")
      .first()
    assert(math.abs(r.getDouble(0) - (math.log(3.0) / math.log(2.0) - 2.0 / 3.0)) < 1e-12)
    assert(r.getDouble(1) == 0.0) // single token
  }

  test("rp_project matches the per-row md5 SQL formulation; plan has no per-row md5") {
    // The naive HOF formulation q_embed_rp shipped in round 8 — kept
    // here as the semantic oracle for the native expression.
    val naive = expr(
      """array_join(transform(sequence(0, 15), j ->
        |  cast(floor(aggregate(sequence(0, size(v) - 1),
        |    cast(0.0 as double),
        |    (acc, i) -> acc + cast(v[i] as double) *
        |      (case when substring(md5(cast(concat('rp:', cast(i as string),
        |                ':', cast(j as string)) as binary)), 1, 1) < '8'
        |            then cast(1.0 as double)
        |            else cast(-1.0 as double) end))
        |    * cast(1000.0 as double)) as bigint)), ',')""".stripMargin)
    val vecs = Seq(
      Array.tabulate(64)(i => (math.sin(i + 1) * 3).toFloat),
      Array.tabulate(64)(i => (i % 7 - 3).toFloat),
      Array.fill(64)(0f),
      Array.tabulate(8)(i => i.toFloat) // ragged dim exercises the (dIn,dOut) cache
    ).toDF("v")
    val got = vecs.select(F.rpProject($"v", 16).as("a"), naive.as("b")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
    // the executed plan must carry the one static call, no md5
    val plan = vecs.select(F.rpProject($"v", 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rp_project"))
    assert(!plan.toLowerCase.contains("md5"), "sign matrix must not be derived per row")
  }

  test("SQL registration exposes flink-name functions") {
    graft.functions.FlinkFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT split_index('x|y|z', '\\\\|', 2) AS a, fingerprint64('abc') AS b, cot(1.0) AS c")
      .first()
    assert(r.getString(0) === "z")
    assert(r.getLong(1) === TextHash.fingerprint64(UTF8String.fromString("abc")))
    assert(math.abs(r.getDouble(2) - 1.0 / math.tan(1.0)) < 1e-12)
    val r2 = spark.sql(
      """SELECT to_base64('hi') AS b, from_base64(to_base64('hi')) AS rt,
        |  truncate(-3.19, 1) AS tn, sha224('x') AS sh""".stripMargin).first()
    assert(r2.getString(0) === "aGk=")
    assert(r2.getString(1) === "hi")
    assert(math.abs(r2.getDouble(2) - -3.1) < 1e-9)
    assert(r2.getString(3).length === 56)
    // SHA1 (BuiltInFunctionDefinitions.sha1) — Spark native; known vector
    val r3 = spark.sql("SELECT sha1('abc') AS h").first()
    assert(r3.getString(0) === "a9993e364706816aba3e25717850c26c9cd0d89d")
  }
}
