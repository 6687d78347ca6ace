package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for operators Spark's function library
  * lacks. Each participates in whole-stage codegen via a static call
  * into [[TextHash]] / [[VectorOps]] — no UDF boxing, no interpreted
  * fallback in the hot path. This mirrors how the reference codegens
  * its scalar calls (flink-table-planner codegen/calls/StringCallGen
  * .scala → static runtime methods in SqlFunctionUtils.java).
  */

/** 64-bit FNV-1a content fingerprint of a string. */
case class Fingerprint64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.fingerprint64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.fingerprint64($c)")
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(c)
  override def prettyName: String = "fingerprint64"
}

/** 64-bit SimHash signature over whitespace tokens. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

/** Cosine similarity of two ARRAY<FLOAT> embedding columns. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity"
}

/** Dot product of two ARRAY<FLOAT> embedding columns. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Random-hyperplane LSH bucket id for an ARRAY<FLOAT> vector.
  * `seed` picks an independent hyperplane family (multi-table LSH).
  */
case class LshBucket(child: Expression, nBits: Int, seed: Int = 0)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    VectorOps.lshBucket(v.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.lshBucket($c, $nBits, $seed)")
  override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
  override def prettyName: String = "lsh_bucket"
}

/** Wide random-hyperplane signature (`nBits` sign bits packed into
  * ARRAY<BIGINT>) — the popcount-prefilter side of ANN rerank.
  */
case class LshSignature(child: Expression, nBits: Int, seed: Int = 0)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    VectorOps.lshSignatureData(v.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.lshSignatureData($c, $nBits, $seed)")
  override protected def withNewChildInternal(c: Expression): LshSignature = copy(child = c)
  override def prettyName: String = "lsh_signature"
}

/** Hamming distance between two packed signatures (ARRAY<BIGINT>). */
case class HammingSignature(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.hammingSig(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.hammingSig($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingSignature =
    copy(left = l, right = r)
  override def prettyName: String = "hamming_sig"
}

/** Hamming distance between two 64-bit signatures (for SimHash
  * near-dup thresholds).
  */
case class HammingDistance64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance64 =
    copy(left = l, right = r)
  override def prettyName: String = "hamming64"
}

/** Shannon entropy (bits) of a string's code-point distribution —
  * the gibberish/boilerplate signal of a quality gate, computed in
  * one map-only pass per document (no explode, no shuffle).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.charEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.charEntropy($c)")
  override protected def withNewChildInternal(c: Expression): CharEntropy = copy(c)
  override def prettyName: String = "char_entropy"
}

/** Shannon entropy (bits) of a string's whitespace-token
  * distribution — near zero for template/keyword-stuffed pages.
  */
case class TokenEntropy(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.tokenEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.tokenEntropy($c)")
  override protected def withNewChildInternal(c: Expression): TokenEntropy = copy(c)
  override def prettyName: String = "token_entropy"
}

/** Unicode NFC normalization — Spark ships no normalizer, and text
  * dedup needs one: composed (U+00E9) and decomposed (e + U+0301)
  * spellings of the same text must hash identically before any
  * fingerprint/minhash pass. Codegen'd static call; ASCII
  * short-circuits inside [[TextHash.nfc]].
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
  override def prettyName: String = "nfc_normalize"
}

/** Achlioptas sign random projection of an ARRAY<FLOAT> vector to
  * `dOut` dims, quantized floor(v*1000) and CSV-joined (see
  * [[VectorOps.rpProject]]). The ±1 matrix is md5-derived per
  * (dIn, dOut) ONCE per JVM — never in the per-row path, which the
  * interpreted higher-order-function formulation (transform +
  * aggregate lambdas) could not avoid.
  */
case class RpProject(child: Expression, dOut: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    VectorOps.rpProject(v.asInstanceOf[ArrayData], dOut)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.rpProject($c, $dOut)")
  override protected def withNewChildInternal(c: Expression): RpProject = copy(child = c)
  override def prettyName: String = "rp_project"
}

/** Point-estimate read of a serialized Count–Min sketch (the BINARY
  * produced by Spark's `count_min_sketch` aggregate): estimated
  * occurrence count of STRING `item`. See [[SketchOps.cmsEstimate]]
  * for the probe-hash == insert-hash argument and the per-task
  * deserialization memo that keeps this a static codegen call.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(sk: Any, item: Any): Any =
    SketchOps.cmsEstimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i) => s"graft.functions.SketchOps.cmsEstimate($s, $i)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}
