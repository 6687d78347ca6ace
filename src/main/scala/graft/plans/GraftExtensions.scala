package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.HammingDistance64

/** Catalyst extension point for graft's custom expressions — the
  * Spark analog of the reference's planner rule sets
  * (FlinkStreamRuleSets.scala): domain-specific rewrites run inside
  * the optimizer, so they compose with pushdown/pruning instead of
  * happening at API level.
  *
  * Round-1 rule: self-comparison simplification for signature
  * expressions — `hamming64(x, x)` is 0 for any non-null x, so the
  * (potentially expensive, join-fed) expression folds to a null-safe
  * constant. (The cosine analog is deliberately NOT rewritten:
  * cosine(x, x) is 0, not 1, for zero vectors, so the identity does
  * not hold universally.)
  *
  * Install at build time via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or on a
  * live session via [[GraftExtensions.install]]
  * (experimental.extraOptimizations — the sanctioned runtime hook).
  */
object SimplifySelfHamming extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HammingDistance64(a, b) if a == b && a.deterministic =>
        If(IsNull(a), Literal(null, IntegerType), Literal(0, IntegerType))
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SimplifySelfHamming)
  }
}

object GraftExtensions {
  /** Install the graft optimizer rules into an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(SimplifySelfHamming))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimplifySelfHamming
}
