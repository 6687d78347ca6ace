package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.DatasetBridge

/** AS-OF join as a first-class Catalyst operator — the full custom-
  * operator ladder the survey's preference (c) describes: a logical
  * node, a planner [[SparkStrategy]], and a physical [[AsOfJoinExec]]
  * that DECLARES its needs ([[ClusteredDistribution]] on the keys,
  * per-partition (key, time) ordering) and lets EnsureRequirements
  * insert the exchanges and sorts. The execution itself is then a
  * single streamed merge pass per co-partitioned pair — the plan
  * shape the reference's TemporalRowTimeJoinOperator gets from its
  * keyed exchange, expressed Spark-natively.
  *
  * Semantics: LEFT AS-OF — every probe row pairs with the latest
  * build row of the same key whose time <= probe time, or nulls.
  * (The composed Window/DSL formulation lives in
  * operators.AsOfJoin; this operator exists for the cases the
  * composed plan can't express as cheaply: no union, no window, no
  * struct packing — one merge pass.)
  */
object AsOfJoinNative {

  /** Logical node: resolved attributes for key/time on both sides. */
  case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, leftTime: Expression,
      rightKey: Expression, rightTime: Expression) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
        AsOfJoinExec(lk, lt, rk, rt, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(leftKey: Expression, leftTime: Expression,
      rightKey: Expression, rightTime: Expression,
      left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // the contract that makes this operator scale: both children
    // hash-cluster on their key (EnsureRequirements co-partitions
    // them) and arrive sorted (key, time) within each partition
    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
    override def outputPartitioning = left.outputPartitioning

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyB = BindReferences.bindReference(leftKey, left.output)
      val lTimeB = BindReferences.bindReference(leftTime, left.output)
      val rKeyB = BindReferences.bindReference(rightKey, right.output)
      val rTimeB = BindReferences.bindReference(rightTime, right.output)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      val rightArity = right.output.size
      val outAttrs = output
      // bind against NULLABLE right attrs: unmatched probes read the
      // null-padded row, and a non-nullable binding would surface 0s
      val inAttrs = left.output ++ right.output.map(_.withNullability(true))

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val proj = UnsafeProjection.create(outAttrs, inAttrs)
        val nullRight = new GenericInternalRow(rightArity)
        val joined = new JoinedRow
        var rNext: InternalRow = null
        def advance(): Unit = rNext = if (rIter.hasNext) rIter.next() else null
        advance()
        // the current best build row for the key under the cursor
        var cand: InternalRow = null
        var candKey: Any = null
        lIter.map { l =>
          val lk = lKeyB.eval(l)
          val lt = lTimeB.eval(l)
          if (cand != null && keyOrd.compare(candKey, lk) != 0) {
            cand = null; candKey = null
          }
          var done = lk == null
          while (!done && rNext != null) {
            val rk = rKeyB.eval(rNext)
            val rt = rTimeB.eval(rNext)
            if (rk == null || rt == null) advance() // null keys/times never match
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) advance()
              else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                cand = rNext.copy()
                candKey = rKeyB.eval(cand)
                advance()
              } else done = true
            }
          }
          val matched = cand != null && lk != null && keyOrd.compare(candKey, lk) == 0
          proj(joined(l, if (matched) cand else nullRight))
        }
      }
    }
  }

  /** Install the strategy on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** LEFT AS-OF join of `probe` with `build` on key/time column
    * names. Build columns are re-aliased so self-joins (same source
    * both sides) keep distinct expression ids.
    */
  def asOf(probe: DataFrame, build: DataFrame,
      probeKey: String, probeTime: String,
      buildKey: String, buildTime: String): DataFrame = {
    val spark = probe.sparkSession
    install(spark)
    val freshBuild = build.select(build.columns.map(c => col(c).as(c)).toSeq: _*)
    val lPlan = probe.queryExecution.analyzed
    val rPlan = freshBuild.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(sys.error(s"no column '$n' in ${p.output.map(_.name)}"))
    DatasetBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, probeKey), attr(lPlan, probeTime),
      attr(rPlan, buildKey), attr(rPlan, buildTime)))
  }
}
