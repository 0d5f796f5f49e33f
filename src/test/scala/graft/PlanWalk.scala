package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** The structural plan-hygiene walker shared by PlanShapeSpec's global
  * q_/p_ sweep and LoopBodyPlanSpec's per-round loop audits.
  *
  * Traversal uses [[AdaptiveSparkPlanHelper]] so it descends through
  * AdaptiveSparkPlanExec roots and materialized query stages (both are
  * LeafExecNodes that blind a naive TreeNode.collect — the r9 sweep
  * defect) and into subquery plans.
  */
trait PlanWalk extends AdaptiveSparkPlanHelper {

  /** Strip the wrappers between a broadcast build side and the operator
    * that determines its cardinality (exchange / reuse / query stage /
    * projection / codegen glue).
    */
  @annotation.tailrec
  final def buildCore(p: SparkPlan): SparkPlan = p match {
    case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
      buildCore(e.child)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      buildCore(r.child)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      buildCore(q.plan)
    case pr: org.apache.spark.sql.execution.ProjectExec => buildCore(pr.child)
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
      buildCore(w.child)
    case i: org.apache.spark.sql.execution.InputAdapter => buildCore(i.child)
    case other => other
  }

  /** THE visible product-join whitelist rule, stated structurally: a
    * BroadcastNestedLoopJoin is exempt iff its build side is a
    * grouping-free (= exactly-one-row) aggregate — the scalar-statistics
    * shape `crossJoin(broadcast(df.agg(...)))` that a dozen faces
    * legitimately plan (q_pareto's total, p_bm25's corpus stats, ...).
    * Anything else — cartesian, or a BNLJ whose build side is a real
    * table — is an offender.
    */
  final def oneRowAggBuild(p: SparkPlan): Boolean = buildCore(p) match {
    case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
      h.groupingExpressions.isEmpty
    case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
      o.groupingExpressions.isEmpty
    case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
      s.groupingExpressions.isEmpty
    case _ => false
  }

  final def productOffenders(root: SparkPlan): Seq[String] =
    collectWithSubqueries(root) {
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        Some("cartesian")
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        val build = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
        }
        if (oneRowAggBuild(build)) None else Some("bnlj")
    }.flatten

  /** COLUMN PRUNING inventory: no plan may read a full-width wide-table
    * schema (a scan that decodes all columns for a narrow projection is
    * the 100 TB I/O anti-pattern). Widths are the ACTUAL testdata
    * parquet column counts — the r9 map carried canonical-TPC-H widths
    * (lineitem 16) the generated tables don't have, so even a working
    * walker would have reported nothing; the planted-offender self-test
    * keeps these honest.
    */
  final val fullWidth = Map("lineitem" -> 11, "orders" -> 6,
    "documents" -> 5, "events" -> 6, "part" -> 6, "customer" -> 5)

  final def unprunedScans(root: SparkPlan): Seq[String] =
    collectWithSubqueries(root) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        val t = s.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        if (fullWidth.get(t).exists(s.requiredSchema.fields.length >= _))
          Some(s"full-width:$t") else None
    }.flatten
}
