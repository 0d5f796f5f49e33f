package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, StringType}

import scala.collection.mutable

/** Float-output hygiene across the ENTIRE driver surface — the spec'd
  * form of the discipline whose violations produced both rounds' single
  * red gate rows (r4 `p_quantize`, r5 `p_dataset_card`): a
  * floating-point value that reaches the comparator must not be able to
  * diverge between engines by more than what its explicit rounding
  * seals.
  *
  * Two mechanical rules, enforced by walking every `SparkEntry.queries`
  * plan (analyzed, attributes chased through their defining aliases):
  *
  *  1. ROUND-SEALED AGGREGATES: every float-typed aggregate or window
  *     function contributing to a float output column must sit under an
  *     explicit `round(_, scale ≤ 8)` — an unrounded corpus-wide float
  *     aggregate hands the comparator raw summation-order ULP. The
  *     scale cap keeps the rounding grid (≥ 1e-8) orders of magnitude
  *     above cross-engine summation ULP (~1e-13), so both engines snap
  *     to the same grid point; 8 (not 6) because the rank-resolution
  *     queries (HITS) legitimately need sub-6dp resolution and the
  *     driver's 6-dp canon then formats the SAME double on both sides.
  *  2. NO GLOBAL FLOAT MEAN OF A TEXT-DERIVED SCORE: in an UNGROUPED
  *     aggregate, `avg` over a float child whose subtree reads a string
  *     column is boundary-fragile even under round — the global mean
  *     concentrates the entire corpus onto ONE rounding boundary, where
  *     sub-round-scale per-row divergence (engine regex corners hidden
  *     by saturated terms) flips the last digit. That is the exact
  *     `p_dataset_card` failure; the robust form aggregates the per-row
  *     integerized score exactly and divides once (integer-typed
  *     aggregates never trigger this rule). Grouped per-document means
  *     (DSIR, bigram-LM) are the accepted per-row-rounding class: each
  *     group's value is an independent row the 4-6dp round seals at the
  *     same risk level as every other per-doc score column.
  *
  * Row-local float math and stored float columns pass untouched: both
  * engines read identical parquet bits and the comparator's 6-dp canon
  * absorbs representation noise; it is only corpus-wide float
  * accumulation that can drift past a boundary.
  */
class QueryHygieneSpec extends SparkSpec {

  private def isFloat(t: DataType): Boolean =
    t == DoubleType || t == FloatType

  private def violationsOf(name: String,
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val violations = mutable.Buffer.empty[String]
    val plan = df.queryExecution.analyzed
      // every Alias anywhere in the plan, for chasing attribute refs to
      // the expression that produced them (Project/Aggregate/Window all
      // define their outputs via Alias)
      val aliases: Map[ExprId, Expression] = plan.collect {
        case p => p.expressions.flatMap(_.collect { case a: Alias => a })
      }.flatten.map(a => a.exprId -> a.child).toMap

      def referencesString(e: Expression, seen: Set[ExprId]): Boolean = e match {
        case ar: AttributeReference =>
          ar.dataType == StringType ||
            (!seen(ar.exprId) && aliases.get(ar.exprId)
              .exists(referencesString(_, seen + ar.exprId)))
        case other =>
          other.dataType == StringType ||
            other.children.exists(referencesString(_, seen))
      }

      def roundScale(e: Expression): Option[Int] = e match {
        case r: Round => r.scale match {
          case Literal(s: Int, _) => Some(s)
          case _ => None
        }
        case _ => None
      }

      // rule 1: chase each float output column through its aliases; any
      // float aggregate/window on the way must already sit under round
      def walk(e: Expression, sealed0: Boolean, seen: Set[ExprId]): Unit = e match {
        case ar: AttributeReference =>
          if (!seen(ar.exprId))
            aliases.get(ar.exprId).foreach(walk(_, sealed0, seen + ar.exprId))
        case _ =>
          val sealedHere = sealed0 || roundScale(e).exists(_ <= 8)
          e match {
            case agg: AggregateExpression if isFloat(agg.dataType) && !sealedHere =>
              violations += s"$name: unrounded float aggregate `$agg`"
            case w: WindowExpression if isFloat(w.dataType) && !sealedHere =>
              violations += s"$name: unrounded float window function `$w`"
            case _ => ()
          }
          e.children.foreach(walk(_, sealedHere, seen))
      }

      plan.output.filter(a => isFloat(a.dataType))
        .foreach(a => walk(a, sealed0 = false, Set.empty))

      // rule 2: global aggregates must not take a float mean of a
      // text-derived score, rounded or not
      plan.collect {
        case node: Aggregate if node.groupingExpressions.isEmpty =>
          node.aggregateExpressions.foreach(_.foreach {
            case agg: AggregateExpression => agg.aggregateFunction match {
              case av: Average if isFloat(av.child.dataType) &&
                  referencesString(av.child, Set.empty) =>
                violations += s"$name: global float avg over a text-derived " +
                  s"score `$av` (boundary-fragile: integerize per row, sum " +
                  "exactly, divide once)"
              case _ => ()
            }
            case _ => ()
          })
      }
    violations.toSeq
  }

  test("float outputs are round-sealed; no global float mean of text-derived scores") {
    val dir = sf()
    val violations = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) => violationsOf(name, fn(spark, dir)) }
    assert(violations.isEmpty,
      s"\n${violations.size} float-hygiene violations:\n${violations.mkString("\n")}")
  }

  test("the checker catches both red-row shapes (planted violations)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "some text here"), (2L, "more words")).toDF("id", "txt")
    // the p_dataset_card shape: global float mean of a regex-derived score
    val globalMean = docs.agg(
      avg(length(regexp_replace(col("txt"), "[aeiou]", "")).cast("double") /
        greatest(length(col("txt")), lit(1))).as("mean_score"))
    assert(violationsOf("planted_mean", globalMean)
      .exists(_.contains("text-derived")))
    // even rounded, the global text-derived mean stays flagged
    val roundedMean = docs.agg(round(avg(
      length(col("txt")).cast("double") / lit(7.0)), 4).as("mean_score"))
    assert(violationsOf("planted_rounded", roundedMean)
      .exists(_.contains("text-derived")))
    // the unsealed-aggregate shape: a float sum reaching output unrounded
    val unsealed = docs.agg(sum(length(col("txt")).cast("double") * 0.1)
      .as("mass"))
    assert(violationsOf("planted_unsealed", unsealed)
      .exists(_.contains("unrounded float aggregate")))
    // and the disciplined forms pass: rounded aggregate, integer sum
    val ok = docs.agg(
      round(sum(length(col("txt")).cast("double")), 4).as("mass"),
      sum(length(col("txt"))).as("n"))
    assert(violationsOf("planted_ok", ok).isEmpty)
  }
}
