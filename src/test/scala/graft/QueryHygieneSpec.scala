package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}

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

  /** Rule 3 (string-level, r6 verdict): DuckDB types any uncast integer
    * `sum()` as HUGEINT (int128), which the driver's `.df()` fetch path
    * canonicalizes as float64 — hash-mismatching value-equal cells (the
    * root cause of ALL seven r6 red rows and r5's `p_dataset_card`).
    * Lint: every `sum(...)` in an oracle SQL whose alias names an
    * integer-typed Spark output column must be wrapped in `CAST(`.
    * This is a lint, not a type-checker — `tools/check.py` binds the
    * real DuckDB types and is the hard gate; this spec just keeps the
    * class from being written at all.
    */
  private def uncastIntegerSums(name: String, sql: String,
      intCols: Set[String]): Seq[String] = {
    val out = mutable.Buffer.empty[String]
    val s = sql.toLowerCase
    def skipWs(p: Int): Int = {
      var q = p; while (q < s.length && s(q).isWhitespace) q += 1; q
    }
    var idx = s.indexOf("sum")
    while (idx >= 0) {
      val wordStart = idx == 0 ||
        (!s(idx - 1).isLetterOrDigit && s(idx - 1) != '_')
      val j = skipWs(idx + 3)
      if (wordStart && j < s.length && s(j) == '(') {
        // sealed if the token immediately before is `cast(`
        val rev = s.substring(0, idx).reverse.dropWhile(_.isWhitespace)
        val sealedByCast = rev.startsWith("(") &&
          rev.drop(1).dropWhile(_.isWhitespace).startsWith("tsac")
        if (!sealedByCast) {
          // find sum's closing paren, skip an optional OVER (...) frame,
          // then read the alias if the next token is AS
          var depth = 1; var k = j + 1
          while (k < s.length && depth > 0) {
            if (s(k) == '(') depth += 1
            else if (s(k) == ')') depth -= 1
            k += 1
          }
          var m = skipWs(k)
          if (s.startsWith("over", m)) {
            m = skipWs(m + 4)
            if (m < s.length && s(m) == '(') {
              var d2 = 1; m += 1
              while (m < s.length && d2 > 0) {
                if (s(m) == '(') d2 += 1
                else if (s(m) == ')') d2 -= 1
                m += 1
              }
            }
          }
          m = skipWs(m)
          if (s.startsWith("as", m) && m + 2 < s.length &&
              s(m + 2).isWhitespace) {
            val start = skipWs(m + 2)
            var e = start
            while (e < s.length && (s(e).isLetterOrDigit || s(e) == '_')) e += 1
            val alias = s.substring(start, e)
            if (intCols(alias))
              out += s"$name: uncast integer sum() aliased AS $alias — " +
                "DuckDB promotes to HUGEINT; wrap in CAST(... AS BIGINT)"
          }
        }
      }
      idx = s.indexOf("sum", idx + 1)
    }
    out.toSeq
  }

  private def isIntegral(t: DataType): Boolean =
    t == LongType || t == IntegerType || t == ShortType || t == ByteType

  test("oracle SQL: integer sums feeding integer output columns are CAST") {
    val dir = sf()
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .flatMap { case (name, sql) =>
        val intCols = SparkEntry.queries(name)(spark, dir).schema.fields
          .filter(f => isIntegral(f.dataType)).map(_.name.toLowerCase).toSet
        uncastIntegerSums(name, sql, intCols)
      }
    assert(violations.isEmpty,
      s"\n${violations.size} HUGEINT-lint violations:\n${violations.mkString("\n")}")
  }

  test("the HUGEINT lint catches the r6 red-row shapes (planted)") {
    // the p_dataset_card / p_pack_audit shape: bare integer sum as output
    assert(uncastIntegerSums("planted",
      "SELECT sum(n_chars) AS total_chars FROM t", Set("total_chars")).nonEmpty)
    // the q_concurrency shape: bare windowed sum as output
    assert(uncastIntegerSums("planted",
      "SELECT sum(d) OVER (ORDER BY ts) AS conc FROM t", Set("conc")).nonEmpty)
    // cast forms pass
    assert(uncastIntegerSums("planted",
      "SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars FROM t",
      Set("total_chars")).isEmpty)
    assert(uncastIntegerSums("planted",
      "SELECT CAST(sum(d) OVER (ORDER BY ts) AS BIGINT) AS conc FROM t",
      Set("conc")).isEmpty)
    // float sums (round-sealed, double output) are out of scope
    assert(uncastIntegerSums("planted",
      "SELECT round(sum(x), 6) AS kl FROM t", Set.empty).isEmpty)
    // CTE-internal sums whose alias is not an output column are fine
    assert(uncastIntegerSums("planted",
      "WITH c AS (SELECT sum(n) AS m FROM t) SELECT count(*) AS n_rows FROM c",
      Set("n_rows")).isEmpty)
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
