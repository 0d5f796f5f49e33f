package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.4 row 37) as a reusable operator.
  *
  * For every left ("probe") row, attach the most recent right
  * ("reference") row with the same key whose timestamp is at or before
  * the probe's. Implemented the scalable way: union both sides, one
  * sort within each key partition, carry the latest reference payload
  * forward with `last(ignoreNulls)` — a single shuffle on the key, no
  * per-row range-join blowup, and no broadcast requirement on either
  * side. This is the formulation that survives a 100 TB probe stream
  * against a 100 TB reference table (both sides shuffle once on the
  * key; a hot key is AQE's skew-join case).
  *
  * Ordering within equal timestamps: reference rows sort BEFORE probe
  * rows (side marker 0 vs 1), so an exactly-simultaneous reference
  * value is visible to the probe — inclusive as-of, matching DuckDB's
  * `ASOF JOIN ... ON ref.ts <= probe.ts`.
  */
object AsOf {

  /** @param left        probe side
    * @param right       reference side
    * @param keyCol      equality key present on both sides
    * @param tsCol       event-time column present on both sides
    * @param payloadCols reference columns to carry onto the probe rows
    * @return left's columns + one `asof_<payload>` column per payload
    *         (null when no reference row precedes the probe)
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val probe = left.select(
      leftCols.map(col) ++ Seq(lit(1).as("__side")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    // SQL equality semantics: a null key or null timestamp on the
    // reference side can never match any probe (the window's
    // partitionBy would otherwise group null keys together)
    val matchable = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    // project the reference side onto the probe's exact column list
    val ref = matchable.select(probe.columns.toSeq.map {
      case c if c == keyCol || c == tsCol => col(c)
      case "__side" => lit(0).as("__side")
      case c if c.startsWith("__p_") => col(c.stripPrefix("__p_")).as(c)
      case c => lit(null).cast(probe.schema(c).dataType).as(c)
    }: _*)
    // payload columns as the final sort keys: ties among reference rows
    // with identical (key, ts) resolve deterministically (largest
    // payload tuple wins) instead of by partition-internal order
    val w = Window.partitionBy(col(keyCol))
      .orderBy(Seq(col(tsCol), col("__side")) ++
        payloadCols.map(c => col(s"__p_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the matched reference row as ONE struct: the whole row wins
    // or loses atomically, so a legitimately-NULL payload field of the
    // most recent reference row stays NULL instead of inheriting an
    // older row's value (matches DuckDB ASOF JOIN, which attaches one
    // row). Also: one window function instead of one per payload column.
    val refRow = when(col("__side") === 0,
      struct(payloadCols.map(c => col(s"__p_$c")): _*))
    val carried = probe.unionByName(ref)
      .withColumn("__asof", last(refRow, ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__asof").getField(s"__p_$c").as(s"asof_$c")): _*)
  }
}
