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

  /** FORWARD as-of: for every probe row, the EARLIEST reference row at
    * or after the probe's timestamp (pandas `merge_asof
    * direction='forward'`) — same one-shuffle union-sort-carry plan as
    * [[backward]], with the window order reversed. Ties among reference
    * rows with identical (key, ts): the SMALLEST payload tuple wins
    * (the mirror of backward's largest — each direction picks the row
    * its sort meets last, keeping both deterministic).
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame =
    directional(left, right, keyCol, tsCol, payloadCols, ascending = false)
      .select(left.columns.toSeq.map(col) ++
        payloadCols.map(c => col("__asof").getField(s"__p_$c").as(s"asof_$c")): _*)

  /** NEAREST as-of within a tolerance: for every probe row, the
    * reference row minimizing |ref.ts − probe.ts| among those within
    * `toleranceSeconds` (pandas `merge_asof direction='nearest'`,
    * kdb's wj window pick). Tie at equal distance → the BACKWARD
    * match wins (the pandas convention); ties among same-ts reference
    * rows follow that side's payload rule. Two window carries over ONE
    * union (the backward and forward passes share the key partition),
    * then a per-row arithmetic pick — still no pairwise join anywhere.
    * Emits `asof_ts` (the matched timestamp) alongside the payloads so
    * callers can audit the distance.
    */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], toleranceSeconds: Double): DataFrame = {
    val back = directional(left, right, keyCol, tsCol, payloadCols,
      ascending = true).withColumnRenamed("__asof", "__b")
    // second pass over the probe output of the first: the forward carry
    // re-unions with the reference side on the same key partitioning
    // (back's columns — including the carried __b struct — ride the
    // union as probe columns, NULL on reference rows)
    val fwd = directional(back, right, keyCol, tsCol, payloadCols,
      ascending = false)
    val pts = col(tsCol).cast("double")
    def mts(s: String) = col(s).getField("__p___ts").cast("double")
    val bOk = col("__b").isNotNull && abs(pts - mts("__b")) <= toleranceSeconds
    val fOk = col("__asof").isNotNull &&
      abs(pts - mts("__asof")) <= toleranceSeconds
    val pick = when(bOk && (!fOk || abs(pts - mts("__b")) <=
        abs(pts - mts("__asof"))), col("__b"))
      .otherwise(when(fOk, col("__asof")))
    fwd.withColumn("__pick", pick)
      .select(left.columns.toSeq.map(col) ++
        Seq(col("__pick").getField("__p___ts").as("asof_ts")) ++
        payloadCols.map(c =>
          col("__pick").getField(s"__p_$c").as(s"asof_$c")): _*)
  }

  /** Shared union-sort-carry pass. Returns the probe rows with the
    * matched reference row (payloads + matched ts) as a `__asof`
    * struct; `ascending = true` is the backward direction, false the
    * forward one. Probe-side columns beyond the key/ts (including any
    * carried struct from a previous pass) ride the union unchanged,
    * NULL on reference rows.
    */
  private def directional(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      ascending: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryCols = payloadCols :+ "__ts"
    val probe = left.select(
      leftCols.map(col) ++ Seq(lit(1).as("__side")) ++
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        Seq(lit(null).cast(left.schema(tsCol).dataType).as("__p___ts")): _*)
    val matchable = right.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val ref = matchable.select(probe.columns.toSeq.map {
      case c if c == keyCol || c == tsCol => col(c)
      case "__side" => lit(0).as("__side")
      case "__p___ts" => col(tsCol).as("__p___ts")
      case c if c.startsWith("__p_") => col(c.stripPrefix("__p_")).as(c)
      case c => lit(null).cast(probe.schema(c).dataType).as(c)
    }: _*)
    val payloadOrder = payloadCols.map(c =>
      if (ascending) col(s"__p_$c").asc else col(s"__p_$c").desc)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(Seq(
        if (ascending) col(tsCol).asc else col(tsCol).desc,
        col("__side").asc) ++ payloadOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val refRow = when(col("__side") === 0,
      struct((payloadCols.map(c => col(s"__p_$c")) :+ col("__p___ts")): _*))
    probe.unionByName(ref)
      .withColumn("__asof", last(refRow, ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col("__asof"): _*)
  }
}
