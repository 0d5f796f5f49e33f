package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot ⊕ change-log compaction — MERGE semantics over a base table
  * and an ordered CDC stream of after-images: the last change per key
  * wins, `D` removes the key, `I`/`U` upsert the change's payload, and
  * keys the log never touches keep their base row. This generalizes the
  * reference's replay-on-boot (server/commitlog.go: every statement
  * re-applied in order) into the one-shuffle batch form a lakehouse
  * compaction job runs: replaying N statements per key is equivalent to
  * applying only the last state-determining one.
  *
  * Shape at scale: one window over the change log partitioned by key
  * (shuffles only the log, which is incremental and small relative to
  * the snapshot), then one key join with the base. The base table is
  * never windowed or re-sorted; with both sides bucketed by key the
  * join is exchange-free.
  */
object CdcMerge {

  /** @param base      snapshot; `keyCol` plus payload columns
    * @param changes   after-image change log: `keyCol`, the same payload
    *                  columns as `base`, `opCol` ∈ {I, U, D}, and
    *                  `orderCols` (e.g. ts + a log sequence number for a
    *                  deterministic total order per key)
    * @param orderCols change order per key, later-wins (compared desc)
    */
  /** Seed the incremental-compaction state from a base snapshot: base
    * rows carry null order columns (any real change out-orders them)
    * and op 'U'. Order-column types are borrowed from the change-log
    * schema. Schema: key, payload..., orderCols..., op.
    */
  def initState(base: DataFrame, changes: DataFrame, keyCol: String,
      orderCols: Seq[String], opCol: String): DataFrame =
    base.select(col(keyCol) +:
      (base.columns.filterNot(_ == keyCol).toSeq.map(col) ++
        orderCols.map(c => lit(null).cast(changes.schema(c).dataType).as(c)) :+
        lit("U").as(opCol)): _*)

  /** One micro-batch step of incremental compaction: last-wins over
    * state ∪ batch, per key. The state RETAINS the winning change's
    * order columns and keeps 'D' rows as tombstones, which is what makes
    * the step ASSOCIATIVE — folding batches b1, b2 through this equals
    * compacting over b1 ∪ b2 whatever the batch boundaries, so an
    * out-of-order earlier update in a later micro-batch can neither
    * resurrect a deleted key nor overwrite a newer value. This is the
    * `foreachBatch` MERGE pattern a streaming lakehouse sink runs;
    * [[visible]] projects the queryable face. One window over
    * state ∪ batch, shuffled on the key only.
    */
  def compact(state: DataFrame, batch: DataFrame, keyCol: String,
      orderCols: Seq[String], opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col(_).desc_nulls_last): _*)
    state.unionByName(batch.select(state.columns.toIndexedSeq.map(col): _*))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The queryable face of a compaction state: live rows, key + payload
    * only (order bookkeeping and tombstones stripped).
    */
  def visible(state: DataFrame, orderCols: Seq[String], opCol: String): DataFrame =
    state.filter(col(opCol) =!= "D").drop(orderCols :+ opCol: _*)

  def merge(base: DataFrame, changes: DataFrame, keyCol: String,
      orderCols: Seq[String], opCol: String): DataFrame = {
    require(orderCols.nonEmpty, "CDC merge needs a change order")
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col(_).desc): _*)
    val last = changes
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(keyCol).as("__ck") +:
        (payload.map(p => col(p).as(s"__c_$p")) :+ col(opCol).as("__op")): _*)
    val b = base.select(col(keyCol).as("__bk") +:
      payload.map(p => col(p).as(s"__b_$p")): _*)
    b.join(last, col("__bk") === col("__ck"), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(coalesce(col("__bk"), col("__ck")).as(keyCol) +:
        payload.map(p =>
          when(col("__op").isNotNull, col(s"__c_$p"))
            .otherwise(col(s"__b_$p")).as(p)): _*)
  }
}
