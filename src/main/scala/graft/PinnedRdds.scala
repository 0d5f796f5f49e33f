package graft

import org.apache.spark.sql.SparkSession

/** Registry of persisted RDD ids that outlive per-query cleanup.
  *
  * Derived tables shared by several queries (e.g. the co-purchase graph
  * behind g_cc / g_triangles / g_label_prop) are materialized once per
  * (session, input dir) — the library equivalent of a materialized
  * view. The Bench/Verify harnesses unpersist loop state between
  * queries; ids registered here are skipped so the shared table
  * survives the run.
  *
  * Ids are scoped by applicationId: RDD ids restart at 0 in a new
  * SparkContext, so an unscoped set would wrongly shield a later
  * context's unrelated RDDs from cleanup.
  */
object PinnedRdds {
  private val ids = scala.collection.mutable.Set.empty[(String, Int)]

  private def app(spark: SparkSession): String = spark.sparkContext.applicationId

  /** Run `body` (which materializes via localCheckpoint) and pin every
    * persistent RDD it created.
    */
  def pinning[T](spark: SparkSession)(body: => T): T = synchronized {
    val a = app(spark)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val out = body
    ids ++= spark.sparkContext.getPersistentRDDs.keySet
      .filterNot(before).map(a -> _)
    out
  }

  def isPinned(spark: SparkSession, id: Int): Boolean =
    synchronized { ids.contains(app(spark) -> id) }

  /** Unpersist everything except pinned ids — the harness cleanup.
    * BLOCKING: async unpersist overlaps block eviction with the next
    * query's execution, and over a 50+ query run that background
    * block-manager churn inflates individual query times (the round-2
    * full-run bench recorded 3-10× the isolated A/B numbers). Callers
    * run this outside any measured window, so the synchronous wait
    * costs measurements nothing.
    */
  def dropUnpinned(spark: SparkSession): Unit = synchronized {
    val a = app(spark)
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!ids.contains(a -> id)) rdd.unpersist(blocking = true)
    }
  }
}
