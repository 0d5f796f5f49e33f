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
  */
object PinnedRdds {
  private val ids = scala.collection.mutable.Set.empty[Int]

  /** Run `body` (which materializes via localCheckpoint) and pin every
    * persistent RDD it created.
    */
  def pinning[T](spark: SparkSession)(body: => T): T = synchronized {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = body
    ids ++= (spark.sparkContext.getPersistentRDDs.keySet -- before)
    out
  }

  def isPinned(id: Int): Boolean = synchronized { ids.contains(id) }

  /** Unpersist everything except pinned ids — the harness cleanup. */
  def dropUnpinned(spark: SparkSession): Unit = synchronized {
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!ids.contains(id)) rdd.unpersist(blocking = false)
    }
  }
}
