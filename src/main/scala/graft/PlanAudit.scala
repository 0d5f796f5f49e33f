package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution

/** Test-settable probe on the per-round plans of the iterative loop
  * families (rank / peel / frontier / stream-fold). The loop bodies
  * checkpoint a DataFrame every round; [[tap]] wraps those call sites
  * and hands the round's QueryExecution to the registered hook so
  * LoopBodyPlanSpec can run the same structural plan-hygiene walker
  * the global q_/p_ sweep uses — the loop plans are otherwise
  * invisible to plan tests (they exist only transiently inside the
  * loop scope, and the faces are too expensive to re-plan wholesale).
  *
  * Production cost is one null check per round; the hook is only ever
  * set by tests. The tapped QueryExecution is the one the loop itself
  * materializes (localCheckpoint executes it), so inspecting it after
  * the face returns sees the FINAL plan, adaptive or not.
  */
object PlanAudit {
  @volatile var hook: (String, QueryExecution) => Unit = null

  def tap(tag: String, df: DataFrame): DataFrame = {
    val h = hook
    if (h != null) h(tag, df.queryExecution)
    df
  }
}
