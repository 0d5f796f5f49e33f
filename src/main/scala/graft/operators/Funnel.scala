package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users
  * performed step 1, then step 2 strictly after their step-1 time, then
  * step 3 after that, … — the standard behavioral-conversion query a
  * WAL-of-events store answers (the reference's events are grapho WAL
  * statements; re-expressed here over the `events` table).
  *
  * Shape at scale: each step is one filtered aggregation of the event
  * table joined to the (shrinking) survivor set of the previous step —
  * k steps = k passes that each shuffle only on the user key, with the
  * survivor side always ≤ the distinct-user count (broadcast-able for
  * any realistic funnel). No window over the whole event history, no
  * per-user event arrays collected: memory is bounded by the survivor
  * set, not by a user's event volume — the property that matters when
  * one bot user has 10M events.
  */
object Funnel {

  /** Per-step earliest completion times: frame i holds (user, t{i+1})
    * for exactly the users who reached step i+1, where t{i+1} is the
    * earliest `steps(i)`-typed event strictly after that user's t{i}.
    * Each frame is checkpointed — it feeds both the next step's join
    * and the caller's counting, and Catalyst treats those uses as
    * independent subtrees.
    */
  def stepTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("user")).agg(min(col(tsCol)).as("t1"))
      .localCheckpoint()
    steps.tail.zipWithIndex.foldLeft(Seq(first)) { case (acc, (step, i)) =>
      val prev = acc.last
      val n = i + 2 // step number of `step` (1-based)
      val nxt = events.filter(col(typeCol) === step)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      val cur = prev
        .join(nxt, prev("user") === col("__u") && col("__ts") > prev(s"t${n - 1}"))
        .groupBy(prev("user").as("user")).agg(min(col("__ts")).as(s"t$n"))
        .localCheckpoint()
      acc :+ cur
    }
  }

  /** Step-transition latency distribution: for each i→i+1 transition,
    * over exactly the users who completed step i+1, the earliest-time
    * gap t{i+1} − t{i} — the time-to-convert profile that turns funnel
    * COUNTS into a product decision (where do users stall?). Joins the
    * already-checkpointed survivor frames pairwise on the user key
    * (frame i+1's users ⊆ frame i's, so the join side is the smaller
    * survivor set); exact interpolated percentiles for the gate,
    * `approx_percentile` being the at-scale swap as with the MAD
    * screen. Latencies are second-valued doubles (µs-precise timestamp
    * difference), round-sealed.
    */
  def latencies(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "latencies need at least two steps")
    val frames = stepTimes(events, userCol, typeCol, tsCol, steps)
    (1 until frames.length).map { i =>
      val lat = frames(i).join(frames(i - 1), "user")
        .select((col(s"t${i + 1}").cast("double") -
          col(s"t$i").cast("double")).as("lat"))
      lat.agg(
          count(lit(1)).as("users"),
          round(percentile(col("lat"), lit(0.5)), 2).as("p50_sec"),
          round(percentile(col("lat"), lit(0.9)), 2).as("p90_sec"),
          round(max(col("lat")), 2).as("max_sec"))
        .select(lit(i.toLong).as("step"),
          lit(s"${steps(i - 1)}->${steps(i)}").as("transition"),
          col("users"), col("p50_sec"), col("p90_sec"), col("max_sec"))
    }.reduce(_ unionByName _)
  }

  /** Funnel conversion counts: (step, step_name, users) per step. */
  def counts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame =
    stepTimes(events, userCol, typeCol, tsCol, steps).zipWithIndex.map {
      case (frame, i) =>
        frame.agg(count(lit(1)).as("users"))
          .select(lit((i + 1).toLong).as("step"),
            lit(steps(i)).as("step_name"), col("users"))
    }.reduce(_ unionByName _)
}
