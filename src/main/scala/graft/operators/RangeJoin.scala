package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join as a bucketized equi-join.
  *
  * Spark plans a pure range predicate (`p.ts BETWEEN i.start AND i.end`
  * with no equality key) as BroadcastNestedLoopJoin — a cross-product
  * scan that dies at scale. The standard fix: quantize time into
  * buckets of `bucketWidth` seconds, explode each interval to the
  * buckets it covers, map each point to its single bucket, equi-join on
  * (bucket ++ extra keys), and apply the exact range predicate after.
  * Shuffle volume is O(points + intervals × avg-buckets-per-interval),
  * and each point lands in exactly one bucket so no dedup pass is
  * needed. Pick bucketWidth ≈ the typical interval length: shorter
  * wastes interval replicas, longer inflates bucket population.
  *
  * `extraKeys` (equality columns present on both sides) fold into the
  * join key — with them this is a per-key range join (e.g. attribution
  * windows per user); without them it is the keyless case Spark cannot
  * otherwise execute at scale.
  */
object RangeJoin {

  /** Join points (`tsCol`, epoch-seconds castable) to intervals
    * (`[startCol, endCol]`, inclusive both ends). Returns point columns
    * + interval columns (interval side prefixed where names collide is
    * the caller's concern — pre-alias).
    */
  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidthSeconds: Long, extraKeys: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    val w = lit(bucketWidthSeconds)
    // Plan-level aliases, not dataset-scoped refs (p("c") === i("c")):
    // when both inputs derive from the same source — the classic
    // self-join shape, e.g. clicks and purchase windows both from an
    // events table — dataset-id disambiguation degenerates into
    // Spark's "trivially true predicate" self-join hazard. Alias
    // qualifiers make every join-condition reference unambiguous by
    // construction.
    val p = points.withColumn("__bucket",
      floor(col(tsCol).cast("double") / w)).alias("__rj_p")
    val lo = floor(col(startCol).cast("double") / w)
    val hi = floor(col(endCol).cast("double") / w)
    // fail fast on degenerate intervals (open-ended sentinels like
    // 9999-12-31): one such row would otherwise materialize an
    // arbitrarily long bucket array before explode and OOM the executor
    val guarded = assert_true(hi - lo <= lit(maxBucketsPerInterval),
      concat(lit(s"interval spans more than $maxBucketsPerInterval buckets of " +
        s"$bucketWidthSeconds s — widen bucketWidthSeconds or cap the interval: "),
        col(startCol), lit(" .. "), col(endCol)))
    val i = intervals.withColumn("__bucket",
      explode(when(guarded.isNull, sequence(lo, hi)))).alias("__rj_i")
    def pc(c: String) = col(s"__rj_p.`$c`")
    def ic(c: String) = col(s"__rj_i.`$c`")
    val joinCond = (Seq(pc("__bucket") === ic("__bucket")) ++
      extraKeys.map(k => pc(k) === ic(k)))
      .reduce(_ && _)
    val joined = p.join(i, joinCond)
      .filter(pc(tsCol) >= ic(startCol) && pc(tsCol) <= ic(endCol))
      .drop(pc("__bucket")).drop(ic("__bucket"))
    // keep the point side's copy of each shared equality key
    extraKeys.foldLeft(joined)((df, k) => df.drop(ic(k)))
  }
}
