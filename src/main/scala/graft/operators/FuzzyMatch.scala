package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution by bounded edit distance):
  * candidate pairs come from a composite blocking key (last word + name
  * length) so the pairwise work is per-block quadratic, never
  * corpus-quadratic — the blocking-then-verify shape every dedupe/ER
  * system runs, with `levenshtein` codegen'd on candidate pairs only.
  * (Same-length blocking admits exactly the substitution-edit matches;
  * the recall tradeoff of any blocking key, stated rather than hidden.)
  *
  * Edit distance is common-suffix-invariant (d(x·s, y·s) = d(x, y)) and
  * the blocking key IS the shared suffix, so the per-pair DP runs on the
  * short distinct prefix only — same result, ~3× less work.
  *
  * Skew guard: blocked ER is the pipeline operator most likely to meet
  * a hot key in the wild (think "llc" / "inc" suffix blocks over a
  * company register) — one hot block goes quadratic silently. Pass
  * `maxBlockSize` to opt in to the same cap-and-audit treatment as the
  * LSH bucket generators ([[graft.pipeline.Dedup]]): blocks above the
  * cap are excluded from pair generation, and [[oversizedBlocks]] is
  * the audit face that makes the exclusions observable (route them to a
  * tighter key or a sampled pass — never silently quadratic, never
  * silently dropped). Uncapped runs skip the population join entirely,
  * so the default plan is unchanged.
  */
object FuzzyMatch {

  /** (blk, len, id, name, pre) blocking view — shared by the candidate
    * join and the audit face.
    */
  private def blocked(df: DataFrame, idCol: String, nameCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(nameCol).as("name"),
        element_at(split(col(nameCol), " "), -1).as("blk"),
        length(col(nameCol)).as("len"))
      .withColumn("pre",
        substring(col("name"), lit(1), length(col("name")) - length(col("blk"))))

  /** Candidate pairs within `maxDist` edits, blocked by (last word,
    * length). Output: (key_a, key_b, name_a, name_b, dist), key_a <
    * key_b.
    */
  def matchPairs(df: DataFrame, idCol: String, nameCol: String,
      maxDist: Int = 2, maxBlockSize: Long = Long.MaxValue): DataFrame = {
    val p0 = blocked(df, idCol, nameCol)
    val p =
      if (maxBlockSize == Long.MaxValue) p0
      else {
        // population join rides the same (blk, len) key the self-join
        // shuffles on; singleton blocks can't pair, so the >= 2 shrink
        // is lossless
        val sizes = p0.groupBy(col("blk"), col("len"))
          .agg(count(lit(1)).as("__bn"))
        p0.join(sizes, Seq("blk", "len"))
          .filter(col("__bn") >= 2 && col("__bn") <= maxBlockSize)
          .drop("__bn")
      }
    val a = p.select(col("blk"), col("len"),
      col("id").as("key_a"), col("name").as("name_a"), col("pre").as("pre_a"))
    val b = p.select(col("blk"), col("len"),
      col("id").as("key_b"), col("name").as("name_b"), col("pre").as("pre_b"))
    a.join(b.hint("shuffle_hash"), Seq("blk", "len"))
      .filter(col("key_a") < col("key_b") && col("name_a") =!= col("name_b"))
      .withColumn("dist", levenshtein(col("pre_a"), col("pre_b")))
      .filter(col("dist") <= maxDist)
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        col("dist").cast("long").as("dist"))
  }

  /** (blk, len, population) of blocks a `maxBlockSize` cap would drop —
    * run alongside a capped [[matchPairs]] so the skipped mass is
    * counted and routable, never silently discarded.
    */
  def oversizedBlocks(df: DataFrame, idCol: String, nameCol: String,
      maxBlockSize: Long): DataFrame =
    blocked(df, idCol, nameCol)
      .groupBy(col("blk"), col("len")).agg(count(lit(1)).as("population"))
      .filter(col("population") > maxBlockSize)
}
