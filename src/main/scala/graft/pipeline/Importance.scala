package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
  * re-expressed as one Spark plan: score every document by how much
  * more likely its hashed n-gram features are under a TARGET
  * distribution (the data you want more of — a quality subset, a
  * domain, a language) than under the RAW corpus distribution, so a
  * downstream sampler can resample the corpus toward the target.
  *
  * The published recipe hashes n-grams into a small feature space and
  * fits two bag-of-features models; the importance weight of a document
  * is the mean log-likelihood ratio of its features. Everything here is
  * a pure function of (corpus, constants):
  *
  *  - features are word BIGRAMS (the same adjacent-pair zip as
  *    [[TextAnalysis.bigramLm]]) hashed to 256 buckets by md5 hex
  *    prefix — the engine-portable hash this repo already uses for
  *    split assignment (Splits.scala), so the DuckDB oracle reproduces
  *    bucketing exactly, string-keyed, no integer-conversion quirks;
  *  - both models are add-alpha smoothed bucket multinomials; the two
  *    257-term denominators and the 256-row probability tables are
  *    bounded by CONSTRUCTION (independent of corpus size) and ride
  *    back as broadcasts;
  *  - the per-doc score is the mean over its bigram occurrences of
  *    ln(p_target(bucket) / p_raw(bucket)).
  *
  * Scale shape: TWO narrow corpus passes and nothing token-level ever
  * materializes. Pass one fits BOTH models in a single conditional
  * aggregation to 256 rows (the totals then derive from that table,
  * not from the corpus); pass two re-explodes for scoring — a
  * broadcast-hash join against the 256-row ratio table plus one
  * groupBy(doc). Recomputing the narrow explode beats checkpointing
  * the exploded (corpus × tokens)-row table, the same trade
  * [[graft.queries.Pipeline.pDedupNgram]] documents for re-shingling.
  * Docs with < 2 tokens have no features and drop out, matching
  * [[TextAnalysis.bigramLm]] and the oracle CTE.
  */
object Importance {

  val Buckets = 256

  /** md5-hex-prefix feature bucket of a word bigram — two hex chars =
    * 256 string-keyed buckets, identical in Spark and DuckDB.
    */
  private def bucketOf(prev: Column, cur: Column): Column =
    substring(md5(concat_ws(" ", prev, cur)), 1, 2)

  /** (id, n_feats, dsir_weight): mean log-ratio importance weight per
    * document. `isTarget` marks the rows whose feature distribution the
    * corpus should be resampled toward.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, alpha: Double = 1.0): DataFrame = {
    val t = df.select(col(idCol).as("id"), isTarget.as("is_target"),
        split(lower(trim(col(textCol))), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
    val bi = t.select(col("id"), col("is_target"),
        explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => bucketOf(a, b))).as("bucket"))
    // both models in ONE aggregation pass: rc counts every occurrence,
    // tc only the target ones (buckets unseen in the target smooth to
    // alpha / (tn + alpha·Buckets) via tc = 0)
    val models = bi.groupBy(col("bucket")).agg(
      count(lit(1)).as("rc"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tc"))
    // totals from the 256-row model table — NOT another corpus pass
    val totals = models.agg(sum(col("tc")).as("tn"), sum(col("rc")).as("rn"))
    val ratio = models.crossJoin(broadcast(totals))
      .select(col("bucket"),
        log((col("tc") + alpha) / (col("tn") + alpha * Buckets))
          .minus(log((col("rc") + alpha) / (col("rn") + alpha * Buckets)))
          .as("log_ratio"))
    bi.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"),
        round(avg(col("log_ratio")), 6).as("dsir_weight"))
  }

  /** The same computation as ANSI SQL over `table`, target rows selected
    * by `targetPred` — kept adjacent to the Scala so the two cannot
    * drift silently.
    */
  def dsirSql(table: String, idCol: String, textCol: String,
      targetPred: String, alpha: Double = 1.0): String =
    s"""WITH t AS (
         SELECT $idCol AS id, ($targetPred) AS is_target,
                regexp_split_to_array(lower(trim($textCol)), '\\s+') AS w
         FROM $table),
       t2 AS (SELECT id, is_target, w FROM t WHERE len(w) >= 2),
       bi AS MATERIALIZED (
         SELECT id, is_target,
                substr(md5(w[i + 1] || ' ' || w[i + 2]), 1, 2) AS bucket
         FROM (SELECT id, is_target, w, unnest(range(len(w) - 1)) AS i FROM t2)),
       tgt AS (SELECT bucket, count(*) AS tc FROM bi WHERE is_target GROUP BY 1),
       raw AS (SELECT bucket, count(*) AS rc FROM bi GROUP BY 1),
       totals AS (
         SELECT sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tn, count(*) AS rn
         FROM bi),
       ratio AS (
         -- CAST to DOUBLE before dividing: bare numeric literals type as
         -- DECIMAL in DuckDB and the exact-decimal division would differ
         -- from Spark's double arithmetic at ULP scale
         SELECT bucket,
                ln((coalesce(tc, 0) + CAST($alpha AS DOUBLE)) /
                   (tn + CAST($alpha AS DOUBLE) * $Buckets)) -
                ln((rc + CAST($alpha AS DOUBLE)) /
                   (rn + CAST($alpha AS DOUBLE) * $Buckets)) AS log_ratio
         FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN totals)
       SELECT id AS $idCol, count(*) AS n_feats,
              round(avg(log_ratio), 6) AS dsir_weight
       FROM bi JOIN ratio USING (bucket)
       GROUP BY 1"""
}
