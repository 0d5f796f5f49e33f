package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * Assignment is a pure function of the row's key (md5 hex prefix
  * compared against fraction thresholds), so it is stable across runs,
  * engines, partitionings, and cluster topologies — unlike
  * `sample()`/`rand()`, whose output depends on partition layout and
  * seed plumbing. A document keeps its split when the corpus is
  * re-ingested or re-partitioned, which is what makes held-out sets
  * trustworthy across pipeline versions. Granularity is 1/256 (two hex
  * chars); finer fractions would extend the prefix.
  */
object Splits {

  /** Hex threshold for a cumulative percentage, e.g. 80% → "cc". 100%
    * yields "g", which sorts after every 2-char hex bucket — f"%02x" of
    * 256 would be the 3-char "100", which compares LOWER than most
    * buckets lexicographically.
    */
  private def hexThreshold(pct: Int): String = {
    val v = pct * 256 / 100
    if (v >= 256) "g" else f"$v%02x"
  }

  /** The md5-prefix bucket column for a key. */
  def bucket(key: Column): Column = substring(md5(key.cast("string")), 1, 2)

  /** Assign 'train' / 'val' / 'test' by content-hash bucket.
    * trainPct + valPct must leave room for the test remainder.
    */
  def assign(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val b = bucket(col(keyCol))
    df.withColumn("split",
      when(b < lit(hexThreshold(trainPct)), "train")
        .when(b < lit(hexThreshold(trainPct + valPct)), "val")
        .otherwise("test"))
  }

  /** The DuckDB mirror of [[assign]] — generated from the SAME threshold
    * constants so the oracle can never drift from the implementation.
    */
  def assignSql(table: String, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10): String = {
    val t = hexThreshold(trainPct)
    val v = hexThreshold(trainPct + valPct)
    s"""SELECT $keyCol,
          CASE WHEN substr(md5(CAST($keyCol AS VARCHAR)), 1, 2) < '$t' THEN 'train'
               WHEN substr(md5(CAST($keyCol AS VARCHAR)), 1, 2) < '$v' THEN 'val'
               ELSE 'test' END AS split
        FROM $table"""
  }

  /** Deterministic stratified downsampling — mixture construction for a
    * training corpus: each stratum (source, language, quality tier)
    * keeps `rates(stratum)` percent of its rows, strata not listed keep
    * `defaultPct`. Same content-hash mechanics as [[assign]]: whether a
    * row survives is a pure function of its key, so the mixture is
    * reproducible across runs, engines, and repartitionings, and a
    * row's fate never changes when other rows come or go. One narrow
    * filter — no shuffle, no sampling state.
    */
  def sampleStratified(df: DataFrame, keyCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultPct: Int): DataFrame = {
    val threshold = rates.foldRight(lit(hexThreshold(defaultPct))) {
      case ((stratum, pct), acc) =>
        when(col(strataCol) === stratum, lit(hexThreshold(pct))).otherwise(acc)
    }
    df.filter(bucket(col(keyCol)) < threshold)
  }

  /** DuckDB mirror of [[sampleStratified]], generated from the same
    * constants.
    */
  def sampleStratifiedSql(table: String, keyCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultPct: Int, selectCols: String): String = {
    val cases = rates.map { case (s, p) =>
      s"WHEN $strataCol = '$s' THEN '${hexThreshold(p)}'"
    }.mkString(" ")
    s"""SELECT $selectCols FROM $table
        WHERE substr(md5(CAST($keyCol AS VARCHAR)), 1, 2) <
          CASE $cases ELSE '${hexThreshold(defaultPct)}' END"""
  }

  /** Token-budget mixture: each stratum keeps a deterministic hash
    * slice sized so its kept weight (token mass) approximates `budget`
    * — the data-derived form of [[sampleStratified]], where the keep
    * rate is min(1, budget / Σ weight) per stratum instead of a given
    * constant. The rate quantizes to the same 1/256 bucket grid, so a
    * row's fate stays a pure function of (its key, its stratum's
    * total): stable across runs, engines, and partitionings. Shape: one
    * aggregation over the (bounded) strata, broadcast back, one narrow
    * filter — the corpus never shuffles.
    */
  def sampleByBudget(df: DataFrame, keyCol: String, strataCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(weightCol)).as("__tot"))
    val v = floor(lit(256.0) * least(lit(1.0),
      lit(budget.toDouble) / col("__tot").cast("double"))).cast("int")
    df.join(broadcast(totals), strataCol)
      .withColumn("__thr",
        when(v >= 256, lit("g")).otherwise(format_string("%02x", v)))
      .filter(bucket(col(keyCol)) < col("__thr"))
      .drop("__tot", "__thr")
  }

  /** DuckDB mirror of [[sampleByBudget]]: same grid, same arithmetic
    * (both engines compute the rate in IEEE doubles from the same
    * integers, so floor(256·rate) agrees bit-for-bit).
    */
  def sampleByBudgetSql(table: String, keyCol: String, strataCol: String,
      weightExpr: String, budget: Long, selectCols: String): String =
    s"""WITH w AS (SELECT *, $weightExpr AS __w FROM $table),
        tot AS (SELECT $strataCol, CAST(floor(256.0 * least(1.0,
                  $budget.0 / CAST(sum(__w) AS DOUBLE))) AS INT) AS v
                FROM w GROUP BY $strataCol)
        SELECT $selectCols FROM w JOIN tot USING ($strataCol)
        WHERE substr(md5(CAST($keyCol AS VARCHAR)), 1, 2) <
          CASE WHEN v >= 256 THEN 'g' ELSE printf('%02x', v) END"""

  /** Temperature-scaled mixture (the multilingual-sampling α rule,
    * Conneau & Lample 2019): each stratum's target share of the kept
    * budget is mass^α / Σ mass^α — α < 1 upsamples small strata
    * relative to proportional sampling, α = 1 reduces to
    * [[sampleByBudget]]'s proportional rule. Keep rate_s =
    * min(1, budget·share_s / mass_s), quantized to the same 1/256 hash
    * grid, so a row's fate stays a pure function of (key, stratum
    * totals). Same shape as the other samplers: strata-bounded aggs
    * broadcast back, one narrow filter, the corpus never shuffles.
    */
  def sampleByTemperature(df: DataFrame, keyCol: String, strataCol: String,
      weightCol: String, alpha: Double, budget: Long): DataFrame = {
    require(budget > 0 && alpha > 0, "budget and alpha must be positive")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(weightCol)).as("__m"))
    val z = totals.agg(sum(pow(col("__m").cast("double"), alpha)).as("__z"))
    val rate = least(lit(1.0),
      lit(budget.toDouble) * pow(col("__m").cast("double"), alpha) /
        col("__z") / col("__m").cast("double"))
    val v = floor(lit(256.0) * rate).cast("int")
    df.join(broadcast(totals), strataCol)
      .crossJoin(broadcast(z))
      .withColumn("__thr",
        when(v >= 256, lit("g")).otherwise(format_string("%02x", v)))
      .filter(bucket(col(keyCol)) < col("__thr"))
      .drop("__m", "__z", "__thr")
  }

  /** DuckDB mirror of [[sampleByTemperature]] — same grid, same
    * arithmetic, same operation order (pow/division ULP agreement is
    * what keeps floor(256·rate) engine-stable).
    */
  def sampleByTemperatureSql(table: String, keyCol: String, strataCol: String,
      weightExpr: String, alpha: Double, budget: Long, selectCols: String): String =
    s"""WITH w AS (SELECT *, $weightExpr AS __w FROM $table),
        tot AS (SELECT $strataCol, CAST(sum(__w) AS DOUBLE) AS m
                FROM w GROUP BY $strataCol),
        z AS (SELECT sum(pow(m, $alpha)) AS z FROM tot),
        thr AS (SELECT $strataCol, CAST(floor(256.0 * least(1.0,
                  $budget.0 * pow(m, $alpha) / z / m)) AS INT) AS v
                FROM tot CROSS JOIN z)
        SELECT $selectCols FROM w JOIN thr USING ($strataCol)
        WHERE substr(md5(CAST($keyCol AS VARCHAR)), 1, 2) <
          CASE WHEN v >= 256 THEN 'g' ELSE printf('%02x', v) END"""

  /** Fixed-COUNT deterministic stratified sample: exactly min(n, |s|)
    * rows per stratum s, selected by md5 order of the key — eval/holdout
    * construction where the budget is a row count, not a keep rate.
    * Unlike the rate samplers above, a row's fate depends on its hash
    * RANK among stratum siblings (adding rows can displace one), which
    * is the contract a fixed-size eval set wants: the set stays exactly
    * n and changes minimally under corpus growth. Full-hex md5 order
    * with the key as tiebreak makes selection total and engine-stable.
    * Spark plans the rank filter as WindowGroupLimit: a partial top-n
    * runs per input partition BEFORE the stratum exchange, so the
    * shuffle carries at most n rows per (stratum, partition) — never
    * the corpus.
    */
  def sampleTopN(df: DataFrame, keyCol: String, strataCol: String,
      n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** DuckDB mirror of [[sampleTopN]] — same order, same tiebreak. */
  def sampleTopNSql(table: String, keyCol: String, strataCol: String,
      n: Int, selectCols: String): String =
    s"""SELECT $selectCols FROM (
          SELECT *, row_number() OVER (PARTITION BY $strataCol
            ORDER BY md5(CAST($keyCol AS VARCHAR)), $keyCol) AS __rn
          FROM $table)
        WHERE __rn <= $n"""

  /** Weight-proportional fixed-count sample (Efraimidis-Spirakis A-ES,
    * 2006), derandomized: per stratum keep the n rows with the largest
    * u^(1/weight), where u is the md5-derived uniform of the KEY (first
    * 13 hex chars = 52 bits scaled to [0,1)) — rows with twice the
    * weight are twice as likely to survive, yet the draw is a pure
    * function of (key, weight) and therefore reproducible across runs,
    * engines, and partitionings, like every sampler in this file.
    * The heavy-tailed corpus use case: quality- or length-weighted
    * subsampling where a fixed budget must favor the valuable rows
    * without going deterministic-top-N on the weight itself.
    *
    * Plan shape: identical to [[sampleTopN]] — the row_number ≤ n
    * filter plans as WindowGroupLimit, a partial per-partition top-n
    * BEFORE the stratum exchange, so the shuffle carries at most n rows
    * per (stratum, input partition). The sort key is ROUNDED to 9dp
    * (ties then broken by the key) so cross-engine pow()-ULP noise
    * cannot flip the cutoff — the same ULP discipline as the top-k
    * oracles.
    */
  def weightedSample(df: DataFrame, keyCol: String, strataCol: String,
      weightCol: String, n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    import org.apache.spark.sql.expressions.Window
    val u = conv(substring(md5(col(keyCol).cast("string")), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0) // 2^52
    val skey = round(pow(u, lit(1.0) / col(weightCol).cast("double")), 9)
    val w = Window.partitionBy(col(strataCol)).orderBy(skey.desc, col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** DuckDB mirror of [[weightedSample]] — same uniform, same rounded
    * sort key, same tiebreak.
    */
  def weightedSampleSql(table: String, keyCol: String, strataCol: String,
      weightCol: String, n: Int, selectCols: String): String =
    s"""SELECT $selectCols FROM (
          SELECT *, row_number() OVER (PARTITION BY $strataCol
            ORDER BY round(pow(
                CAST(CAST('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 13) AS BIGINT)
                  AS DOUBLE) / 4503599627370496.0,
                1.0 / CAST($weightCol AS DOUBLE)), 9) DESC, $keyCol) AS __rn
          FROM $table)
        WHERE __rn <= $n"""
}
