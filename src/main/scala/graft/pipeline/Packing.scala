package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the step between a filtered corpus and a
  * training run: concatenate documents into fixed-budget context
  * windows (packs) so short documents don't waste sequence slots.
  *
  * Packing is inherently sequential (whether doc N opens a new pack
  * depends on every doc before it), so it cannot be a window/cumsum
  * plan — the exact greedy recurrence `acc' = if (acc + tk > budget) tk
  * else acc + tk` has data-dependent resets. The distributed design
  * makes the sequence SHORT instead of avoiding it: documents shard by
  * `id / shardSize` (a pure function of the id — NOT partition layout),
  * each shard is packed greedily in id order, and pack identity is
  * (shard, index-within-shard). Sharding bounds the sequential chain at
  * `shardSize` docs; shards themselves scale out without limit. This is
  * the legitimate `mapPartitions` case: per-shard sequential state that
  * Catalyst has no operator for, over rows already partitioned+sorted
  * by the shard key — and because pack assignment is a pure function of
  * the (id, tokens) table, it is engine-reproducible and
  * oracle-checkable (the oracle replays the same recurrence as a
  * recursive CTE).
  *
  * Oversized documents (tokens > budget) get a pack of their own — a
  * pack is never split, matching what a tokenizer-side truncation step
  * would see.
  */
object Packing {

  /** Pack (id, tokens) rows into ≤ `budget`-token packs per shard.
    * Returns (id, shard, pack_idx, pack_tokens-so-far is internal).
    *
    * Ids must be non-negative. The shard key uses integral division
    * (`div`), exact at any id magnitude — a double true-division would
    * lose precision past 2^53 and silently mis-shard. The DuckDB mirror
    * uses `//` (floor division); for non-negative ids trunc and floor
    * agree, which is why the non-negativity requirement exists.
    */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shardSize: Long, spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(budget > 0 && shardSize > 0, "budget and shardSize must be positive")
    df.select(col(idCol).cast("long").as("id"),
        expr(s"CAST(`$idCol` AS BIGINT) div $shardSize").as("shard"),
        col(tokensCol).cast("long").as("tk"))
      .as[(Long, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .mapPartitions { it =>
        // a partition holds whole shards (hash-partitioned on shard),
        // possibly several: reset the greedy state on shard change
        var shard = Long.MinValue
        var packIdx = -1L
        var acc = 0L
        it.map { case (id, sh, tk) =>
          if (sh != shard) { shard = sh; packIdx = 0L; acc = tk }
          else if (acc + tk > budget) { packIdx += 1L; acc = tk }
          else acc += tk
          (id, sh, packIdx)
        }
      }
      .toDF("id", "shard", "pack_idx")
  }

  /** Packing-efficiency audit over a [[packGreedy]] assignment: per
    * shard, packs / docs / packed token mass / waste (unused budget
    * summed over packs — an oversized single-doc pack wastes 0, it
    * overflows by design) and the fill rate as a rounded ratio of
    * exact integers. One doc-keyed join + two shard-bounded
    * aggregations; the result is corpus/shardSize rows at any scale.
    */
  def packAudit(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shardSize: Long, spark: SparkSession): DataFrame = {
    val docs = df.select(col(idCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("__tk"))
    val packs = packGreedy(df, idCol, tokensCol, budget, shardSize, spark)
    val fills = packs.join(docs, "id")
      .groupBy(col("shard"), col("pack_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tk")).as("fill"))
    fills.groupBy(col("shard")).agg(
      count(lit(1)).as("n_packs"),
      sum(col("n_docs")).as("n_docs"),
      sum(col("fill")).as("packed_tokens"),
      sum(greatest(lit(0L), lit(budget) - col("fill"))).as("waste_tokens"),
      round(sum(col("fill")).cast("double") / (count(lit(1)) * budget), 4)
        .as("fill_rate"))
  }

  /** Deterministic training-order shuffle + sharding: shard = first md5
    * hex nibble of the key (16 shards), position = rank within the
    * shard by (md5, key) — a reproducible global permutation that is a
    * pure function of the keys (stable across runs, engines, input
    * layout; the same guarantee [[Splits]] gives splits, applied to
    * training order). The window partitions BY SHARD, so no global
    * sort/single-partition window exists at any scale; readers stream
    * shards independently and each shard's order is fixed.
    */
  def shuffleShards(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", substring(col("__h"), 1, 1))
      .withColumn("position", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** DuckDB mirror of [[shuffleShards]]. */
  def shuffleShardsSql(table: String, keyCol: String, selectCols: String): String =
    s"""SELECT $selectCols, substr(md5(CAST($keyCol AS VARCHAR)), 1, 1) AS shard,
          CAST(row_number() OVER (
            PARTITION BY substr(md5(CAST($keyCol AS VARCHAR)), 1, 1)
            ORDER BY md5(CAST($keyCol AS VARCHAR)), $keyCol) AS BIGINT) AS position
        FROM $table"""

  /** Overlapping fixed-size token chunking — the context/RAG counterpart
    * of packing: each document's whitespace tokens become windows of
    * `chunkSize` tokens advancing by `stride` (stride < chunkSize ⇒
    * overlap), the last window covering the tail. Chunk count is exact
    * integer arithmetic (1 + ceil(max(0, n-C)/S)) so any engine agrees
    * on the chunk set. Emits (id, chunk_idx, start_tok, n_toks,
    * chunk_sha) — the sha256 of the space-rejoined window proves chunk
    * CONTENT parity without hauling chunk text through a compare. The
    * whole plan is one narrow codegen pass + a generator: no shuffle at
    * any scale, output volume ≈ corpus·(1/stride overlap factor).
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunk=$chunkSize stride=$stride")
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol).as("id"), toks.as("__tk"),
        size(toks).cast("long").as("__n"))
      // ceil((n-C)/S) via integral `div` (never Column./, which is double
      // true-division); ws <= C collapses to 1 chunk
      .withColumn("__nchunks", lit(1L) +
        expr(s"(greatest(__n - $chunkSize, 0L) + ${stride - 1}) div $stride"))
      .select(col("id"), col("__tk"),
        explode(sequence(lit(0L), col("__nchunks") - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        slice(col("__tk"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkSize)).as("__w"))
      .select(col("id"), col("chunk_idx"), col("start_tok"),
        size(col("__w")).cast("long").as("n_toks"),
        sha2(array_join(col("__w"), " "), 256).as("chunk_sha"))
  }

  /** DuckDB mirror of [[chunkTokens]] — same integer chunk-count
    * arithmetic, same 1-based token slicing, same space re-join.
    */
  def chunkTokensSql(table: String, idCol: String, textCol: String,
      chunkSize: Int, stride: Int, idOut: String): String =
    s"""WITH t AS (
         SELECT $idCol, regexp_split_to_array(trim($textCol), '\\s+') AS tk
         FROM $table),
       c AS (
         SELECT $idCol, tk, unnest(range(
           1 + (greatest(len(tk) - $chunkSize, 0) + ${stride - 1}) // $stride)) AS chunk_idx
         FROM t)
       SELECT $idCol AS $idOut, CAST(chunk_idx AS BIGINT) AS chunk_idx,
              CAST(chunk_idx * $stride AS BIGINT) AS start_tok,
              CAST(len(tk[chunk_idx * $stride + 1 : chunk_idx * $stride + $chunkSize]) AS BIGINT) AS n_toks,
              sha256(array_to_string(
                tk[chunk_idx * $stride + 1 : chunk_idx * $stride + $chunkSize], ' ')) AS chunk_sha
       FROM c"""

  /** The greedy-packing recurrence as a reusable CTE-list fragment
    * (callers prepend `WITH RECURSIVE` and append their SELECT), so a
    * composed pipeline oracle can chain it after its own CTEs.
    * `source` is any parenthesizable SELECT producing `$idCol` and the
    * columns `tokensExpr` reads.
    */
  def packGreedyCtes(source: String, idCol: String, tokensExpr: String,
      budget: Long, shardSize: Long): String =
    s"""pk_t AS MATERIALIZED (
         SELECT $idCol AS id, $idCol // $shardSize AS shard, $tokensExpr AS tk,
                row_number() OVER (PARTITION BY $idCol // $shardSize ORDER BY $idCol) AS rn
         FROM ($source)),
       walk(shard, rn, id, pack_idx, acc) AS (
         SELECT shard, rn, id, CAST(0 AS BIGINT), tk FROM pk_t WHERE rn = 1
         UNION ALL
         SELECT t.shard, t.rn, t.id,
                CASE WHEN w.acc + t.tk > $budget THEN w.pack_idx + 1 ELSE w.pack_idx END,
                CASE WHEN w.acc + t.tk > $budget THEN t.tk ELSE w.acc + t.tk END
         FROM walk w JOIN pk_t t ON t.shard = w.shard AND t.rn = w.rn + 1)"""

  /** DuckDB mirror: the same greedy recurrence replayed as a recursive
    * CTE (one iteration per row rank; shards advance in lockstep).
    * `tokensExpr` must compute the same token count as the Spark plan.
    */
  def packGreedySql(table: String, idCol: String, tokensExpr: String,
      budget: Long, shardSize: Long): String =
    s"""WITH RECURSIVE ${packGreedyCtes(s"SELECT * FROM $table", idCol, tokensExpr, budget, shardSize)}
       SELECT id AS doc_id, shard, pack_idx FROM walk"""
}
