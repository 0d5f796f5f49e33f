package graft.pipeline

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column (SURVEY
  * §2.7 rows 48-49).
  *
  *  - brute: broadcast the (small) query set against the corpus — exact,
  *    one corpus scan, no corpus shuffle; the per-query top-k window runs
  *    on the corpus partitioning.
  *  - LSH: random-hyperplane signs bucket the corpus; queries probe only
  *    their own bucket, bounding pairwise work by the bucket size. The
  *    scale path: corpus bucketing is one narrow map, the join shuffles
  *    on the bucket key.
  */
object Ann {

  /** Exact top-k by cosine: queries × corpus with the query side
    * broadcast, rank per query with a deterministic tiebreak.
    */
  def bruteKnn(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Hard-negative mining for contrastive training: per query, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * near-miss negatives that actually move a contrastive loss (random
    * negatives are trivially separable). Same broadcast/window shape as
    * [[bruteKnn]] with the label inequality folded into the join, so
    * same-label rows never reach the cosine; at corpus scale the
    * LSH-bucketed candidate path substitutes for the broadcast join
    * exactly as for [[lshKnn]].
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"), col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"), col(labelCol).as("n_label"))
    c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("q_label") =!= col("n_label"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("q_label"), col("neighbor_id"),
        col("n_label"), col("cosine"), col("rank"))
  }

  /** Deterministic random hyperplanes (seeded, generated driver-side —
    * tiny) as literal array columns.
    */
  private def planes(dim: Int, numPlanes: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Multi-table sign-bit LSH keys: `numTables` independent tables of
    * `bitsPerTable` hyperplane sign bits each. A row lands in one bucket
    * per table — `(table, bucket)` struct array, exploded by the caller.
    * Pure column arithmetic (aggregate over zip_with), fully codegen'd.
    *
    * Tuning: collision prob per table for angle θ is (1-θ/π)^bits; more
    * tables buy recall linearly in shuffle volume, more bits shrink
    * buckets exponentially. At corpus size n aim bits ≈ log2(n / wanted
    * bucket size).
    */
  def lshKeys(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bitsPerTable: Int, numTables: Int, seed: Long): DataFrame = {
    val ps = planes(dim, bitsPerTable * numTables, seed)
    val v = col(vecCol).cast("array<double>")
    val tables = (0 until numTables).map { t =>
      val bucket = (0 until bitsPerTable).map { b =>
        val planeCol = array(ps(t * bitsPerTable + b).toIndexedSeq.map(lit): _*)
        when(VectorFunctions.dot(planeCol, v) >= 0, lit(1L << b)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("table"), bucket.as("bucket"))
    }
    df.select(col(idCol).as("id"), v.as("v"),
      explode(array(tables: _*)).as("tb"))
      .select(col("id"), col("v"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** IVF (inverted-file) coarse quantization: nCentroids vectors drawn
    * as a deterministic seeded sample of the corpus (hash-ordered — a
    * production path would refine them with a few distributed Lloyd
    * iterations; the partition/probe plumbing is identical). Assignment
    * is arg-max cosine against the broadcast centroid literals via
    * struct ordering (`array_max` on struct(score, cid)), fully
    * codegen'd. Returns (id, v, cid).
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Double])], nProbe: Int): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val scored = centroids.map { case (cid, cv) =>
      struct(VectorFunctions.cosine(array(cv.toIndexedSeq.map(lit): _*), v).as("score"),
        lit(cid).as("cid"))
    }
    // top-nProbe centroids by score: struct ordering compares score
    // first. nProbe=1 (the corpus-assignment hot path, run on every
    // corpus row) is a single O(C) array_max, not an O(C log C) sort.
    val probes =
      if (nProbe == 1) array(array_max(array(scored: _*)))
      else slice(reverse(array_sort(array(scored: _*))), 1, nProbe)
    df.select(col(idCol).as("id"), v.as("v"),
      explode(probes).as("p"))
      .select(col("id"), col("v"), col("p.cid").as("cid"))
  }

  /** Deterministic centroid sample: the nCentroids corpus vectors with
    * the smallest seeded id-hash — collected to the driver (bounded:
    * nCentroids × dim doubles, the IVF codebook is driver-side by
    * design, exactly like a broadcast dictionary).
    */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, seed: Long): Seq[(Int, Array[Double])] =
    corpus.select(col(vecCol).cast("array<double>").as("v"),
        xxhash64(col(idCol), lit(seed)).as("h"))
      .orderBy(col("h")).limit(nCentroids)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](0).toArray }.toSeq

  /** IVF-bucketed ANN: corpus rows index into their single nearest
    * centroid's list; queries probe the nProbe nearest lists. The join
    * shuffles on the centroid id only; pairwise work is bounded by
    * nProbe × list size. Recall < 1 by construction — AnnSpec measures
    * it against [[bruteKnn]].
    */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 32, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    val cents = sampleCentroids(corpus, idCol, vecCol, nCentroids, seed)
    val cb = ivfAssign(corpus, idCol, vecCol, cents, nProbe = 1)
      .select(col("id").as("neighbor_id"), col("v").as("cv"), col("cid").as("ccid"))
    val qb = ivfAssign(queries, idCol, vecCol, cents, nProbe = nProbe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("cid"))
    qb.join(cb, col("cid") === col("ccid") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Bucketed ANN: per-query top-k among corpus rows sharing a bucket in
    * any table. Recall < 1 by construction; AnnSpec measures it against
    * [[bruteKnn]]. The join shuffles on (table, bucket) only — pairwise
    * work is bounded by bucket size × tables, never n².
    */
  def lshKnn(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, bitsPerTable: Int = 4, numTables: Int = 8,
      seed: Long = 42L): DataFrame = {
    val qb = lshKeys(queries, idCol, vecCol, dim, bitsPerTable, numTables, seed)
      .select(col("id").as("query_id"), col("v").as("qv"), col("table"), col("bucket"))
    val cb = lshKeys(corpus, idCol, vecCol, dim, bitsPerTable, numTables, seed)
      .select(col("id").as("neighbor_id"), col("v").as("cv"),
        col("table").as("ctable"), col("bucket").as("cbucket"))
    qb.join(cb,
        col("table") === col("ctable") && col("bucket") === col("cbucket") &&
          col("query_id") =!= col("neighbor_id"))
      // score BEFORE deduping the multi-table collisions: recomputing a
      // cosine per duplicate collision is ~100 flops in codegen, while
      // a distinct over rows still carrying both embedding vectors
      // shuffles and hashes kBs per row — the dedup key here is 24 bytes
      // (cosine is a pure function of the pair, so the triple is unique)
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
