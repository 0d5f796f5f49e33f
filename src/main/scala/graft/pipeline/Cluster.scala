package graft.pipeline

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding clustering for corpus organization: Lloyd k-means with a
  * deterministic seed, and SemDeDup (Abbas et al. 2023) — semantic
  * dedup as cluster-then-intra-cluster-cosine.
  *
  * The centroid codebook lives on the driver (k × dim doubles — the
  * same bounded-broadcast-dictionary posture as [[Ann.sampleCentroids]];
  * this is the standard distributed-k-means split: assignment is a
  * narrow codegen pass over the corpus, the update is one aggregation,
  * and only the k×dim means ever reach the driver). Every step is a
  * pure function of the data + constants, so the whole fit is
  * reproducible across runs, engines, and partitionings, and the fixed
  * round count unrolls into an exact DuckDB oracle ([[kmeansCtes]]).
  */
object Cluster {

  /** Deterministic init: the embeddings of the k smallest ids, centroid
    * index assigned in id order.
    */
  def initCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Int, Array[Double])] =
    emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col("id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }.toSeq

  /** Nearest-centroid assignment: arg-min squared L2 against the
    * broadcast centroid literals via struct ordering (`array_min` on
    * struct(dist, cid) — ties to the lowest cid), fully codegen'd, one
    * narrow pass. Returns (id, v, cluster, dist) with dist the squared
    * L2 to the winning centroid.
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val scored = centroids.map { case (cid, cv) =>
      struct(
        VectorFunctions.l2sq(array(cv.toIndexedSeq.map(lit): _*), v).as("d"),
        lit(cid).as("cid"))
    }
    val best = array_min(array(scored: _*))
    emb.select(col(idCol).as("id"), v.as("v"),
      best.getField("cid").as("cluster"), best.getField("d").as("dist"))
  }

  /** One Lloyd update: per-dimension mean of each cluster's members
    * (posexplode → one groupBy on (cluster, dim) — dims are bounded so
    * the shuffle is corpus-row-bounded, never corpus×corpus). Clusters
    * that lost every member keep their previous centroid, so the
    * codebook size is invariant.
    */
  def updateCentroids(assigned: DataFrame,
      prev: Seq[(Int, Array[Double])]): Seq[(Int, Array[Double])] = {
    val means = assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cluster"), col("i")).agg(avg(col("x")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(rows =>
        rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
      .toMap
    prev.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
  }

  /** Lloyd k-means: `rounds` centroid updates from the deterministic
    * init, then a final assignment under the fitted codebook. Returns
    * (id, v, cluster) — callers wanting just the labels project.
    */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k > 0 && rounds >= 0, s"need k > 0, rounds >= 0; got k=$k rounds=$rounds")
    var cents = initCentroids(emb, idCol, vecCol, k)
    for (_ <- 1 to rounds)
      cents = updateCentroids(assign(emb, idCol, vecCol, cents), cents)
    assign(emb, idCol, vecCol, cents)
  }

  /** SemDeDup: k-means partition, then exact cosine over pairs WITHIN
    * each cluster — the clustering bounds the pairwise work at
    * Σ |cluster|² instead of n², which is the published scale recipe
    * for semantic dedup (and unlike LSH buckets, the partition is also
    * a reusable corpus-organization artifact). Returns near-duplicate
    * pairs (id_a, id_b, cluster, cosine ≥ threshold).
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, threshold: Double,
      maxClusterSize: Long = Long.MaxValue): DataFrame =
    // materialize the fitted assignment once: both self-join legs read it
    semDedupFromAssign(
      kmeansAssign(emb, idCol, vecCol, k, rounds).localCheckpoint(),
      threshold, maxClusterSize)

  /** [[semDedup]] over an already-fitted (and materialized) assignment
    * — the face a deployment uses when the k-means fit is a pinned
    * corpus artifact shared across semantic faces rather than refit
    * per query.
    */
  def semDedupFromAssign(asg0: DataFrame, threshold: Double,
      maxClusterSize: Long = Long.MaxValue): DataFrame = {
    // population guard, same posture as Dedup.boundBuckets: the pairwise
    // stage is Σ|cluster|² by design, and a degenerate fit (k too small,
    // all-similar corpus) regresses toward n² on one join key with no
    // error. Opt-in cap drops such clusters from the pairwise path;
    // [[oversizedClusters]] is the audit face that counts what a capped
    // run skipped. Singletons are dropped losslessly (they cannot pair).
    val sizes = asg0.groupBy(col("cluster")).agg(count(lit(1)).as("__cn"))
    val asg = asg0.join(broadcast(sizes), "cluster")
      .filter(col("__cn") >= 2 && col("__cn") <= maxClusterSize)
      .drop("__cn")
    val a = asg.select(col("cluster"), col("id").as("id_a"), col("v").as("va"))
    val b = asg.select(col("cluster").as("cluster_b"), col("id").as("id_b"),
      col("v").as("vb"))
    a.join(b, col("cluster") === col("cluster_b") && col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cluster"), col("cosine"))
  }

  /** (cluster, population) of fitted clusters above `maxClusterSize` —
    * the audit face of [[semDedup]]'s cap, mirroring
    * [[Dedup.oversizedLshBuckets]]: what a capped run drops from the
    * pairwise path, so lost recall is counted/routed, never silent. The
    * fit is deterministic, so this re-run aligns exactly with the
    * capped pass's assignment.
    */
  def oversizedClusters(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, maxClusterSize: Long): DataFrame =
    kmeansAssign(emb, idCol, vecCol, k, rounds)
      .groupBy(col("cluster")).agg(count(lit(1)).as("population"))
      .filter(col("population") > maxClusterSize)

  /** Embedding outlier pruning: each vector's (squared) distance to its
    * fitted centroid, flagged when above its cluster's q-quantile — the
    * prune-OOD/noisy-samples curation step that usually follows a
    * SemDeDup pass. The per-cluster thresholds are a k-row aggregate
    * broadcast back; the corpus never shuffles beyond the fit itself.
    * Exact interpolated `percentile` keeps the threshold oracle-
    * checkable (same definition as DuckDB's quantile_cont); at 100 TB
    * it swaps for the mergeable `approx_percentile` sketch unchanged.
    */
  def embedOutliers(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, q: Double): DataFrame =
    embedOutliersFromAssign(
      kmeansAssign(emb, idCol, vecCol, k, rounds).localCheckpoint(), q)

  /** [[embedOutliers]] over an already-fitted materialized assignment
    * (pinned-fit contract, as [[semDedupFromAssign]]). */
  def embedOutliersFromAssign(asg: DataFrame, q: Double): DataFrame = {
    val thr = asg.groupBy(col("cluster"))
      .agg(expr(s"percentile(dist, $q)").as("__thr"))
    asg.join(broadcast(thr), "cluster")
      .select(col("id"), col("cluster"), col("dist"),
        (col("dist") > col("__thr")).as("is_outlier"))
  }

  /** Labeled-embedding margin audit (mislabeled-example detection):
    * per-label centroids (label-count × dim, the driver-side codebook
    * contract as everywhere in this module), then per vector the
    * squared distance to its OWN label's centroid vs the nearest OTHER
    * label's — a vector closer to a foreign class centroid than its own
    * is a label suspect. Distances are codegen literal-array arithmetic;
    * the suspect flag compares ROUNDED distances so engine summation
    * ULP can't flip it.
    */
  def labelMargins(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val cents = emb
      .select(col(labelCol).cast("int").as("l"), posexplode(v).as(Seq("i", "x")))
      .groupBy(col("l"), col("i")).agg(avg(col("x")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(rs => rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
      .toSeq.sortBy(_._1)
    val dists = cents.map { case (l, c) =>
      struct(
        round(VectorFunctions.l2sq(array(c.toIndexedSeq.map(lit): _*), v), 6).as("d"),
        lit(l).as("l"))
    }
    val all = array(dists: _*)
    val own = element_at(
      filter(all, s => s.getField("l") === col(labelCol).cast("int")), 1)
      .getField("d")
    val other = array_min(
        filter(all, s => s.getField("l") =!= col(labelCol).cast("int")))
      .getField("d")
    // a single-label corpus has no foreign centroid: drop those rows so
    // this face agrees with the SQL mirror's inner join (which emits
    // zero rows) instead of returning NULL d_other/suspect — and so the
    // degenerate shape never feeds element_at/array_min ANSI corners
    emb.select(col(idCol).as("id"), col(labelCol).cast("int").as("label"),
      own.as("d_own"), other.as("d_other"),
      (own > other).as("suspect"))
      .filter(col("d_other").isNotNull)
  }

  /** Per-dimension corpus min/max — the scalar-quantization codebook
    * (dim-bounded, driver-side like the centroid codebook; min/max are
    * exact order statistics, so the codebook is engine-identical).
    */
  def quantStats(emb: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect().sortBy(_.getInt(0))
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Int8 scalar quantization of an embedding column: code_i =
    * floor((x_i - lo_i) · 255 / (hi_i - lo_i) + 0.5) against the
    * per-dimension corpus min/max — the standard 4× storage compression
    * for a 100 TB embedding store (the codes scan path replaces the
    * float vectors; full-precision re-ranking reads the original column
    * only for finalists). floor(·+0.5) instead of round() so both
    * engines share one tie rule; degenerate dims (hi = lo) code to 0
    * and dequantize to lo exactly. Emits (id, codes, mse) — the
    * round-trip reconstruction MSE is the quality audit. One narrow
    * pass; the dim-bounded codebook rides in as literals.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String,
      lo: Array[Double], hi: Array[Double]): DataFrame = {
    val loL = lit(lo.toIndexedSeq.toArray)
    val hiL = lit(hi.toIndexedSeq.toArray)
    val v = col(vecCol).cast("array<double>")
    // sequence(0, -1) steps DOWNWARD to [0, -1]; an empty vector must
    // index to an empty list, not two phantom dimensions
    val idxOf = (arr: org.apache.spark.sql.Column) =>
      when(size(arr) > 0, sequence(lit(0), size(arr) - 1))
        .otherwise(array().cast("array<int>"))
    val codes = zip_with(v, idxOf(v), (x, i) => {
      val l = element_at(loL, i + 1)
      val h = element_at(hiL, i + 1)
      when(h > l, floor((x - l) * 255.0 / (h - l) + 0.5)).otherwise(lit(0.0))
    }).cast("array<int>")
    val base = emb.select(col(idCol).as("id"), v.as("v"), codes.as("codes"))
    val deq = zip_with(col("codes").cast("array<double>"), idxOf(col("codes")),
      (c, i) => {
        val l = element_at(loL, i + 1)
        val h = element_at(hiL, i + 1)
        l + c * (h - l) / 255.0
      })
    base.select(col("id"), col("codes"),
      when(size(col("v")) > 0,
        aggregate(zip_with(col("v"), deq, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, d) => acc + d) / size(col("v")))
        .otherwise(lit(0.0)).as("mse"))
  }

  /** The k-means fit as a reusable DuckDB CTE-list fragment generated
    * from the same constants, ending in `a$rounds(vec_id, v, cluster)` —
    * the final assignment. Mirrors [[kmeansAssign]] round for round:
    * same deterministic init, same arg-min (distance, cid) order, same
    * per-dimension means, same empty-cluster carry-over.
    */
  def kmeansCtes(table: String, idCol: String, vecCol: String,
      k: Int, rounds: Int): String = {
    // dist mirrors the Spark side's SQUARED L2 (list_distance² differs
    // from the fused squared sum only at ULP scale — callers round)
    def assignCte(name: String, cents: String): String =
      s"""$name AS MATERIALIZED (
         SELECT $idCol, v, cluster, dist FROM (
           SELECT e.$idCol, e.v, c.cid AS cluster,
                  list_distance(e.v, c.cv) * list_distance(e.v, c.cv) AS dist,
                  row_number() OVER (PARTITION BY e.$idCol
                    ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
           FROM e CROSS JOIN $cents c) WHERE rn = 1)"""
    val steps = (1 to rounds).map { r =>
      s""",
       ${assignCte(s"s$r", s"c${r - 1}")},
       m$r AS (
         SELECT cluster, i, avg(v[i + 1]) AS mx
         FROM (SELECT cluster, v, unnest(range(len(v))) AS i FROM s$r)
         GROUP BY 1, 2),
       c$r AS MATERIALIZED (
         SELECT c.cid, coalesce(n.cv, c.cv) AS cv
         FROM c${r - 1} c LEFT JOIN (
           SELECT cluster AS cid, list(mx ORDER BY i) AS cv
           FROM m$r GROUP BY cluster) n USING (cid))"""
    }.mkString
    s"""e AS MATERIALIZED (
         SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       c0 AS MATERIALIZED (
         SELECT row_number() OVER (ORDER BY $idCol) - 1 AS cid, v AS cv
         FROM e ORDER BY $idCol LIMIT $k)$steps,
       ${assignCte(s"a$rounds", s"c$rounds")}"""
  }
}
