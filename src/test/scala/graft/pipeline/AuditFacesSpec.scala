package graft.pipeline

import graft.SparkSpec
import graft.queries.Pipeline
import org.apache.spark.sql.Row

/** Cross-face invariants between the corpus-release audit queries: the
  * per-source cards must recombine into the global dataset card, and
  * the leakage matrix must be a well-formed upper-triangular pair
  * table. These are the relations a release pipeline relies on when it
  * prints both tables side by side — pinning them catches a drift in
  * ONE face's fragment (a changed quality formula, a changed digest)
  * that the per-query oracles would each still pass in isolation.
  */
class AuditFacesSpec extends SparkSpec {

  test("per-source cards sum to the global dataset card") {
    val dir = sf()
    val global = Pipeline.pDatasetCard(spark, dir).collect().head
    val bySource = Pipeline.pSourceCards(spark, dir).collect()

    def g(col: String)(r: Row): Long = r.getLong(r.fieldIndex(col))
    assert(bySource.map(g("n_docs")).sum === g("n_docs")(global))
    assert(bySource.length.toLong === g("n_sources")(global))
    assert(bySource.map(g("total_chars")).sum === g("total_chars")(global))
    assert(bySource.map(g("total_ws_tokens")).sum === g("total_ws_tokens")(global))
    assert(bySource.map(g("n_en")).sum === g("n_en")(global))
    // per-source distinct texts can only over-count the global distinct
    // (a text shared by two sources is unique once globally, once EACH
    // per source)
    assert(bySource.map(g("n_unique_texts")).sum >= g("n_unique_texts")(global))
    // the exact-integer mean recombines: global mean equals the
    // doc-weighted mean of the per-source integer sums, to the shared
    // 4dp grid (both sides divide the same exact integer total)
    def meanQ(r: Row): Double = r.getDouble(r.fieldIndex("mean_quality"))
    val weighted = bySource.map(r => meanQ(r) * g("n_docs")(r)).sum /
      g("n_docs")(global)
    assert(math.abs(weighted - meanQ(global)) < 1e-4)
  }

  test("embedding decontamination face is the eval-side partition of the pair stream") {
    // sf0.01 has planted ≥0.4 cosine pairs straddling the mod-50 eval cut
    val dir = sf("sf0.01")
    val got = Pipeline.pDecontamEmbed(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    // no eval vector may ever be flagged as contaminated corpus
    got.keys.foreach(id => assert(id % 50 != 0, s"eval vec $id flagged"))
    // reference: recompute from the all-pairs primitive, independently
    // of the pinned cache
    val pairs = Dedup.embedCosineAllPairs(
      graft.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = pairs.flatMap { case (a, b, cos) =>
      (a % 50 == 0, b % 50 == 0) match {
        case (true, false) => Some(b -> cos)
        case (false, true) => Some(a -> cos)
        case _ => None
      }
    }.groupBy(_._1).map { case (id, hs) =>
      id -> (hs.length.toLong,
        BigDecimal(hs.map(_._2).max).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got === expected)
  }

  test("leakage matrix is upper-triangular with pair-consistent counts") {
    // sf0.01: the smallest dir with known cross-source span sharing, so
    // the invariants are exercised on real rows, not a vacuous empty set
    val dir = sf("sf0.01")
    val m = Pipeline.pSourceLeakage(spark, dir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val a = r.getString(r.fieldIndex("source_a"))
      val b = r.getString(r.fieldIndex("source_b"))
      assert(a < b, s"row not upper-triangular: ($a, $b)")
      val nPairs = r.getLong(r.fieldIndex("n_pairs"))
      val nFps = r.getLong(r.fieldIndex("n_shared_fps"))
      // every counted pair shares >= 2 fingerprints by the winnow
      // threshold, so the fp mass is at least twice the pair count
      assert(nPairs >= 1L && nFps >= 2L * nPairs, s"($a,$b): $nPairs pairs, $nFps fps")
    }
  }
}
