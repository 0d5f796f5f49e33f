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

  test("LSH-bucketed pair stream substitutes for the exact stream across the pair-consumer faces (measured recall floors)") {
    // The scale posture of p_dbscan / p_dbscan_incr / p_decontam_embed /
    // p_dedup_curve is "the exact ≥0.4 pair stream swaps for
    // embedCosineLsh with everything downstream unchanged". This leg
    // RUNS that swap on gate data and pins the measured recall — the
    // AnnSpec recall-floor precedent applied to every face reading the
    // pinned pair stream. Floors sit below the measured values (noted
    // inline) by a small margin; a bucketing regression trips them.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.01")
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val exact = Dedup.embedCosineAllPairs(emb, "vec_id", "embedding",
      threshold = 0.4).localCheckpoint()
    // bits/tables tuned for the 0.4-threshold regime: a 0.4 cosine is a
    // WEAK similarity (collision prob 0.63/bit), so fewer bits + more
    // tables is the operating point — 4x8 (the tight-threshold default)
    // measures 0.73 pair recall here, 3x16 measures 1.0 (sweep in the
    // round-9 SURVEY notes)
    val lsh = Dedup.embedCosineLsh(emb, "vec_id", "embedding", dim = 64,
      threshold = 0.4, bitsPerTable = 3, numTables = 16).localCheckpoint()
    def pairSet(df: DataFrame) = df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = pairSet(exact)
    val lshPairs = pairSet(lsh)
    assert(lshPairs.subsetOf(exactPairs)) // precision exact by construction
    val pairRecall = lshPairs.size.toDouble / exactPairs.size
    info(f"pair recall: $pairRecall%.4f (${lshPairs.size}/${exactPairs.size})")
    assert(pairRecall >= 0.90, f"pair recall $pairRecall%.4f under floor")

    // p_dbscan swap: same fit over the degraded stream. Degrees only
    // drop under a pair subset, so LSH cores are a subset of exact
    // cores; role agreement and core recall are the quality readout.
    val ids = emb.select(col("vec_id").as("id"))
    def roles(pairs: DataFrame): Map[Long, String] =
      Cluster.dbscanFromPairs(ids, pairs.select("id_a", "id_b"), minPts = 3)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exRoles = roles(exact)
    val lshRoles = roles(lsh)
    val lshCore = lshRoles.filter(_._2 == "core").keySet
    val exCore = exRoles.filter(_._2 == "core").keySet
    assert(lshCore.subsetOf(exCore))
    val coreRecall = lshCore.size.toDouble / exCore.size
    val roleAgree = exRoles.keys.count(k => exRoles(k) == lshRoles(k))
      .toDouble / exRoles.size
    info(f"dbscan core recall: $coreRecall%.4f role agreement: $roleAgree%.4f")
    assert(coreRecall >= 0.90, f"core recall $coreRecall%.4f under floor")
    assert(roleAgree >= 0.95, f"role agreement $roleAgree%.4f under floor")

    // p_dbscan_incr swap: incremental maintenance must commute with the
    // pair-stream choice — folding the batch's LSH pairs into the LSH
    // base state lands exactly where a full refit over the LSH stream
    // does (hyperplanes are data-independent, so the base-subset LSH
    // stream IS the full stream restricted to base×base).
    val isBatchA = col("id_a") % 10 === 0
    val isBatchB = col("id_b") % 10 === 0
    val basePairs = lsh.filter(!isBatchA && !isBatchB)
    val newPairs = lsh.filter(isBatchA || isBatchB)
    val (bu, bd, bl) = Cluster.dbscanFit(
      basePairs.select("id_a", "id_b").localCheckpoint(), minPts = 3)
    def asMap(df: DataFrame) = df.collect().map(r => r.getLong(0) ->
      (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val folded = asMap(Cluster.dbscanIncremental(ids, bu, bd, bl,
      newPairs.select("id_a", "id_b"), minPts = 3))
    val refit = asMap(Cluster.dbscanFromPairs(ids,
      lsh.select("id_a", "id_b"), minPts = 3))
    assert(folded === refit, "incremental fold over the LSH stream diverged from refit")

    // p_decontam_embed swap: flagged-corpus-vector recall
    val evalA = (col("id_a") % 50) === 0
    val evalB = (col("id_b") % 50) === 0
    def flagged(pairs: DataFrame): Set[Long] = pairs
      .select(when(evalA && !evalB, col("id_b"))
        .when(evalB && !evalA, col("id_a")).as("v"))
      .where(col("v").isNotNull).distinct()
      .collect().map(_.getLong(0)).toSet
    val exFlag = flagged(exact)
    val lshFlag = flagged(lsh)
    assert(lshFlag.subsetOf(exFlag))
    val decontamRecall = lshFlag.size.toDouble / exFlag.size
    info(f"decontam flagged recall: $decontamRecall%.4f (${lshFlag.size}/${exFlag.size})")
    assert(decontamRecall >= 0.90, f"decontam recall $decontamRecall%.4f under floor")

    // p_dedup_curve swap: per-threshold pair counts under the degraded
    // stream stay within a recall band of the exact counts (6dp-sealed
    // grid compare, as the face itself)
    val grid = Seq(0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    grid.foreach { t =>
      val nE = exact.filter(round(col("cosine"), 6) >= t).count()
      val nL = lsh.filter(round(col("cosine"), 6) >= t).count()
      assert(nL <= nE, s"t=$t: LSH emitted a pair the exact stream lacks")
      if (nE >= 20)
        assert(nL >= (nE * 0.85).toLong,
          s"t=$t: curve recall ${nL.toDouble / nE} under floor ($nL/$nE)")
      info(s"curve t=$t: exact=$nE lsh=$nL")
    }
  }
}
