package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-duplicate exactness for the near-dup family (SURVEY §2.7 rows
  * 44-46) — the rows-only half of the dedup surface.
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again until dawn"
    val nearDup = base.replace("dawn", "dusk") // one word differs
    val other = "completely different content about spark shuffles and parquet column pruning at scale"
    Seq(
      (1L, base),
      (2L, base),          // exact dup of 1
      (3L, nearDup),       // near dup of 1
      (4L, other),
      (5L, "short text")).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts and keeps min id") {
    val res = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(res(1L) === 2L) // keep_id 1 has 2 copies
    assert(res.values.sum === 5L)
    assert(res.size === 4)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashDupes(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minhash clusters chain the dup family into one canonical cluster") {
    import spark.implicits._
    // CC over the LSH pairs: {1,2,3} must share a canon_id (1↔2 exact,
    // 1/2↔3 near), 4 and 5 stay singletons
    val pairs = Dedup.lshCandidatesFromBuckets(
      Dedup.minhashBandBuckets(docs, "doc_id", "text").localCheckpoint())
    val comp = graft.graph.Algorithms.connectedComponents(
      docs.select(col("doc_id").as("gid")),
      pairs.select(col("id_a").as("gsrc"), col("id_b").as("gdst")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) === comp(2L) && comp(2L) === comp(3L))
    assert(comp(4L) === 4L && comp(5L) === 5L)
  }

  test("simhash hamming-bucket join flags the near dup") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
    val byId = sims.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === byId(2L)) // identical text, identical simhash
    val pairs = Dedup.simhashDupes(sims, maxHamming = 6)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngram jaccard is 1 for identical docs and high for near dups") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
    assert(j((1L, 4L)) === 0.0)
  }

  test("embedding cosine flags only the planted near-identical vector") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f)), // near dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val res = Dedup.embedCosineAllPairs(emb, "vec_id", "embedding", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res === Set((1L, 2L)))
  }

  test("embedCosineLsh recalls planted near-dups found by all-pairs, with exact precision") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(x => (x / n).toFloat)
    }
    // 40 random unit vectors + a perturbed near-dup of each even id
    val base = (0 until 40).map(i => i.toLong -> Array.fill(dim)(rnd.nextGaussian()))
    val rows = base.map { case (i, v) => (i, unit(v)) } ++
      base.filter(_._1 % 2 == 0).map { case (i, v) =>
        (100L + i, unit(v.map(_ + rnd.nextGaussian() * 0.05)))
      }
    val emb = rows.toDF("vec_id", "embedding")
    val all = Dedup.embedCosineAllPairs(emb, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embedCosineLsh(emb, "vec_id", "embedding", dim, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all.size >= 20) // the plant worked: every perturbed copy is a pair
    assert(lsh.subsetOf(all)) // precision exact: cosine verified on every pair
    assert(lsh.size >= (all.size * 0.8).toInt) // recall of the bucketed path
  }

  test("bucket-size cap bounds candidate volume on a planted mega-bucket") {
    import spark.implicits._
    // 50 identical docs = one clique: every band bucket holds all 50
    val clique = (0 until 50).map(i => (i.toLong, "same exact text repeated for the mega bucket"))
    val distinctDocs = Seq(
      (100L, "completely different content about spark shuffles and pruning"),
      (101L, "completely different content about spark shuffles and pruning"))
    val df = (clique ++ distinctDocs).toDF("doc_id", "text")
    // unbounded: the clique joins quadratically — 50*49/2 pairs + the pair
    val unbounded = Dedup.minhashDupes(df, "doc_id", "text")
    assert(unbounded.count() === 50L * 49 / 2 + 1)
    // capped below the clique size: the clique's buckets are dropped, the
    // small bucket survives — candidate volume stays bounded by cap²·bands
    val capped = Dedup.minhashDupes(df, "doc_id", "text", maxBucketSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((100L, 101L)))
    // the dropped clique is exactly what the exact-dup pass collapses
    val exact = Dedup.exact(df, "doc_id", "text")
      .filter(col("n_copies") === 50).collect()
    assert(exact.length === 1)
    // simhash path honors the same cap
    val sims = Dedup.simhash(df, "doc_id", "text")
    val simCapped = Dedup.simhashDupes(sims, maxHamming = 3, maxBucketSize = 10L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simCapped === Set((100L, 101L)))
    // the audit face reports exactly what the cap dropped: the 50-doc
    // clique fills one oversized bucket per band — lost recall is
    // observable, never silent
    val over = Dedup.oversizedLshBuckets(
        Dedup.minhashSignatures(df, "doc_id", "text"), maxBucketSize = 10L)
      .collect()
    assert(over.length === 16)
    assert(over.forall(_.getAs[Long]("population") === 50L))
    val simOver = Dedup.oversizedSimhashBuckets(sims, maxBucketSize = 10L).collect()
    assert(simOver.length >= 4 && simOver.forall(_.getAs[Long]("population") >= 50L))
  }

  test("winnowing: any shared run of w+k-1 words yields a shared fingerprint") {
    import spark.implicits._
    // the classic winnowing guarantee with k=4, w=5: a shared run of
    // 8 words must select at least one common fingerprint
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (1L, s"unique prefix one two three $shared closing words here"),
      (2L, s"$shared totally different tail content follows now"),
      (3L, "completely disjoint vocabulary nothing matches at all whatsoever"),
      (4L, "tiny")).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(df, "doc_id", "text", k = 4, w = 5, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a >= 3L || b >= 3L })
    // fingerprint sets are deterministic and non-empty even for sub-k docs
    val fps = df.select(col("doc_id"),
        Dedup.winnowFingerprints(col("text"), 4, 5).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fps.values.forall(_.nonEmpty))
    assert(fps(4L).length === 1)
  }

  test("decontamination flags exactly the corpus docs overlapping the test set") {
    import spark.implicits._
    val test = Seq(
      (1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the test 3-gram "quick brown fox" → contaminated
      (10L, "a very quick brown fox indeed ran far away"),
      // shares words but no full 3-gram → clean
      (11L, "brown dog jumps quick"),
      // identical to the test doc → every shingle shared
      (12L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, test, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(10L, 12L))
    assert(got(10L) === 1L) // exactly the one shared 3-gram
    assert(got(12L) === 7L) // all 7 distinct 3-grams of a 9-word doc
  }

  test("incremental dedup drops batch docs already in the index, dedups the rest") {
    import spark.implicits._
    val index = Seq((1L, "already curated"), (2L, "also present"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "already curated"), // exact dup of the index → dropped
      (11L, "fresh content"),
      (12L, "fresh content"),   // intra-batch dup → collapses to 11
      (13L, "brand new"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalExact(index, batch, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got === Map(11L -> 2L, 13L -> 1L))
  }

  test("incremental LSH: prior pairs ∪ delta pairs ≡ full refit on the union corpus (planted + randomized splits + real table)") {
    import spark.implicits._
    def fullPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      Dedup.minhashDupes(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def incrPairs(base: org.apache.spark.sql.DataFrame,
        batch: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val idx = Dedup.minhashBandBuckets(base, "doc_id", "text")
        .localCheckpoint()
      val (updated, fresh) = Dedup.incrementalLsh(idx, batch, "doc_id", "text")
      // the updated index must be exactly the union corpus's buckets
      val refit = Dedup.minhashBandBuckets(base.unionByName(batch),
        "doc_id", "text")
      assert(updated.collect().map(_.toSeq).toSet ===
        refit.collect().map(_.toSeq).toSet)
      fullPairs(base) ++
        fresh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // planted: dup family splits across base and batch — the cross pair
    // (1,3) is only discoverable via the index probe
    val base = docs.filter(col("doc_id") =!= 3)
    val batch = docs.filter(col("doc_id") === 3)
    assert(incrPairs(base, batch) === fullPairs(docs))
    // randomized splits over a corpus with several dup families
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten eleven twelve",
      "red orange yellow green blue indigo violet magenta cyan white")
    val corpus = (0 until 30).map { i =>
      val t = words(i % 3)
      val mutated = if (i % 5 == 0) t.replace(t.split(" ").last, "zzz") else t
      (i.toLong, mutated)
    }.toDF("doc_id", "text")
    (1 to 3).foreach { s =>
      val cut = rnd.nextInt(9) + 1
      val b = corpus.filter(col("doc_id") % 10 < cut)
      val d = corpus.filter(col("doc_id") % 10 >= cut)
      assert(incrPairs(b, d) === fullPairs(corpus), s"split=$cut seed=$s")
    }
    // the real table's own split (the driver face's convention)
    val real = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"))
    assert(incrPairs(real.filter(col("doc_id") % 10 =!= 0),
      real.filter(col("doc_id") % 10 === 0)) === fullPairs(real))
  }

  test("line dedup keeps only the first corpus occurrence of each sentence") {
    import spark.implicits._
    def sha(s: String) =
      org.apache.commons.codec.digest.DigestUtils.sha256Hex(s)
    val docs = Seq(
      (1L, "Common header. Unique one."),
      (2L, "Common header. Unique two."),
      (3L, "common header"), // no terminator; still one line, still a dup
      (4L, "Twice here. Twice here.")) // intra-doc dup: second copy dropped
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(got(1L) === ((2L, 2L, Some(sha("common header unique one")))))
    assert(got(2L) === ((2L, 1L, Some(sha("unique two")))))
    // every line already seen → nothing kept, NULL sha (not sha(""))
    assert(got(3L) === ((1L, 0L, None)))
    assert(got(4L) === ((2L, 1L, Some(sha("twice here")))))
    // layout purity: first-occurrence is by (id, pos), not partition order
    val again = Dedup.lineDedup(docs.repartition(5, col("text")), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(again === got)
  }

  test("span dedup removes copied token windows from non-first occurrences") {
    import spark.implicits._
    def sha(s: String) =
      org.apache.commons.codec.digest.DigestUtils.sha256Hex(s)
    // a 4-token passage copied from doc 1 into doc 2's middle; doc 3
    // is clean; doc 4 is shorter than the window and must survive whole
    val passage = "p1 p2 p3 p4"
    val docs = Seq(
      (1L, s"a1 a2 $passage a3"),
      (2L, s"b1 b2 b3 $passage b4 b5"),
      (3L, "c1 c2 c3 c4 c5 c6 c7"),
      (4L, "d1 d2")).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", k = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    // doc 1 holds the corpus-first occurrence: untouched
    assert(got(1L) === ((7L, 7L, Some(sha(s"a1 a2 $passage a3")))))
    // doc 2 loses exactly the copied window's 4 tokens
    assert(got(2L) === ((9L, 5L, Some(sha("b1 b2 b3 b4 b5")))))
    assert(got(3L) === ((7L, 7L, Some(sha("c1 c2 c3 c4 c5 c6 c7")))))
    assert(got(4L) === ((2L, 2L, Some(sha("d1 d2")))))
    // layout purity
    val again = Dedup.spanDedup(docs.repartition(5, col("text")),
        "doc_id", "text", k = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(again === got)
  }

  test("span dedup collapses a doc that is one long repeat of another") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "doc_id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((6L, 6L)))
    // every window of doc 2 duplicates doc 1 → every token covered
    assert(got(2L) === ((6L, 0L)))
    val sha = Dedup.spanDedup(docs, "doc_id", "text", k = 3)
      .filter(col("id") === 2L).collect()(0).getString(3)
    assert(sha == null, "no kept text must yield NULL sha")
  }

  test("containment scores sub-document inclusion that Jaccard misses") {
    import spark.implicits._
    val big = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val docs = Seq(
      (1L, big),
      (2L, "w5 w6 w7 w8 w9 w10"), // fully contained in 1
      (3L, "x1 x2 x3 x4 x5 x6 x7")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // doc 2's 4 trigrams all occur in doc 1's 14 → c_b_in_a = 1 exactly,
    // while Jaccard is only 4/14 — the asymmetric signal
    assert(got((1L, 2L)) === ((4L, 14L, 4L, 4.0 / 14.0, 1.0)))
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
      "no shared gram → no pair row at all")
  }

  test("containment df-cap removes mega-common grams from the semantics") {
    import spark.implicits._
    // gram "c1 c2 c3" occurs in every doc; with maxDf = 2 it leaves the
    // gram universe, so docs sharing ONLY it form no pair and set sizes
    // shrink accordingly
    val docs = Seq(
      (1L, "c1 c2 c3"),
      (2L, "c1 c2 c3"),
      (3L, "c1 c2 c3"),
      (4L, "c1 c2 c3 u1 u2"),
      (5L, "c1 c2 c3 u1 u2")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", maxDf = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // only 4↔5 survive: they share the df-2 grams "c2 c3 u1"/"c3 u1 u2";
    // the df-5 gram "c1 c2 c3" is out of the universe entirely
    assert(got.keySet === Set((4L, 5L)))
    assert(got((4L, 5L)) === ((2L, 2L, 2L)))
    // uncapped, the common gram pairs everyone
    val all = Dedup.containmentPairs(docs, "doc_id", "text")
      .collect().length
    assert(all === 10, "5 docs sharing a gram → all 10 pairs uncapped")
  }

  test("incremental containment ≡ full recompute on batch-involving pairs, incl. cap crossings") {
    import spark.implicits._
    import scala.util.Random
    (701 to 706).foreach { seed =>
      val rnd = new Random(seed)
      // small vocabulary forces shared grams AND df-cap crossings once
      // the batch lands (cap 3 on up to 14 docs)
      val vocab = Vector("a1", "a2", "a3", "b1", "b2", "c1")
      val docs = (0L until (8 + rnd.nextInt(7)).toLong).map { i =>
        val words = Seq.fill(3 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        (i, words.mkString(" "))
      }
      val ddf = docs.toDF("doc_id", "text").localCheckpoint()
      val base = ddf.filter(col("doc_id") % 3 =!= 0)
      val batch = ddf.filter(col("doc_id") % 3 === 0)
      val cap = 3L
      val idx = Dedup.containmentIndex(base, "doc_id", "text", maxDf = cap)
      val got = Dedup.incrementalContainment(idx, batch, "doc_id", "text",
          maxDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val want = Dedup.containmentPairs(ddf, "doc_id", "text", maxDf = cap)
        .filter(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got === want, s"seed=$seed docs=$docs")
    }
  }
}
