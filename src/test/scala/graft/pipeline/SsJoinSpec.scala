package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity join ([[Dedup.ssjoinPrefix]]):
  * losslessness vs the brute-force definition (planted + randomized),
  * threshold exactness at the integer boundary, and the candidate
  * prune the filter exists to provide.
  */
class SsJoinSpec extends SparkSpec {

  /** Brute force: all token-sharing pairs, exact Jaccard gate. */
  private def brute(docs: DataFrame, shingleN: Int, tNum: Int,
      tDen: Int): DataFrame = {
    val toks = docs.select(col("doc_id").as("id"),
      explode(Dedup.shingleArray(col("text"), shingleN)).as("tok"))
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    toks.select(col("id").as("id_a"), col("tok"))
      .join(toks.select(col("id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .filter(col("inter") * tDen >=
        (col("sz_a") + col("sz_b") - col("inter")) * tNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"))
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  private lazy val planted = {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, base),
      (2L, base),                                    // exact dup: J = 1
      (3L, base.replace("kappa", "lambda")),         // near dup
      (4L, "alpha beta gamma something else entirely different here now"),
      (5L, "unrelated words with zero overlap against anything nearby"),
      (6L, "short text"),
      (7L, "short text")).toDF("doc_id", "text")
  }

  test("planted corpus: prefix join ≡ brute force at J ≥ 1/2") {
    val got = asSet(Dedup.ssjoinPrefix(planted, "doc_id", "text"))
    val want = asSet(brute(planted, 3, 1, 2))
    assert(got === want)
    assert(got.contains((1L, 2L, 8L, 8L, 8L)))  // exact dup pair
    assert(got.exists { case (a, b, _, _, _) => a == 6L && b == 7L })
  }

  test("threshold boundary is exact: J = t pairs are IN (integer gate)") {
    import spark.implicits._
    // sets {a,b,c,d} vs {a,b,c,e}: inter 3, union 5 — J = 0.6 exactly
    val docs = Seq(
      (1L, "a b c d x1 x2"),   // 4 distinct 3-shingles
      (2L, "a b c e y1 y2")).toDF("doc_id", "text")
    // with word-level J: use shingleN = 1 via a direct call
    val got = asSet(Dedup.ssjoinPrefix(docs, "doc_id", "text",
      shingleN = 1, tNum = 3, tDen = 7))
    val want = asSet(brute(docs, 1, 3, 7))
    assert(got === want)
    // inter=3, sz 6/6, union 9: J = 1/3 < 3/7 — excluded by both
    assert(got.isEmpty)
    val gotIn = asSet(Dedup.ssjoinPrefix(docs, "doc_id", "text",
      shingleN = 1, tNum = 1, tDen = 3))
    assert(gotIn === asSet(brute(docs, 1, 1, 3)))
    assert(gotIn.size === 1)  // J = 1/3 ≥ 1/3: boundary pair admitted
  }

  test("randomized corpora: prefix join ≡ brute force across thresholds") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val vocab = (0 until 40).map(i => s"w$i")
    for (trial <- 0 until 3) {
      val docs = (1L to 60L).map { id =>
        val n = 5 + rnd.nextInt(20)
        val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
        (id, body)
      }.toDF("doc_id", "text")
      for ((tn, td) <- Seq((1, 2), (3, 10), (4, 5))) {
        val got = asSet(Dedup.ssjoinPrefix(docs, "doc_id", "text",
          shingleN = 2, tNum = tn, tDen = td))
        val want = asSet(brute(docs, 2, tn, td))
        assert(got === want, s"trial=$trial t=$tn/$td")
      }
    }
  }

  test("incremental fold ≡ full recompute restricted to batch-involving pairs (randomized splits)") {
    import spark.implicits._
    val rnd = new scala.util.Random(314159L)
    val vocab = (0 until 30).map(i => s"w$i")
    for (trial <- 0 until 3) {
      val docs = (1L to 50L).map { id =>
        val n = 5 + rnd.nextInt(15)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val base = df.filter(col("doc_id") % 5 =!= 0)
      val batch = df.filter(col("doc_id") % 5 === 0)
      val idx = Dedup.ssjoinIndex(base, "doc_id", "text", shingleN = 2)
      val got = asSet(Dedup.incrementalSsjoin(idx, batch, "doc_id", "text"))
      val want = asSet(brute(df, 2, 1, 2))
        .filter { case (a, b, _, _, _) => a % 5 == 0 || b % 5 == 0 }
      assert(got === want, s"trial=$trial")
    }
  }

  test("stale pinned order stays lossless: batch floods a base-rare token") {
    import spark.implicits._
    // base: token "zz" appears once (rare → front of base prefixes);
    // the batch makes "zz" the most frequent token in the corpus. The
    // pinned order still treats it as rare — losslessness must not
    // depend on the order being fresh.
    val base = Seq(
      (1L, "zz aa bb cc"),
      (2L, "aa bb cc dd"),
      (3L, "dd ee ff gg")).toDF("doc_id", "text")
    val batch = (10L to 20L).map(i => (i, s"zz aa bb x$i")).toSeq
      .toDF("doc_id", "text")
    val all = base.unionByName(batch)
    val idx = Dedup.ssjoinIndex(base, "doc_id", "text", shingleN = 1)
    val got = asSet(Dedup.incrementalSsjoin(idx, batch, "doc_id", "text"))
    val want = asSet(brute(all, 1, 1, 2))
      .filter { case (a, b, _, _, _) => a >= 10L || b >= 10L }
    assert(got === want)
    assert(want.nonEmpty, "planted flood must produce batch pairs")
  }

  test("prefix filter prunes: candidates < all token-sharing pairs on the gate corpus") {
    val docs = graft.Tables.load(spark, sf(), "documents")
    val toks = docs.select(col("doc_id").as("id"),
      explode(Dedup.shingleArray(col("text"), 3)).as("tok"))
    val sharing = toks.select(col("id").as("id_a"), col("tok"))
      .join(toks.select(col("id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct().count()
    val cands = Dedup.ssjoinCandidates(docs, "doc_id", "text").count()
    assert(cands < sharing,
      s"prefix filter admitted $cands of $sharing sharing pairs — no prune")
    // and it still finds everything (subset check vs brute force)
    val got = asSet(Dedup.ssjoinPrefix(docs, "doc_id", "text"))
    val want = asSet(brute(docs, 3, 1, 2))
    assert(got === want)
  }
}
