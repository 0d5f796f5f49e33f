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
}
