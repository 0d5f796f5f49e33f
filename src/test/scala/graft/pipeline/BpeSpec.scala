package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Known-answer BPE induction + segmentation (hand-derived merge
  * sequence on a 2-word corpus) and corpus-level determinism.
  */
class BpeSpec extends SparkSpec {

  test("learned merges follow max-count with lexicographic tiebreak") {
    import spark.implicits._
    // words: "aa"×3, "ab"×1. Round 1 pairs: (a,a)=3, (a,</w>)=3,
    // (a,b)=1, (b,</w>)=1 → tie broken lexicographically: (a,</w>)
    // ("</w>" < "a"). Round 2: (a,a</w>)=3. Round 3: (a,b)=1 beats
    // (b,</w>)=1 on the left symbol.
    val docs = Seq("aa aa", "aa ab").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 3)
    assert(merges === Seq(("a", "</w>"), ("a", "a</w>"), ("a", "b")))
    // merge loop stops when no pairs remain rather than padding
    val tiny = Seq("x").toDF("text")
    assert(Bpe.learnMerges(tiny, "text", numMerges = 10).size <= 2)
  }

  test("segmenter applies merges greedily by priority") {
    import spark.implicits._
    val docs = Seq("aa aa", "aa ab").toDF("text")
    val rank = Bpe.learnMerges(docs, "text", numMerges = 3).zipWithIndex.toMap
    assert(Bpe.segmentWord("aa", rank) === Vector("aa</w>"))
    assert(Bpe.segmentWord("ab", rank) === Vector("ab", "</w>"))
    assert(Bpe.segmentWord("ba", rank) === Vector("b", "a</w>"))
  }

  test("tokenize counts induced tokens per document and is layout-pure") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab"), (2L, "aa aa aa")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 3)
    val counts = Bpe.tokenize(docs, "doc_id", "text", merges, spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 3L, 2L -> 3L)) // aa=1 token, ab=2
    val repart = Bpe.tokenize(
        docs.repartition(5), "doc_id", "text", merges, spark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repart === counts)
  }

  test("fertility is chars over induced tokens per stratum") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab", "s1", 5L), (2L, "aa aa aa", "s2", 8L))
      .toDF("doc_id", "text", "source", "n_chars")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 3)
    val toks = Bpe.tokenize(docs, "doc_id", "text", merges, spark)
      .toDF("doc_id", "n_tokens")
    val got = docs.join(toks, "doc_id").groupBy(col("source"))
      .agg(round(sum(col("n_chars")).cast("double") / sum(col("n_tokens")), 4)
        .as("cpt"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // s1: 5 chars / 3 tokens; s2: 8 chars / 3 tokens
    assert(got === Map("s1" -> 1.6667, "s2" -> 2.6667))
  }

  test("maxVocab caps the collected word table by frequency, ties lexicographic") {
    import spark.implicits._
    // frequencies: zz×3, aa×2, then ba/bb×1 — a cap of 3 must keep
    // (zz, aa) and break the 1-count tie toward "ba"
    val docs = Seq("zz zz zz aa", "aa ba bb").toDF("text")
    val capped = Bpe.wordCounts(docs, "text", maxVocab = 3)
    assert(capped.toSeq === Seq("zz" -> 3L, "aa" -> 2L, "ba" -> 1L))
    // learning under the cap only ever sees the kept words
    val merges = Bpe.learnMerges(docs, "text", numMerges = 10, maxVocab = 1)
    assert(merges.forall { case (a, b) => (a + b).replace("</w>", "").forall(c => c == 'z') })
    // uncapped default keeps everything
    assert(Bpe.wordCounts(docs, "text").length === 4)
  }
}
