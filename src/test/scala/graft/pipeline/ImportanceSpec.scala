package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {

  // target docs speak in "good good" bigrams, the rest in "junk junk";
  // a held-out doc of each flavor must be pulled toward its model
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "good text good text good text", true),
      (2L, "good text good text", true),
      (3L, "junk spam junk spam junk spam", false),
      (4L, "junk spam junk spam", false),
      (5L, "good text good text good", false), // target-like non-target doc
      (6L, "one", false), // < 2 tokens — no features
      (7L, "junk spam", false)).toDF("doc_id", "text", "is_tgt")
  }

  test("dsir weights rank target-like docs above anti-target docs") {
    val got = Importance.dsirWeights(corpus, "doc_id", "text", col("is_tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every target-flavored doc (incl. doc 5, which is NOT in the
    // target set) outranks every junk doc — absolute sign is not
    // asserted because add-alpha smoothing over 256 buckets dominates
    // a 7-doc corpus's counts
    for (g <- Seq(1L, 2L, 5L); j <- Seq(3L, 4L, 7L)) assert(got(g) > got(j))
    // no-feature doc drops out, like the bigram LM
    assert(!got.contains(6L))
  }

  test("dsir weights are layout-pure and mean-log-ratio by construction") {
    val base = Importance.dsirWeights(corpus, "doc_id", "text", col("is_tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val again = Importance.dsirWeights(corpus.repartition(7, col("text")),
        "doc_id", "text", col("is_tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(again === base)
    // n_feats is tokens-1 for each surviving doc
    val feats = base.map(t => t._1 -> t._2).toMap
    assert(feats(1L) === 5L && feats(2L) === 3L && feats(7L) === 1L)
  }

  test("dsir matches a from-scratch Scala model on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (1L to 40L).map { i =>
      val len = 2 + rnd.nextInt(10)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        rnd.nextBoolean())
    }
    val got = Importance.dsirWeights(docs.toDF("doc_id", "text", "t"),
        "doc_id", "text", col("t"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

    // independent model: same bucketing, counts, smoothing, mean
    def bucket(a: String, b: String): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$a $b").take(2)
    val feats = docs.map { case (id, text, t) =>
      val w = text.split("\\s+").toSeq
      (id, t, w.zip(w.tail).map { case (a, b) => bucket(a, b) })
    }
    val all = feats.flatMap(_._3)
    val tgt = feats.filter(_._2).flatMap(_._3)
    val rc = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tc = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tn, rn) = (tgt.size.toDouble, all.size.toDouble)
    def ratio(b: String): Double =
      math.log((tc.getOrElse(b, 0L) + 1.0) / (tn + 256.0)) -
        math.log((rc(b) + 1.0) / (rn + 256.0))
    feats.foreach { case (id, _, bs) =>
      val model = bs.map(ratio).sum / bs.size
      val (nf, w) = got(id)
      assert(nf === bs.size.toLong)
      assert(math.abs(w - model) < 2e-6, s"doc $id: $w vs $model")
    }
  }

  test("identical target and raw distributions give ~zero weights") {
    import spark.implicits._
    // every doc is in the target: p_t deviates from p_r only through
    // the smoothing-denominator difference, so weights land near zero
    // and EQUAL for identical docs
    val docs = Seq((1L, "a b a b"), (2L, "a b a b"), (3L, "a b a b"))
      .toDF("doc_id", "text")
    val got = Importance.dsirWeights(docs, "doc_id", "text", lit(true))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.values.toSet.size === 1)
    assert(math.abs(got(1L)) < 1e-6)
  }
}
