package graft.pipeline

import graft.SparkSpec
import graft.functions.FnvHash64
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("fnv64 expression matches the reference implementation and codegen runs") {
    import spark.implicits._
    val df = Seq("hello", "", "the quick brown fox", "ünïcødé").toDF("text")
    val got = df.select(col("text"), FnvHash64(col("text")).as("fp")).collect()
    got.foreach { r =>
      val expected = FnvHash64.hashBytes(r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) === expected, s"for '${r.getString(0)}'")
    }
    // known-answer check (FNV-1a 64 of "hello")
    val hello = got.find(_.getString(0) == "hello").get.getLong(1)
    assert(hello === 0xa430d84680aabd0bL)
  }

  test("repetitionProfile counts top-bigram mass and duplicate trigrams") {
    import spark.implicits._
    // "a b a b a b": bigrams = [a b, b a, a b, b a, a b] → top "a b"=3 of 5;
    // trigrams = [a b a, b a b, a b a, b a b] → 2 distinct of 4 → dup 0.5
    // "x y z w": all grams unique → top bigram 1/3, dup 0
    val df = Seq((1L, "a b a b a b"), (2L, "x y z w")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((3L, 0.6, 0.5, false)))
    assert(got(2L) === ((1L, 0.3333, 0.0, false)))
    // a long unique doc passes both thresholds
    val long = (1 to 100).map(i => s"w$i").mkString(" ")
    val keep = TextAnalysis.repetitionProfile(
        Seq((3L, long)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    assert(keep.getBoolean(4))
  }

  test("langId picks the language with most marker hits") {
    import spark.implicits._
    val df = Seq(
      ("the cat of a king and the queen", "en"),
      ("el rey de la casa que canta", "es"),
      ("der hund und die katze das haus", "de"),
      ("le chat et les chiens des villes", "fr"),
      ("xyzzy plugh", "und")).toDF("text", "expected")
    val res = df.select(TextAnalysis.langId(col("text")).as("got"), col("expected")).collect()
    res.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("bm25 matches the hand-computed Okapi model") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark joins rows"),          // tf(spark)=2, dl=4
      (2L, "spark scans tables"),              // tf(spark)=1, dl=3
      (3L, "rows and tables and rows again"))  // no query term, dl=6
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25(df, "doc_id", "text", Seq("spark", "scans"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // reference model, computed independently of the Spark expression
    val n = 3.0
    val avgdl = (4 + 3 + 6) / 3.0
    def idf(dfreq: Int) = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
    def term(tf: Int, dl: Long, dfreq: Int) = {
      val c = idf(dfreq) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
      math.floor(c * 1e6 + 0.5)
    }
    def score(parts: Double*) =
      BigDecimal(parts.sum / 1e6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((1L, score(term(2, 4, 2)))))
    assert(got(2L) === ((2L, score(term(1, 3, 2), term(1, 3, 1)))))
    assert(!got.contains(3L)) // no matched term -> no row, by design
  }

  test("gopher repetition stats flag the degenerate documents") {
    import spark.implicits._
    val df = Seq(
      (1L, "a normal sentence with reasonably varied words throughout here"),
      (2L, "spam spam spam spam spam spam spam spam spam spam"), // dup frac 0.9
      (3L, "12 34 56 78 90 11 22 33 44 55"),                     // no alpha words
      (4L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"))      // mean len 44
      .toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        TextAnalysis.meanWordLen(col("text")).as("mwl"),
        TextAnalysis.dupWordFrac(col("text")).as("dwf"),
        TextAnalysis.alphaWordFrac(col("text")).as("awf"),
        TextAnalysis.gopherKeep(col("text")).as("keep"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(4))
    assert(!r(2L).getBoolean(4) && r(2L).getDouble(2) > 0.8)
    assert(!r(3L).getBoolean(4) && r(3L).getDouble(3) === 0.0)
    assert(!r(4L).getBoolean(4) && r(4L).getDouble(1) === 44.0)
  }

  test("pii scrub counts and redacts emails, ips, and id numbers") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact bob.smith+x@example.org or 10.0.0.1 ref 123-45-6789 ok"),
      (2L, "clean text with no sensitive tokens at all"))
      .toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        TextAnalysis.piiCount(col("text")).as("n"),
        TextAnalysis.scrubPii(col("text")).as("s"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(1) === 3)
    assert(r(1L).getString(2) === "contact <EMAIL> or <IP> ref <ID> ok")
    assert(r(2L).getInt(1) === 0)
    assert(r(2L).getString(2) === "clean text with no sensitive tokens at all")
  }

  test("token counts and quality are sane") {
    import spark.implicits._
    val df = Seq("The quick brown fox, version 2.0!").toDF("text")
    val r = df.select(
      TextAnalysis.wsTokens(col("text")).as("ws"),
      TextAnalysis.bpeTokens(col("text")).as("bpe"),
      TextAnalysis.qualityScore(col("text")).as("q")).collect()(0)
    assert(r.getInt(0) === 6)
    // The|quick|brown|fox|,|version|2|.|0|! = 10
    assert(r.getInt(1) === 10)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("corpus filter reports the first failing rule in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "too short"),                                           // < 10 tokens
      (2L, ("ab " * 12).trim),                                     // repeats beat word-shape? mwl=2 -> word_shape first
      (3L, "the cat and the dog ran over the road and then came home again yes"),
      (4L, "el la de que " + "uno dos tres cuatro cinco seis siete ocho nueve diez"),
      (5L, "the cat and the dog contact bob@example.com over the road and then again")
    ).toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
        TextAnalysis.filterReason(col("text")).as("reason"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "too_short")
    assert(r(2L) === "word_shape") // mean word len 2 fails before the repetition rule
    assert(r(3L) === "ok")
    assert(r(4L) === "lang")
    assert(r(5L) === "pii")
  }

  test("approx distinct stays within 5% of exact on a planted id set") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => (i, s"text-${i % 7000}")).toDF("id", "text")
    val r = df.agg(
      org.apache.spark.sql.functions.approx_count_distinct(col("id")).as("aid"),
      org.apache.spark.sql.functions.approx_count_distinct(col("text")).as("atx"))
      .collect()(0)
    assert(math.abs(r.getLong(0) - 20000L) <= 1000L)
    assert(math.abs(r.getLong(1) - 7000L) <= 350L)
  }

  test("approx_percentile stays within 2% of exact (the declared 100TB swap)") {
    // rows 80/93 claim `percentile` ⇄ `approx_percentile` is a drop-in
    // swap at scale; pin the sketch's error on a skewed distribution so
    // the claim is a measured contract, not prose
    import spark.implicits._
    val df = (1L to 50000L).map(i => (i * i) % 9973).toDF("x")
    val r = df.agg(
      org.apache.spark.sql.functions.expr("percentile(x, array(0.5, 0.95))").as("exact"),
      org.apache.spark.sql.functions
        .expr("approx_percentile(x, array(0.5, 0.95), 10000)").as("approx"))
      .collect()(0)
    val exact = r.getSeq[Double](0)
    val approx = r.getSeq[Long](1).map(_.toDouble)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) / math.max(e, 1.0) < 0.02, s"exact $e vs approx $a")
    }
  }

  test("boilerplate fraction counts corpus-common n-grams per doc") {
    import spark.implicits._
    // "aa bb" appears in 3 docs (DF 3); every other bigram is unique
    val docs = Seq(
      (1L, "aa bb cc"), (2L, "aa bb dd"), (3L, "aa bb"),
      (4L, "xx yy zz")).toDF("doc_id", "text")
    val r = TextAnalysis.boilerplateFrac(docs, "doc_id", "text", n = 2, minDf = 3L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) === ((2L, 1L, 0.5)))
    assert(r(2L) === ((2L, 1L, 0.5)))
    assert(r(3L) === ((1L, 1L, 1.0))) // 2-word doc: its single bigram is the common one
    assert(r(4L) === ((2L, 0L, 0.0)))
  }

  test("blocklist counts phrase hits case-insensitively, metachars stay literal") {
    import spark.implicits._
    val phrases = Seq("click here", "v1.0 (beta)")
    val docs = Seq(
      (1L, "Click HERE and click here again"),
      (2L, "running v1.0 (beta) today; v1x0 abetab should NOT match"),
      (3L, "nothing to see")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.blocklistCount(col("text"), phrases).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 2, 2L -> 1, 3L -> 0))
  }

  test("nfc normalize collapses decomposed sequences, identity on ASCII and NFC input") {
    import spark.implicits._
    val composed = "caf\u00e9" // e-acute as one codepoint
    val decomposed = "cafe\u0301" // e + combining acute
    val docs = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"))
      .toDF("id", "text")
    val got = docs.select(col("id"),
        graft.functions.NfcNormalize(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === composed)
    assert(got(2L) === composed) // the two forms now hash identically
    assert(got(3L) === "plain ascii")
    // exercised in BOTH execution modes (same pattern as the other
    // custom expressions): interpreted eval must agree with codegen
    val interp = graft.functions.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed),
        org.apache.spark.sql.types.StringType))
      .eval(null).toString
    assert(interp === composed)
  }

  test("bigram LM score matches the hand-computed smoothed model") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLm(docs, "doc_id", "text", k = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // model: c(a,b)=2 c(a,c)=1, context c(a)=3, V=|{b,c}|=2
    // P(b|a) = (2+0.5)/(3+0.5·2) = 0.625 ; P(c|a) = 1.5/4 = 0.375
    val lnPb = BigDecimal(math.log(0.625))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lnPc = BigDecimal(math.log(0.375))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((1L, lnPb)))
    assert(got(2L) === ((1L, lnPb)))
    assert(got(3L) === ((1L, lnPc)))
    // the 1-token doc has no bigrams and drops out
    assert(!got.contains(4L))
  }

  test("vocab coverage ranks by tf with word tiebreak and accumulates token share") {
    import spark.implicits._
    val docs = Seq("a a b", "b c").toDF("text")
    // tf: a=2, b=2, c=1; total 5; order (tf desc, word): a, b, c
    val rows = TextAnalysis.vocabCoverage(docs, "text", topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq((1L, "a", 2L, 0.4), (2L, "b", 2L, 0.8)))
  }

  test("char entropy: known answers, positive zero, uniform = log2(alphabet)") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, "a"))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        round(TextAnalysis.charEntropy(col("text")), 6).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 0.0))
    // the zero must be POSITIVE zero (oracle parity: +0.0 vs -0.0 hash
    // differently after string formatting)
    assert(java.lang.Double.doubleToRawLongBits(got(1L)) === 0L)
  }

  test("pmi pairs match the hand computation, floor drops singletons") {
    import spark.implicits._
    // tokens a b a b: window-2 pairs = (a,b)x3, (a,a)x1, (b,b)x1;
    // floor 2 keeps only (a,b). T=4, c(a)=c(b)=2 -> pmi = ln(3*4/4)
    val docs = Seq("a b a b").toDF("text")
    val got = TextAnalysis.pmiPairs(docs, "text", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(("a", "b", 3L,
      BigDecimal(math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // layout purity
    val again = TextAnalysis.pmiPairs(docs.repartition(4), "text", 2L).collect()
    assert(again.length === 1)
  }

  test("char entropy matches the closed-form model on random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val docs = (1L to 60L).map { i =>
      val len = 1 + rnd.nextInt(80)
      (i, Seq.fill(len)(('a' + rnd.nextInt(6)).toChar).mkString)
    }
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.charEntropy(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.foreach { case (id, s) =>
      val n = s.length.toDouble
      val model = -s.groupBy(identity).values
        .map(g => g.size / n).map(p => p * math.log(p) / math.log(2.0)).sum
      assert(math.abs(got(id) - model) < 1e-9, s"doc $id: ${got(id)} vs $model")
    }
  }

  test("perplexity buckets cut each language into equal thirds, fluent first") {
    import spark.implicits._
    // 6 'aa' docs per lang; fluency decreases as rarer bigrams appear
    val docs = (1L to 6L).map(i =>
        (i, ("aa " * (7 - i.toInt)).trim + " zz" + i, "en")) ++
      (7L to 12L).map(i => (i, ("bb " * (13 - i.toInt)).trim + " yy" + i, "de"))
    val got = TextAnalysis.perplexityBuckets(
        docs.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    // 2 docs per (lang, bucket)
    val sizes = got.groupBy(r => (r._2, r._4)).view.mapValues(_.length).toMap
    assert(sizes.values.toSet === Set(2))
    assert(sizes.keySet === Set("en", "de").flatMap(l => (1L to 3L).map(l -> _)))
    // within a language, no doc in a later bucket outscores an earlier one
    for (l <- Seq("en", "de"); a <- got; b <- got
         if a._2 == l && b._2 == l && a._4 < b._4)
      assert(a._3 >= b._3)
  }
}
