package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation (SURVEY §2.7 rows 50-52):
  * language ID, quality scoring, token counting. Everything is pure
  * `functions._` column arithmetic — codegen'd, no UDFs, and exactly
  * replicable as SQL for the DuckDB oracle.
  */
object TextAnalysis {

  /** Non-overlapping whole-word occurrence count. */
  def wordCount(textCol: Column, word: String): Column =
    regexp_count(textCol, lit(s"\\b$word\\b"))

  /** Marker stopwords per language — tiny fixed lists so the score is a
    * handful of regexp counts per row.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "des"))

  def langScore(textCol: Column, lang: String): Column =
    markers(lang).map(wordCount(textCol, _)).reduce(_ + _)

  /** N-gram/stopword language ID: argmax of the marker-hit counts with a
    * fixed priority tiebreak (en > es > de > fr), 'und' (undetermined)
    * when nothing hits.
    */
  def langId(textCol: Column): Column = {
    val scores = Seq("en", "es", "de", "fr").map(l => l -> langScore(textCol, l))
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  def wsTokens(textCol: Column): Column = size(split(trim(textCol), "\\s+"))

  /** BPE-ish token estimate: alpha runs, digit runs, and single
    * punctuation marks each count as one token.
    */
  def bpeTokens(textCol: Column): Column =
    regexp_count(textCol, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  def punctRatio(textCol: Column): Column =
    regexp_count(textCol, lit("[^A-Za-z0-9\\s]")).cast("double") /
      greatest(length(textCol), lit(1)).cast("double")

  def stopwordRatio(textCol: Column): Column =
    langScore(textCol, "en").cast("double") /
      greatest(wsTokens(textCol), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length saturation (40%), low
    * punctuation (30%), stopword presence (30%) — the standard cheap
    * heuristics bundle.
    */
  def qualityScore(textCol: Column): Column = {
    val lengthTerm = least(wsTokens(textCol).cast("double") / 100.0, lit(1.0))
    val punctTerm = lit(1.0) - least(punctRatio(textCol) * 10.0, lit(1.0))
    val stopTerm = least(stopwordRatio(textCol) * 4.0, lit(1.0))
    lengthTerm * 0.4 + punctTerm * 0.3 + stopTerm * 0.3
  }

  // ------------------------------------------------- repetition filters

  /** Gopher/C4-style cheap repetition + shape statistics (public
    * heuristics from Rae et al. 2021 §A1.1 and Raffel et al. 2020 §2.2,
    * re-expressed as one narrow codegen pass): mean word length,
    * duplicate-word fraction, alphabetic-word fraction, and the
    * composite keep/drop verdict. All ratios are exact integer
    * divisions in double precision, so the verdict thresholds compare
    * identically in any engine.
    */
  def meanWordLen(textCol: Column): Column = {
    val toks = split(trim(textCol), "\\s+")
    aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
      size(toks).cast("double")
  }

  def dupWordFrac(textCol: Column): Column = {
    val toks = split(trim(textCol), "\\s+")
    lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks).cast("double")
  }

  def alphaWordFrac(textCol: Column): Column = {
    val toks = split(trim(textCol), "\\s+")
    size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
      size(toks).cast("double")
  }

  /** The composite repetition-filter verdict (thresholds are the
    * standard published ballpark: mean word length 3-10, < 60%
    * duplicate words, ≥ 80% alphabetic words).
    */
  def gopherKeep(textCol: Column): Column =
    meanWordLen(textCol).between(3.0, 10.0) &&
      dupWordFrac(textCol) < 0.6 &&
      alphaWordFrac(textCol) >= 0.8

  /** Fixed-weight logistic quality model over the shape features — the
    * served form of a trained linear quality classifier (the
    * fastText/DCLM-style filter): one codegen arithmetic pass ending in
    * a sigmoid. Weights are published-ballpark constants; a deployment
    * swaps in trained ones and nothing else changes. The keep verdict
    * compares the LOGIT against 0 (not the sigmoid against 0.5): z is
    * plain ±× double arithmetic, identical in any engine, while exp()
    * could differ in the last ULP.
    */
  def qualityLogit(textCol: Column): Column =
    lit(-3.0) +
      meanWordLen(textCol) * lit(0.35) +
      alphaWordFrac(textCol) * lit(1.5) -
      dupWordFrac(textCol) * lit(2.0) +
      least(wsTokens(textCol).cast("double") / lit(200.0), lit(1.0)) * lit(1.2)

  def qualityLogitProb(textCol: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-qualityLogit(textCol)))

  // --------------------------------------------------------- PII scrub

  /** Conservative PII patterns (email, IPv4, SSN-shaped ids) — RE2/Java
    * compatible so the Spark plan and a DuckDB oracle match byte for
    * byte on the scrubbed text.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<ID>")

  /** Count of PII matches in the original text. */
  def piiCount(textCol: Column): Column =
    piiPatterns.map { case (p, _) => regexp_count(textCol, lit(p)) }.reduce(_ + _)

  /** Text with every PII match replaced by its tag, patterns applied in
    * declaration order (order matters: a replaced email no longer
    * contains digit runs).
    */
  def scrubPii(textCol: Column): Column =
    piiPatterns.foldLeft(textCol) { case (c, (p, tag)) => regexp_replace(c, p, tag) }

  /** Phrase-blocklist hits: occurrences of any blocklisted phrase
    * (case-insensitive, whole-phrase) — the standard
    * blocklist-filtering curation step (spam/adult/boilerplate phrase
    * lists), distinct from PII (shape-based) and decontamination
    * (target-set n-grams). One alternation regex per row, codegen'd;
    * the (bounded) phrase list rides in the pattern literal, exactly
    * how a broadcast multi-pattern matcher degenerates when the list is
    * small. Phrases are metachar-escaped (portably — `\Q…\E` is Java-
    * only and would break the RE2 oracle), so the list is data not
    * syntax.
    */
  def blocklistCount(textCol: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "blocklist must not be empty")
    regexp_count(lower(textCol), lit(blocklistPattern(phrases)))
  }

  /** The alternation pattern, shared with the oracle generator. */
  def blocklistPattern(phrases: Seq[String]): String =
    phrases.map(_.replaceAll("([\\\\.\\[\\]{}()*+?^$|])", "\\\\$1"))
      .mkString("(?:", ")|(?:", ")")

  // ------------------------------------------------------------- tf-idf

  /** Per-(document, term) TF-IDF over whitespace tokens: tf = in-doc
    * occurrence count, idf = ln(N / df) with df the number of documents
    * containing the term. Two shuffles (the doc-term and term
    * aggregations); the corpus size N rides in as a broadcast scalar
    * subplan — no driver action, no window-over-everything. The
    * standard relevance/keyword-extraction scan over a training corpus.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
  }

  /** Okapi BM25 relevance of every document to a fixed query-term set
    * (Robertson et al., TREC-3 — the ranking function behind
    * Lucene/Elasticsearch and the lexical retriever of choice when
    * selecting training data against a query mix). Components: per-doc
    * term frequency over the query terms only, doc length `dl` in
    * whitespace tokens, per-term document frequency `df`, and the
    * corpus stats (N, avgdl) as ONE broadcast scalar subplan.
    *
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))        (Lucene form —
    *              strictly positive, no negative-idf clamp needed)
    *   score(d) = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))
    *
    * Scale posture: the corpus is scanned once and immediately
    * collapsed to the (doc, matched-query-term) table — every shuffled
    * row is a MATCH, never a corpus token; df/stats are query-term- and
    * one-row-bounded broadcasts. Cross-engine parity: each per-term
    * contribution is integerized at 6 dp and the per-doc score is the
    * EXACT integer sum divided once (the dataset-card mean discipline —
    * a float Σ over terms would be summation-order ULP noise).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
        split(lower(trim(col(textCol))), "\\s+").as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val tf = docs.select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / avgdl))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col("id"), floor(contrib * 1e6 + 0.5).as("c6"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c6")).as("s6"))
      // 4dp display via EXACT integer round-half-up of the 6dp integer
      // sum: round(S/1e6, 4) lands on an exact .5 whenever S ≡ 50 mod
      // 100, and engines split on halves (Spark HALF_UPs the shortest
      // decimal repr, DuckDB rounds the raw binary double). Integer
      // arithmetic has no halves; the final /10000.0 is one identical
      // division of the same integer on both engines.
      .select(col("id"), col("n_terms"),
        (expr("(s6 + 50) DIV 100").cast("double") / 10000.0).as("bm25"))
  }

  /** The end-to-end curation verdict: first failing rule in a fixed
    * order (short → word shape → repetition → alphabetic share →
    * language → PII), 'ok' when everything passes — the composition a
    * production corpus filter runs as ONE narrow codegen pass per
    * document, with the reason string making the drop ledger auditable
    * (every curation pipeline reports per-reason drop counts).
    */
  def filterReason(textCol: Column, minTokens: Int = 10): Column =
    when(wsTokens(textCol) < minTokens, "too_short")
      .when(!meanWordLen(textCol).between(3.0, 10.0), "word_shape")
      .when(dupWordFrac(textCol) >= 0.6, "repetitive")
      .when(alphaWordFrac(textCol) < 0.8, "non_alpha")
      .when(langId(textCol) =!= "en", "lang")
      .when(piiCount(textCol) > 0, "pii")
      .otherwise("ok")

  /** Within-document n-gram repetition profile — the Gopher repetition
    * rules beyond single-word duplication ([[dupWordFrac]] is the
    * 1-gram face): the mass of the single most frequent word bigram and
    * the duplicate share of word trigrams. Boilerplate-generated and
    * loop-generated text scores high on both while passing per-word
    * filters. One positional explode feeds both gram streams (bigram
    * counts via a doc-keyed aggregation, trigram distinctness
    * likewise), so the whole profile is doc-key-partitioned work that
    * scales linearly with token count — no cross-document state at
    * all. The keep verdict compares UNROUNDED ratios (identical
    * division in any engine); the reported fractions are 4dp-rounded
    * display values.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String,
      maxTopBigramFrac: Double = 0.05,
      maxDupTrigramFrac: Double = 0.02): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    // concat is null-propagating: grams that run off the end drop out
    val grams = toks.select(col("id"),
        concat(col("tok"), lit(" "), lead(col("tok"), 1).over(w)).as("bg"),
        concat(col("tok"), lit(" "), lead(col("tok"), 1).over(w),
          lit(" "), lead(col("tok"), 2).over(w)).as("tg"))
      .localCheckpoint()
    val bg = grams.filter(col("bg").isNotNull)
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bigrams"))
    val tg = grams.filter(col("tg").isNotNull)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_trigrams"),
        countDistinct(col("tg")).as("n_distinct_trigrams"))
    val tbf = col("top_bigram_n").cast("double") / col("n_bigrams")
    // LEFT join from the bigram stats: a 2-token document has one
    // bigram but no trigram row — it keeps its bigram profile and its
    // (vacuous) dup_trigram_frac is 0. Domain note: documents with
    // fewer than 2 tokens have no bigram either and emit no row.
    val dtf = coalesce(lit(1.0) -
      col("n_distinct_trigrams").cast("double") / col("n_trigrams"), lit(0.0))
    bg.join(tg, Seq("id"), "left")
      .select(col("id"), col("top_bigram_n"),
        round(tbf, 4).as("top_bigram_frac"),
        round(dtf, 4).as("dup_trigram_frac"),
        (tbf <= maxTopBigramFrac && dtf <= maxDupTrigramFrac).as("keep"))
  }

  // ------------------------------------------------- corpus-level signals

  /** Per-document boilerplate fraction: the share of a document's
    * distinct word n-grams whose corpus document frequency is ≥ minDf —
    * the C4/RefinedWeb-style template-detection signal (a page whose
    * n-grams are mostly corpus-common is navigation/boilerplate, not
    * content). One shingling pass feeds both the DF aggregation and the
    * per-doc join; shuffles on the n-gram key and the doc key only. At
    * 100 TB the join key swaps to [[Dedup.hashedShingles]] (16-byte
    * keys) without changing the shape.
    */
  def boilerplateFrac(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long): DataFrame = {
    // one exploded (id, shingle) table feeds two legs — materialize once
    val sh = Dedup.shingles(df, idCol, textCol, n).localCheckpoint()
    val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_common"))
      .select(col("id"), col("n_ngrams"), col("n_common"),
        round(col("n_common").cast("double") / col("n_ngrams"), 6).as("common_frac"))
  }

  /** Vocabulary coverage curve: the top-k corpus words by total term
    * frequency with each word's cumulative share of all tokens — the
    * tokenizer-design / Zipf-audit view of a corpus. The heavy work is
    * one token-count aggregation; the rank/cumsum window runs over the
    * VOCABULARY (bounded, ≪ corpus — same posture as tf-idf's broadcast
    * scalar), and the total-token count rides in as a broadcast scalar
    * subplan, not a window over everything. Deterministic ordering:
    * (tf desc, word) everywhere, so rank, cumsum, and the top-k cutoff
    * are engine-stable.
    */
  def vocabCoverage(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("tf"))
    val total = counts.agg(sum(col("tf")).as("total_tf"))
    // distributed top-k FIRST (TakeOrdered — per-partition heads, one
    // k-bounded merge), THEN the rank/cumsum window over the ≤ topK
    // cut: rank r's cumsum reads only rows ranked ≤ r, all inside the
    // cut, so the output is row-identical to windowing the full vocab —
    // without the single-partition vocabulary sort (vocab at web scale
    // is hundreds of millions of tokens; topK is the bound)
    val w = Window.orderBy(col("tf").desc, col("word"))
    counts.orderBy(col("tf").desc, col("word")).limit(topK)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_tf", sum(col("tf")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank").cast("long").as("rank"), col("word"), col("tf"),
        round(col("cum_tf").cast("double") / col("total_tf"), 8).as("cum_frac"))
  }

  /** Bigram language-model quality score (the CCNet/KenLM-style
    * statistical filter, self-trained): fit an add-k-smoothed word
    * bigram model on the corpus itself, then score each document by the
    * mean log-probability of its bigram instances —
    * ln((c(prev,cur)+k) / (c(prev)+k·V)) averaged with multiplicity.
    * Documents far below the corpus mean read as gibberish / boilerplate
    * / wrong-register text. Three shuffles (bigram agg, context agg,
    * model join) + the per-doc agg; the model tables are vocabulary-
    * bounded (≪ corpus) and V rides in as a broadcast scalar subplan.
    * Docs with < 2 tokens have no bigrams and drop out, matching the
    * oracle's bigram CTE.
    */
  def bigramLm(df: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    val t = df.select(col(idCol).as("id"),
        split(lower(trim(col(textCol))), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
    // adjacent-pair explode: zip the array against its own tail (narrow,
    // one pass); materialize once — it feeds the model aggregations AND
    // the per-doc scoring join
    val bi = t.select(col("id"),
        explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur")))).as("bg"))
      .select(col("id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .localCheckpoint()
    val cbg = bi.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c"))
    val cu = cbg.groupBy(col("prev")).agg(sum(col("c")).as("n"))
    val v = cbg.agg(countDistinct(col("cur")).as("v"))
    bi.join(cbg, Seq("prev", "cur")).join(cu, Seq("prev"))
      .crossJoin(broadcast(v))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c") + k) / (col("n") + col("v") * k))), 4)
          .as("lm_score"))
  }

  /** Shannon entropy (bits) of the per-document CHARACTER distribution —
    * the compression-ratio quality proxy: near-zero entropy is
    * repeated-character junk, unusually high entropy is base64/binary
    * spill; natural prose sits in a stable band. Computed row-locally
    * with higher-order functions (distinct chars × occurrences — the
    * alphabet is bounded, so O(|Σ|·len) per row) in ONE narrow pass,
    * ZERO shuffles: the per-(doc, char) groupBy formulation would
    * shuffle corpus × avg-len rows for the same answer. (HOFs evaluate
    * outside whole-stage codegen, but a narrow scan-projection is
    * I/O-bound either way — the shuffle saved is the win.) Matches
    * DuckDB's `entropy()` aggregate (base-2 Shannon) for the oracle.
    */
  def charEntropy(textCol: Column): Column = {
    val chars = filter(split(textCol, ""), c => length(c) > 0)
    val n = size(chars).cast("double")
    val probs = transform(array_distinct(chars),
      c => size(filter(chars, x => x === c)).cast("double") / n)
    // 0.0 - sum, not unary minus: a single-character text sums to 0.0
    // and -0.0 would print/hash differently from the oracle's +0.0
    lit(0.0) - aggregate(probs, lit(0.0), (acc, p) => acc + p * log(2.0, p))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * document with the corpus-fit bigram LM ([[bigramLm]]), then cut
    * each language into `n` equal-population buckets — bucket 1 ("head")
    * is the most-fluent slice that curation keeps at full weight,
    * the last ("tail") the usual drop/downsample candidate. Ties are
    * broken on the ROUNDED score then the id, so the cut is ULP-stable
    * across engines. ntile's per-language sort is fine at bench scale
    * and replicates exactly in SQL; at 100 TB a deployment swaps the
    * window for per-language approx-quantile cutoffs broadcast back —
    * the published recipe also derives its cutoffs from a sample.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String, n: Int = 3): DataFrame = {
    val scored = bigramLm(df, idCol, textCol)
      .join(df.select(col(idCol).as("id"), col(langCol).as("lang")), Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("lm_score").desc, col("id"))
    scored.select(col("id"), col("lang"), col("lm_score"),
      ntile(n).over(w).cast("long").as("bucket"))
  }

  /** Pointwise mutual information over token co-occurrence pairs
    * (window ≤ 2, canonicalized a ≤ b) — the word2vec/GloVe-era
    * association signal: which token pairs co-occur more than their
    * unigram frequencies predict. pmi = ln(c(a,b)·T / (c(a)·c(b))),
    * T the corpus token count — the standard corpus formulation.
    *
    * The pair explosion is the co-purchase slice trick (per-row HOF,
    * narrow); then two bounded aggregations (pairs, unigrams) and a
    * join keyed on the vocabulary — at 100 TB the model tables stay
    * vocabulary-bounded exactly like TF-IDF's, and the corpus is read
    * once. Pairs below `minPairCount` are dropped (the standard noise
    * floor; PMI on singletons is meaningless).
    */
  def pmiPairs(df: DataFrame, textCol: String, minPairCount: Long = 2L): DataFrame = {
    val t = df.select(split(lower(trim(col(textCol))), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .localCheckpoint() // feeds the pair AND unigram aggregations
    val pairs = t.select(explode(flatten(transform(col("w"), (x, i) =>
        transform(slice(col("w"), i + 2, lit(2)),
          y => struct(least(x, y).as("a"), greatest(x, y).as("b")))))).as("p"))
      .groupBy(col("p.a").as("w1"), col("p.b").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    val uni = t.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("t"))
    pairs
      .join(broadcast(uni.select(col("tok").as("w1"), col("c").as("c1"))), Seq("w1"))
      .join(broadcast(uni.select(col("tok").as("w2"), col("c").as("c2"))), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_pair"),
        // double arithmetic throughout: long·long products overflow at
        // corpus scale, and the oracle must mirror the exact fp ops
        round(log(col("n_pair").cast("double") * col("t").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))), 6).as("pmi"))
  }

  /** Full per-document text profile. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      langId(col(textCol)).as("lang_guess"),
      wsTokens(col(textCol)).cast("long").as("ws_tokens"),
      bpeTokens(col(textCol)).cast("long").as("bpe_tokens"),
      round(qualityScore(col(textCol)), 4).as("quality"))
}
