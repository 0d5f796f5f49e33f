package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich, Haddow & Birch,
  * ACL 2016) — the tokenizer-training step of an LLM data pipeline,
  * split the way production tokenizer trainers split it:
  *
  *  - the CORPUS-scale pass is the distributed word-frequency
  *    aggregation (one explode + one groupBy; at 100 TB this is the
  *    only part that touches every byte);
  *  - the merge loop runs driver-side over the DISTINCT-WORD frequency
  *    table — the bounded-derived-table pattern (IVF centroids, TF-IDF
  *    corpus scalar): vocabulary size grows ~logarithmically with
  *    corpus size and fits driver memory for any real corpus, which is
  *    exactly how HuggingFace/SentencePiece trainers operate.
  *
  * Determinism: the best pair each round is (max count, then
  * lexicographically smallest pair) — reproducible across runs and
  * partitionings, so the learned merge table is spec-checkable.
  * Words are lowercased whitespace tokens with a `</w>` end-of-word
  * sentinel, as in the original paper.
  */
object Bpe {

  type Merge = (String, String)

  private val EndOfWord = "</w>"

  /** Hard cap on the distinct-word table the merge loop collects.
    * Vocabulary grows ~logarithmically with corpus size on natural
    * text, but an adversarial corpus (random strings) is unbounded —
    * the cap keeps the driver table bounded by CONSTRUCTION, the same
    * frequency-cutoff HF tokenizer trainers apply. 1M words ≈ tens of
    * MB; plans as TakeOrderedAndProject (distributed per-partition
    * top-N, one k-row merge), never a full sort.
    */
  val DefaultMaxVocab = 1000000

  /** Word → frequency via the distributed aggregation, collected as the
    * bounded vocabulary table: the `maxVocab` most frequent words, ties
    * broken lexicographically so the table (and everything learned from
    * it) stays deterministic under partitioning.
    */
  def wordCounts(df: DataFrame, textCol: String,
      maxVocab: Int = DefaultMaxVocab): Array[(String, Long)] =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))

  /** Learn `numMerges` BPE merges from the corpus. Returns the ordered
    * merge list — earlier = higher priority.
    */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = DefaultMaxVocab): Seq[Merge] = {
    var vocab: Map[Vector[String], Long] = wordCounts(df, textCol, maxVocab).map {
      case (w, c) => (w.map(_.toString).toVector :+ EndOfWord) -> c
    }.toMap
    val merges = Seq.newBuilder[Merge]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      round += 1
      val pairCounts = scala.collection.mutable.Map.empty[Merge, Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts((syms(i), syms(i + 1))) += c
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        vocab = vocab.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> c
        }
      }
    }
    merges.result()
  }

  /** Apply a learned merge list to one word (greedy by merge priority —
    * the standard BPE segmenter). Referenced per-row from
    * [[tokenize]]'s mapPartitions; allocation-light.
    */
  def segmentWord(word: String, rank: Map[Merge, Int]): Vector[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    var changed = true
    while (changed && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) changed = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  /** Tokenize a corpus with a learned merge table: (id, n_tokens) per
    * document. The merge table broadcasts (KBs); segmentation is a
    * narrow mapPartitions pass — per-word sequential merging is the
    * legitimate mapPartitions case, like [[Packing.packGreedy]]'s
    * per-shard state.
    */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rank)
    df.select(col(idCol).cast("long").as("id"),
        split(lower(trim(col(textCol))), "\\s+").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val r = bc.value
        it.map { case (id, words) =>
          (id, words.iterator.filter(_.nonEmpty)
            .map(w => segmentWord(w, r).length.toLong).sum)
        }
      }
      .toDF("doc_id", "n_bpe_tokens")
  }
}
