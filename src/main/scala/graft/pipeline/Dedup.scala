package graft.pipeline

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines (SURVEY §2.7 rows
  * 43-47). All variants are shuffle-bounded:
  *
  *  - exact:     one hash-groupBy on a 256-bit content digest
  *  - MinHash:   O(n·shingles) map + one groupBy (signatures) + one
  *               band-bucket self-join → candidates, never O(n²)
  *  - SimHash:   same shape with 16-bit chunk buckets
  *  - Jaccard:   exact verification restricted to candidate pairs
  *  - embedding: cosine over bucketed/bounded pair sets
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by content digest: keep the smallest id per distinct
    * (normalized) text; n_copies reports the multiplicity. Grouping on
    * sha2 rather than the raw text keeps shuffle rows narrow — at 100 TB
    * the digest is 32 bytes while documents are KBs.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // -------------------------------------------------------------- shingles

  /** Word n-gram shingle set per document (distinct, lowercased).
    * Documents shorter than n words contribute their whole text as one
    * shingle. Pure higher-order functions — no UDF, no explode until the
    * caller asks.
    */
  def shingleArray(textCol: Column, n: Int): Column = {
    val tokens = split(lower(trim(textCol)), "\\s+")
    val grams = transform(
      sequence(lit(0), size(tokens) - n),
      i => concat_ws(" ", slice(tokens, i + 1, lit(n))))
    array_distinct(when(size(tokens) >= n, grams).otherwise(array(concat_ws(" ", tokens))))
  }

  /** (id, shingle) exploded pairs. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(shingleArray(col(textCol), n)).as("sh"))

  /** (id, h) — shingles hashed once to 64-bit longs. Downstream set
    * operations (minhash permutations, Jaccard intersections) work on
    * the hash: rows shuffle as 16 bytes instead of strings, and a
    * 64-bit collision (~1e-9 per pair) is far below any dedup
    * threshold's noise floor. Compute once, checkpoint, feed BOTH the
    * signature and the verify stage.
    */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingles(df, idCol, textCol, n).select(col("id"), xxhash64(col("sh")).as("h"))

  // --------------------------------------------------------------- MinHash

  /** MinHash signatures as ONE narrow map stage: the fused codegen
    * expression ([[graft.functions.MinHashSignature]]) folds the whole
    * shingle→hash→min pipeline inside the row, so signature construction
    * shuffles NOTHING at any corpus size (the round-1 explode + groupBy
    * formulation shuffled every (doc, shingle) pair back to its doc).
    * Output: (id, sig: array<long>), bit-identical to
    * [[signaturesFromHashed]].
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.HashFunctions.minhashSignature(
        shingleArray(col(textCol), shingleN), numHashes).as("sig"))

  /** Signatures from a precomputed (id, h) shingle-hash table — lets a
    * candidate-then-verify pipeline shingle the corpus exactly once
    * (the exploded table feeds BOTH this groupBy and the Jaccard verify
    * join, so here the shuffle pays for itself). Same (id, sig) shape
    * and values as [[minhashSignatures]].
    */
  def signaturesFromHashed(sh: DataFrame, numHashes: Int = 64): DataFrame = {
    val aggs = (0 until numHashes).map(i => min(xxhash64(lit(i), col("h"))).as(s"mh$i"))
    sh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))
  }

  // ---------------------------------------------------------- bucket guard

  /** Bound the population of candidate buckets before a bucket
    * self-join. At 100 TB, boilerplate-heavy corpora put millions of
    * near-identical docs into one band bucket (or simhash chunk), and
    * the intra-bucket join explodes quadratically on a single reducer.
    * Oversized buckets are typically near-duplicate cliques — the cheap
    * exact-dup pass ([[exact]]) collapses their identical members — but
    * a mega-bucket of near-but-NOT-identical boilerplate would lose its
    * pairs entirely, so the cap is OPT-IN (default `Long.MaxValue` =
    * no cap) and capped deployments audit what they drop via
    * [[oversizedLshBuckets]]/[[oversizedSimhashBuckets]] and route those
    * cliques to representative sampling. Singleton buckets are always
    * dropped: they cannot form a pair, and pre-shrinking here keeps
    * them out of the self-join's shuffle — that part is lossless.
    *
    * One extra aggregation on the same key the self-join shuffles on —
    * co-partitioned, so the bound costs no additional exchange of the
    * bucket table itself.
    */
  private def boundBuckets(buckets: DataFrame, keys: Seq[String],
      maxBucketSize: Long): DataFrame = {
    val sizes = buckets.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__bn"))
    buckets.join(sizes, keys)
      .filter(col("__bn") >= 2 && col("__bn") <= maxBucketSize)
      .drop("__bn")
  }

  /** (keys..., population) of buckets above `maxBucketSize` — the audit
    * face of [[boundBuckets]]: what a capped run drops from the pairwise
    * path, so lost recall is observable instead of silent.
    */
  private def oversized(buckets: DataFrame, keys: Seq[String],
      maxBucketSize: Long): DataFrame =
    buckets.groupBy(keys.map(col): _*).agg(count(lit(1)).as("population"))
      .filter(col("population") > maxBucketSize)

  /** (id, band, bucket) banded signature keys — shared by the candidate
    * join and its audit face.
    */
  private def bandBuckets(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) — a remainder would " +
        "silently drop signature slots and change the collision S-curve")
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(slots: _*).as("bucket"))
    }
    sigs.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
  }

  /** (id, band, bucket) banded MinHash keys straight from text — the
    * shareable LSH invariant: the candidate join, its oversized-bucket
    * audit, and the Jaccard verify stage all derive from this ONE
    * table, so a deployment materializes it once per corpus snapshot
    * (callers pin it exactly like the graph loop invariants).
    */
  def minhashBandBuckets(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame =
    bandBuckets(minhashSignatures(df, idCol, textCol, shingleN, numHashes),
      numHashes, bands)

  /** Candidate pairs from a precomputed (id, band, bucket) table — pass
    * it CHECKPOINTED: the self-join legs are separate subtrees to
    * Catalyst (AQE does not reuse the exchange across the rename), so
    * an unmaterialized bucket table computes the whole signature
    * pipeline twice (verified via explain("formatted")).
    */
  def lshCandidatesFromBuckets(buckets0: DataFrame,
      maxBucketSize: Long = Long.MaxValue): DataFrame = {
    val buckets = boundBuckets(buckets0, Seq("band", "bucket"), maxBucketSize)
    val right = buckets.select(col("id").as("id2"), col("band").as("band2"), col("bucket").as("bucket2"))
    buckets.join(right,
        col("band") === col("band2") && col("bucket") === col("bucket2") && col("id") < col("id2"))
      .select(col("id").as("id_a"), col("id2").as("id_b"))
      .distinct()
  }

  /** LSH banding: hash each band of rowsPerBand signature slots, explode
    * to (band, bucket) keys, self-join on the bucket. Two docs emerge as
    * a candidate pair iff they collide in ≥1 band — the classic
    * S-curve; with 16 bands × 4 rows the 0.5-Jaccard collision
    * probability is ≈ 0.67. Shuffles on the bucket key only; bucket
    * population is unbounded by default — pass `maxBucketSize` to opt
    * into the skew guard and audit the drops via
    * [[oversizedLshBuckets]] (see [[boundBuckets]]).
    */
  def lshCandidates(sigs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      maxBucketSize: Long = Long.MaxValue): DataFrame =
    lshCandidatesFromBuckets(
      bandBuckets(sigs, numHashes, bands).localCheckpoint(), maxBucketSize)

  /** (band, bucket, population) of band buckets a `maxBucketSize` cap
    * would drop — run alongside a capped [[lshCandidates]] so the lost
    * cliques are counted/routed, never silently discarded.
    */
  def oversizedLshBuckets(sigs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      maxBucketSize: Long = Long.MaxValue): DataFrame =
    oversized(bandBuckets(sigs, numHashes, bands), Seq("band", "bucket"), maxBucketSize)

  /** Audit face over a precomputed (id, band, bucket) table — the
    * pinned-invariant twin of [[oversizedLshBuckets]].
    */
  def oversizedLshBucketsFromBuckets(buckets: DataFrame,
      maxBucketSize: Long = Long.MaxValue): DataFrame =
    oversized(buckets, Seq("band", "bucket"), maxBucketSize)

  /** End-to-end MinHash-LSH near-dup candidates. */
  def minhashDupes(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucketSize: Long = Long.MaxValue): DataFrame =
    lshCandidates(minhashSignatures(df, idCol, textCol, shingleN, numHashes),
      numHashes, bands, maxBucketSize)

  // --------------------------------------------------------------- SimHash

  /** 64-bit SimHash per document: each distinct shingle votes ±1 on every
    * bit of its hash; the sign vector packs into one long. One narrow map
    * via the fused codegen expression ([[graft.functions.SimHash64]]) —
    * no explode, no groupBy, no shuffle (the round-1 formulation
    * shuffled every (doc, shingle) pair for 64 vote sums).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, shingleN: Int = 2): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.HashFunctions.simhash64(
        shingleArray(col(textCol), shingleN)).as("simhash"))

  /** (id, simhash, chunk, bucket) 16-bit-chunk keys — shared by the
    * candidate join and its audit face.
    */
  private def chunkBuckets(sims: DataFrame): DataFrame = {
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL).as("bucket")))
    sims.select(col("id"), col("simhash"), explode(array(chunks: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.chunk").as("chunk"), col("bk.bucket").as("bucket"))
  }

  /** (chunk, bucket, population) of simhash chunk buckets a
    * `maxBucketSize` cap would drop — the audit face of a capped
    * [[simhashDupes]].
    */
  def oversizedSimhashBuckets(sims: DataFrame,
      maxBucketSize: Long = Long.MaxValue): DataFrame =
    oversized(chunkBuckets(sims), Seq("chunk", "bucket"), maxBucketSize)

  /** SimHash near-dup pairs: bucket by each of the four 16-bit chunks
    * (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), verify with
    * `bit_count(xor) <= maxHamming` inside the bucket join. Bucket
    * population unbounded by default — pass `maxBucketSize` to opt into
    * the skew guard (see [[boundBuckets]]), auditing drops via
    * [[oversizedSimhashBuckets]].
    */
  def simhashDupes(sims: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Long = Long.MaxValue): DataFrame = {
    // materialize once — same non-reused self-join legs as lshCandidates
    val buckets = boundBuckets(
      chunkBuckets(sims).localCheckpoint(),
      Seq("chunk", "bucket"), maxBucketSize)
    val right = buckets.select(col("id").as("id2"), col("simhash").as("simhash2"),
      col("chunk").as("chunk2"), col("bucket").as("bucket2"))
    buckets.join(right,
        col("chunk") === col("chunk2") && col("bucket") === col("bucket2") && col("id") < col("id2"))
      .filter(bit_count(col("simhash").bitwiseXOR(col("simhash2"))) <= maxHamming)
      .select(col("id").as("id_a"), col("id2").as("id_b"),
        bit_count(col("simhash").bitwiseXOR(col("simhash2"))).as("hamming"))
      .distinct()
  }

  // --------------------------------------------------------------- Jaccard

  /** Exact word-n-gram Jaccard, evaluated only on the given candidate
    * pairs (the LSH output) — the verify step of the
    * candidate-then-verify dedup pipeline. Intersection via shingle
    * join, union by inclusion-exclusion; shuffles on shingle and pair
    * keys only.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, shingleN: Int = 3): DataFrame =
    ngramJaccardFromHashed(
      hashedShingles(df, idCol, textCol, shingleN).localCheckpoint(), pairs)

  /** Exact Jaccard from a precomputed (id, h) shingle-hash table (the
    * same table the signature stage used — shingle the corpus once).
    * Callers should pass it checkpointed: it feeds three legs (A-side,
    * B-side, sizes) and Catalyst treats the legs as independent
    * subtrees, re-deriving an unmaterialized input per use.
    */
  def ngramJaccardFromHashed(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val cachedPairs = pairs.localCheckpoint()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val shA = sh.select(col("id").as("id_a"), col("h").as("h_a"))
    val shB = sh.select(col("id").as("__idb"), col("h").as("h_b"))
    val inter = cachedPairs
      .join(shA, "id_a")
      .join(shB, col("id_b") === col("__idb") && col("h_a") === col("h_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    cachedPairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.withColumnRenamed("sz", "sz_a").withColumnRenamed("id", "id_a"), "id_a")
      .join(sizes.withColumnRenamed("sz", "sz_b").withColumnRenamed("id", "id_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sz_a") + col("sz_b") - coalesce(col("inter"), lit(0L)))).as("jaccard"))
  }

  // ------------------------------------------------------------ winnowing

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every word k-gram, slide a
    * window of `w` consecutive gram hashes, keep each window's minimum,
    * dedup. The guarantee: any two documents sharing a run of at least
    * w + k - 1 words share at least one fingerprint — SPAN-level
    * near-dup detection (quotation, boilerplate blocks, partial copies)
    * where MinHash sees only whole-document set similarity.
    *
    * Gram hashes are md5 hex strings and window minima are their
    * lexicographic minima — deliberately engine-portable (any SQL engine
    * reproduces the selection bit-for-bit), unlike the xxhash64 family.
    * Pure higher-order functions, linear in document length per row
    * (the HOF-allocation caveat of §8 applies to O(n²) hot loops, not a
    * per-document linear pass). Documents shorter than k words
    * contribute their whole text as one gram.
    */
  def winnowFingerprints(textCol: Column, k: Int, w: Int): Column =
    graft.functions.HashFunctions.winnowFingerprints(
      split(lower(trim(textCol)), "\\s+"), k, w)

  /** The higher-order-function formulation of [[winnowFingerprints]] —
    * the readable reference the fused expression is spec-checked
    * against (same selected SET; order may differ). Allocates a window
    * slice per position, so the expression is the production path
    * (measured 10.4 s → fused at sf0.1).
    */
  def winnowFingerprintsHof(textCol: Column, k: Int, w: Int): Column = {
    val tokens = split(lower(trim(textCol)), "\\s+")
    val n = size(tokens)
    val grams = when(n >= k,
        transform(sequence(lit(0), n - k),
          i => concat_ws(" ", slice(tokens, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", tokens)))
    val hashes = transform(grams, g => md5(g))
    val sel = transform(sequence(lit(1), greatest(lit(1), size(hashes) - w + 1)),
      j => array_min(slice(hashes, j, lit(w))))
    array_distinct(sel)
  }

  /** Span-sharing candidate pairs from winnowed fingerprints: docs
    * sharing ≥ `minShared` selected fingerprints. One explode + one
    * equi-join on the fingerprint key — the same bucket-join shape as
    * the LSH family, so the same scale posture (and the same opt-in
    * population guard applies if a corpus has mega-common spans).
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 5, minShared: Long = 2L): DataFrame = {
    val fps = df.select(col(idCol).as("id"),
        explode(winnowFingerprints(col(textCol), k, w)).as("fp"))
      .localCheckpoint() // both join legs read it
    fps.join(fps.select(col("id").as("id2"), col("fp").as("fp2")),
        col("fp") === col("fp2") && col("id") < col("id2"))
      .groupBy(col("id").as("id_a"), col("id2").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ------------------------------------------------------------ containment

  /** Asymmetric n-gram CONTAINMENT (the containment coefficient of
    * Broder 1997, "On the resemblance and containment of documents":
    * C(A,B) = |A∩B| / |A|): detects sub-document inclusion — a short
    * document quoted or embedded inside a longer one scores near 1 even
    * though its symmetric Jaccard resemblance is tiny, the case every
    * resemblance-based dedup face misses by construction (the curation
    * failure mode: a license block, a canonical article, a chain letter
    * republished inside larger pages survives MinHash-resemblance dedup
    * in every copy).
    *
    * Semantics are defined over the distinct word n-gram sets RESTRICTED
    * to grams with corpus document frequency ≤ `maxDf`: mega-common
    * boilerplate grams would otherwise both blow up the inverted-index
    * join (the scale hazard — one gram key carrying millions of docs)
    * and inflate containment between unrelated documents (the quality
    * hazard), so the cap is part of the semantics, applied identically
    * by any engine, not merely a skew guard. A document whose every
    * gram is capped away leaves the pair space entirely (size-0 sets
    * have no containment).
    *
    * Shape: one shingling pass, one gram-keyed document-frequency
    * aggregation (the cap filter), one inverted-index self-join on the
    * gram key — shuffles on grams, never doc×doc — and one pair
    * aggregation. Gram keys are md5 hex strings for engine portability
    * (the winnowing precedent); the 100 TB path swaps 16-byte xxhash64
    * keys in without changing the plan.
    *
    * Returns unordered pairs (id_a < id_b) with the intersection size,
    * both capped-set sizes, and both directed containments — callers
    * filter on the direction(s) they care about.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, maxDf: Long = 20L): DataFrame = {
    val grams = df.select(col(idCol).as("id"),
        explode(shingleArray(col(textCol), shingleN)).as("g"))
      .select(col("id"), md5(col("g")).as("h"))
    // shingleArray emits DISTINCT grams per doc, so the per-gram row
    // count IS the document frequency
    val dfc = grams.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    // checkpoint: three legs (sizes + both join sides) read the capped
    // table and Catalyst treats them as independent subtrees
    val capped = grams.join(dfc, "h").filter(col("__df") <= maxDf)
      .select(col("id"), col("h")).localCheckpoint()
    val sizes = capped.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = capped
      .join(capped.select(col("id").as("id2"), col("h").as("h2")),
        col("h") === col("h2") && col("id") < col("id2"))
      .groupBy(col("id").as("id_a"), col("id2").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"),
        (col("inter").cast("double") / col("sz_a")).as("c_a_in_b"),
        (col("inter").cast("double") / col("sz_b")).as("c_b_in_a"))
  }

  /** The pinned-index artifacts of a containment corpus: full postings
    * (id, h) — UNCAPPED, the df is a view — plus the per-gram document
    * frequencies and per-doc capped set sizes under `maxDf`. A
    * deployment materializes these once per corpus snapshot; the
    * incremental fold reads them without re-shingling the corpus.
    */
  final case class ContainmentIndex(post: DataFrame, dfc: DataFrame,
      sizes: DataFrame)

  /** Build the [[ContainmentIndex]] for [[incrementalContainment]] —
    * the same shingling/md5/df derivation as [[containmentPairs]].
    */
  def containmentIndex(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, maxDf: Long = 20L): ContainmentIndex = {
    val post = df.select(col(idCol).as("id"),
        explode(shingleArray(col(textCol), shingleN)).as("g"))
      .select(col("id"), md5(col("g")).as("h"))
      .localCheckpoint()
    val dfc = post.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val sizes = post.join(dfc, "h").filter(col("df") <= maxDf)
      .groupBy(col("id")).agg(count(lit(1)).as("sz"))
      .localCheckpoint()
    ContainmentIndex(post, dfc, sizes)
  }

  /** INCREMENTAL containment maintenance: fold a document batch into a
    * pinned [[ContainmentIndex]] and emit exactly the batch-involving
    * pairs of the UNION-corpus containment semantics — bit-identical
    * to running [[containmentPairs]] on base ∪ batch and keeping pairs
    * with ≥ 1 batch side (the standing fold ≡ recompute discipline).
    *
    * The delta argument: a gram's document frequency only GROWS via
    * the batch, so every gram whose df crosses the cap is a batch gram
    * — the crossing set C is computed from the batch-gram df table
    * joined once against the pinned per-gram dfs (delta-scale), base
    * doc set sizes adjust by one broadcast-C probe of the pinned
    * postings (a narrow index scan, no corpus re-shingle), and the
    * candidate join probes the index on the batch's capped gram keys
    * only. Base–base pairs cannot gain grams (dfs only grow), but a
    * base–base pair CAN lose a crossing gram — those pairs are outside
    * this fold's contract (they have no batch side); the crossing-gram
    * count is the re-audit signal a deployment monitors.
    *
    * @return same shape as [[containmentPairs]], restricted to pairs
    *         with at least one batch-side document
    */
  def incrementalContainment(idx: ContainmentIndex, batch: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3,
      maxDf: Long = 20L): DataFrame = {
    val bPost = batch.select(col(idCol).as("id"),
        explode(shingleArray(col(textCol), shingleN)).as("g"))
      .select(col("id"), md5(col("g")).as("h"))
      .localCheckpoint()
    // full-corpus df for BATCH grams only (all a fold needs): base df
    // via one join of the (small) batch-gram table against the pinned
    // df table
    val bDf = bPost.groupBy(col("h")).agg(count(lit(1)).as("dfb"))
      .join(idx.dfc.select(col("h"), col("df").as("dfbase")), Seq("h"), "left")
      .select(col("h"), coalesce(col("dfbase"), lit(0L)).as("dfbase"),
        (coalesce(col("dfbase"), lit(0L)) + col("dfb")).as("dffull"))
      .localCheckpoint()
    // crossing grams: were in the capped universe, leave it now
    val crossing = bDf
      .filter(col("dfbase") <= maxDf && col("dffull") > maxDf)
      .select(col("h"))
    val cappedBatch = bPost.join(bDf.filter(col("dffull") <= maxDf)
      .select(col("h")), "h").localCheckpoint()
    // other-side postings under the union universe: base grams keep
    // their df unless they crossed (crossed ⊆ batch grams); batch side
    // is the capped batch postings
    val otherBase = idx.post
      .join(broadcast(idx.dfc.filter(col("df") > maxDf).select(col("h"))
        .unionByName(crossing)), Seq("h"), "left_anti")
    val other = otherBase.unionByName(cappedBatch)
    // batch-involving shared grams, canonicalized; distinct kills the
    // double count when both sides are batch docs
    val shared = cappedBatch.select(col("id").as("bid"), col("h"))
      .join(other.select(col("id").as("oid"), col("h")), "h")
      .filter(col("bid") =!= col("oid"))
      .select(least(col("bid"), col("oid")).as("id_a"),
        greatest(col("bid"), col("oid")).as("id_b"), col("h"))
      .distinct()
    val inter = shared.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    // union-universe set sizes: batch docs from their capped postings,
    // base docs = pinned size − crossing-gram hits (one broadcast-C
    // probe of the pinned postings)
    val szBatch = cappedBatch.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val adj = idx.post.join(broadcast(crossing), "h")
      .groupBy(col("id")).agg(count(lit(1)).as("__lost"))
    val szBase = idx.sizes.join(adj, Seq("id"), "left")
      .select(col("id"), (col("sz") - coalesce(col("__lost"), lit(0L))).as("sz"))
    val sizes = szBase.unionByName(szBatch)
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"),
        (col("inter").cast("double") / col("sz_a")).as("c_a_in_b"),
        (col("inter").cast("double") / col("sz_b")).as("c_b_in_a"))
  }

  // -------------------------------------------------------- decontamination

  /** Benchmark decontamination: flag corpus documents sharing at least
    * one word n-gram with a held-out test set — the standard guard
    * against evaluation leakage in training corpora. Returns
    * (id, n_shared) with the count of distinct shared shingles.
    *
    * Shape at scale: the test set's distinct shingles are tiny relative
    * to the corpus (benchmarks are MBs, corpora are TBs), so the join
    * broadcasts; the corpus side streams through one shingling pass, and
    * the only shuffle is the per-document count. Joins on the shingle
    * STRING for oracle parity — the scale path swaps in
    * [[hashedShingles]] (16-byte keys) without changing the shape.
    */
  /** Line-level exact dedup (the C4/CCNet normalization step): split
    * each document into sentences (lowercased, delimiter-consumed), keep
    * only the FIRST corpus occurrence of each distinct sentence — first
    * by (doc id, position), a total deterministic order — and report per
    * document how many lines survived plus the sha256 of the kept text
    * (rejoined in original order), which proves content parity without
    * hauling text through a compare. Boilerplate sentences (nav bars,
    * cookie banners, disclaimers) repeat across millions of pages; this
    * removes every copy but one while leaving unique prose untouched.
    *
    * Shape: one narrow split/explode pass, ONE shuffle on the sentence
    * key for the first-occurrence window, one groupBy doc for
    * reassembly (collect_list bounded by document size). At 100 TB the
    * window key swaps to sha2(line) to keep shuffle rows narrow; the
    * plan is otherwise unchanged. Docs whose every line was dropped
    * keep n_kept = 0 and a NULL sha (no kept text ≠ empty text).
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(lower(trim(col(textCol))), "[.!?]+\\s+"))
          .as(Seq("pos", "line")))
      // the split consumes interior terminators but the document-final
      // one has no trailing whitespace — strip it so "x." ≡ "x"
      .withColumn("line", regexp_replace(col("line"), "[.!?]+$", ""))
      .filter(col("line") =!= "")
    val firstSeen = Window.partitionBy(col("line")).orderBy(col("id"), col("pos"))
    lines.withColumn("rn", row_number().over(firstSeen))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the null branch → kept lines only; struct
        // sort orders by pos (unique per doc) → original order
        array_join(transform(
          array_sort(collect_list(when(col("rn") === 1,
            struct(col("pos"), col("line"))))),
          _.getField("line")), " ").as("__kept"))
      .select(col("id"), col("n_lines"), col("n_kept"),
        when(col("n_kept") > 0, sha2(col("__kept"), 256)).as("kept_sha"))
  }

  /** Exact substring-span dedup — the token-window re-expression of
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language
    * Models Better", suffix-array ExactSubstr): any k-token window
    * whose content also occurs EARLIER in corpus order (doc, start)
    * marks a duplicated span, every non-first occurrence's token range
    * is removed, and each document is reassembled from its surviving
    * tokens. Catches copied passages inside otherwise-distinct
    * documents — the case document- and line-level dedup both miss.
    *
    * Shape: window hashes are row-local HOF arithmetic (no shuffle);
    * the corpus-sized work is ONE shuffle on the window hash (the
    * first-occurrence ranking — the relational stand-in for the suffix
    * sort, and like it linear in token count), then covered-position
    * expansion (k rows per REMOVED window — linear in duplicated
    * volume, not corpus volume), one anti-join, one reassembly groupBy.
    * Docs shorter than k tokens emit no windows and survive whole.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "window must span at least 2 tokens")
    val toks = df.select(col(idCol).as("id"),
      split(trim(col(textCol)), "\\s+").as("w"))
    val wins = toks.select(col("id"),
      posexplode(when(size(col("w")) >= k,
          transform(sequence(lit(0), size(col("w")) - k),
            i => md5(concat_ws(" ", slice(col("w"), i + 1, lit(k))))))
        .otherwise(array())).as(Seq("start", "h")))
    val firstSeen = Window.partitionBy(col("h")).orderBy(col("id"), col("start"))
    val removed = wins
      .withColumn("rn", row_number().over(firstSeen))
      .filter(col("rn") > 1)
    val covered = removed.select(col("id"),
        explode(sequence(col("start"), col("start") + k - 1)).as("pos"))
      .distinct()
    val tokPos = toks.select(col("id"), posexplode(col("w")).as(Seq("pos", "tok")))
    val kept = tokPos.join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          _.getField("tok")), " ").as("__kept"))
    toks.select(col("id"), size(col("w")).cast("long").as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        when(coalesce(col("n_kept"), lit(0L)) > 0, sha2(col("__kept"), 256))
          .as("kept_sha"))
  }

  /** Cross-snapshot incremental dedup — the index-and-ingest pattern: a
    * NEW batch is deduped against an already-curated corpus without
    * re-reading corpus text. The index side reduces to 32-byte digests
    * (at 100 TB the digest index is ~0.03% of the corpus and lives as
    * its own compact table, re-usable every ingest); the batch drops
    * rows whose digest exists in the index, then exact-dedups within
    * itself (keep min id). Verdict per surviving row: one anti-join on
    * the digest + one digest groupBy — the batch never joins corpus
    * text, and the corpus is never re-scanned past its digest column.
    */
  def incrementalExact(index: DataFrame, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val idx = index.select(sha2(col(textCol), 256).as("digest")).distinct()
    batch.select(col(idCol).as("id"), sha2(col(textCol), 256).as("digest"))
      .join(idx, Seq("digest"), "left_anti")
      .groupBy(col("digest"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_batch_copies"))
  }

  /** Incremental MinHash-LSH index maintenance — the near-dup
    * counterpart of [[incrementalExact]], extending the CDC discipline
    * (pay the delta, not the corpus) to the LSH family: fold a NEW
    * document batch into an existing (id, band, bucket) bucket index
    * without re-signaturing corpus text. Signatures are per-document
    * pure functions and band-bucket collision is pairwise, so every
    * pair the full refit would find beyond the prior pair stream has
    * at least one side in the batch: new pairs = (batch buckets ⋈
    * index buckets on (band, bucket)) ∪ (intra-batch candidates), both
    * canonicalized (id_a < id_b). Work is batch-signature + a
    * bucket-keyed join probing the index — never a corpus re-scan.
    *
    * Returns (updated bucket index = index ∪ batch buckets, new
    * candidate pairs). Invariant (DedupSpec, planted + randomized
    * splits): prior pairs ∪ new pairs ≡ the full refit's pairs on the
    * union corpus, bit-for-bit — stated for the unbounded setting;
    * `maxBucketSize` caps only the intra-batch path (a capped refit
    * caps COMBINED bucket populations, which an incremental fold
    * cannot reproduce without re-reading the index buckets it skipped).
    */
  def incrementalLsh(indexBuckets: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16,
      maxBucketSize: Long = Long.MaxValue): (DataFrame, DataFrame) = {
    val bb = minhashBandBuckets(batch, idCol, textCol, shingleN, numHashes,
      bands).localCheckpoint()
    val idx = indexBuckets.select(col("id").as("id2"),
      col("band").as("band2"), col("bucket").as("bucket2"))
    val cross = bb.join(idx,
        col("band") === col("band2") && col("bucket") === col("bucket2") &&
          col("id") =!= col("id2"))
      .select(least(col("id"), col("id2")).as("id_a"),
        greatest(col("id"), col("id2")).as("id_b"))
    val intra = lshCandidatesFromBuckets(bb, maxBucketSize)
    val pairs = cross.unionByName(intra).distinct()
    (indexBuckets.unionByName(bb), pairs)
  }

  def decontaminate(corpus: DataFrame, test: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    val testShingles = shingles(test, idCol, textCol, n).select(col("sh")).distinct()
    shingles(corpus, idCol, textCol, n)
      .join(broadcast(testShingles), "sh")
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
  }

  // ------------------------------------------- exact set-similarity join

  /** EXACT Jaccard-threshold self-join via AllPairs/PPJoin prefix
    * filtering (Bayardo et al. WWW'07; Xiao et al. WWW'08) — the
    * deterministic counterpart of the MinHash-LSH candidate path:
    * every pair with shingle-set Jaccard ≥ tNum/tDen is returned, with
    * NO probabilistic recall loss, yet the pairwise work is bounded by
    * prefix collisions instead of all token-sharing pairs.
    *
    * Canonical token order = ascending document frequency (token text
    * tiebreak), so each document's prefix consists of its RAREST
    * tokens. Two consequences at 100 TB: (a) the prefix self-join
    * joins only rare-token postings — the hot keys that make a naive
    * token self-join quadratic are exactly the ones prefix filtering
    * excludes; (b) no global rank is ever materialized — (df, tok) IS
    * the total order, so ordering is a per-document window, not a
    * vocabulary-wide sort.
    *
    * Losslessness (the AllPairs prefix theorem): if J(x,y) ≥ t then
    * the overlap i satisfies i·(1+t) ≥ t·(|x|+|y|) and i ≤ min size,
    * hence i ≥ ⌈t·|x|⌉ on both sides; the FIRST common token under the
    * canonical order has at most |x| − i non-common predecessors in x,
    * so it sits within the first |x| − ⌈t·|x|⌉ + 1 positions of BOTH
    * documents — prefix ⋈ prefix finds every qualifying pair. The
    * threshold is an exact integer rational: candidate length filter
    * (tNum·max ≤ tDen·min) and the final gate (tDen·i ≥ tNum·(union))
    * are integer comparisons — no float discipline needed anywhere.
    */
  def ssjoinPrefix(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, tNum: Int = 1, tDen: Int = 2): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    // one exploded (id, tok) table feeds the df count, the per-doc
    // token arrays, and the prefix window
    val toks = df.select(col(idCol).as("id"),
        explode(shingleArray(col(textCol), shingleN)).as("tok"))
      .localCheckpoint()
    val dfc = toks.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
    // whole token sets as per-doc arrays: the verify stage intersects
    // arrays instead of re-shuffling exploded tokens — candidate-
    // bounded rows carrying ~|doc| tokens each, with the build side
    // broadcastable at audit scale and a plain pair-keyed shuffle at
    // corpus scale
    val docsArr = toks.groupBy(col("id"))
      .agg(collect_list(col("tok")).as("ta"), count(lit(1)).as("sz"))
      .localCheckpoint()
    val sizes = docsArr.select(col("id"), col("sz"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tdf"), col("tok"))
    // prefix length |x| − ⌈t·|x|⌉ + 1, all integer arithmetic; the
    // position rides along for the PPJoin bound below
    val pref = toks.join(dfc, "tok").join(sizes, "id")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <=
        col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) DIV $tDen") + 1)
      .select(col("id"), col("tok"), col("sz"), col("pos"))
      .localCheckpoint()
    // candidate generation with the PPJoin positional upper bound
    // (Xiao et al.): a shared prefix token at positions (pa, pb) caps
    // the overlap at 1 + min(sa − pa, sb − pb) — sound for the FIRST
    // shared token (nothing common precedes it in either doc), and
    // max over all shared tokens dominates that sound bound, so
    // requiring max ≥ α = ⌈t(sa+sb)/(1+t)⌉ never drops a true pair.
    // On low-entropy corpora this is the filter that bites: the
    // length/prefix filters alone admit every pair sharing a mid-df
    // token, the positional bound kills the ones that share it LATE.
    val cand = pref.select(col("id").as("id_a"), col("tok"),
        col("sz").as("sa"), col("pos").as("pa"))
      .join(pref.select(col("id").as("id_b"), col("tok"),
        col("sz").as("sb"), col("pos").as("pb")), Seq("tok"))
      .filter(col("id_a") < col("id_b") &&
        greatest(col("sa"), col("sb")) * tNum <=
          least(col("sa"), col("sb")) * tDen)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(lit(1) + least(col("sa") - col("pa"),
        col("sb") - col("pb"))).as("ub"),
        first(col("sa")).as("sa"), first(col("sb")).as("sb"))
      .filter(col("ub") * (tNum + tDen) >= (col("sa") + col("sb")) * tNum)
      .select(col("id_a"), col("id_b"))
    // exact verification: array intersection per candidate pair
    val inter = cand
      .join(docsArr.select(col("id").as("id_a"), col("ta").as("tka"),
        col("sz").as("sz_a")), "id_a")
      .join(docsArr.select(col("id").as("id_b"), col("ta").as("tkb"),
        col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("tka"), col("tkb"))).cast("long")
          .as("inter"),
        col("sz_a"), col("sz_b"))
    inter
      .filter(col("inter") * tDen >=
        (col("sz_a") + col("sz_b") - col("inter")) * tNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"))
  }

  /** The pinned artifacts of a prefix-filtered similarity corpus:
    * postings, token document frequencies (which FIX the canonical
    * order), per-doc prefixes and sizes. A deployment materializes
    * these once per corpus snapshot; [[incrementalSsjoin]] folds
    * batches against them without touching the base corpus again.
    */
  final case class SsjoinIndex(docs: DataFrame, dfs: DataFrame,
      prefix: DataFrame, shingleN: Int, tNum: Int, tDen: Int)

  /** Build the [[SsjoinIndex]] — the same shingling/order/prefix
    * derivation as [[ssjoinPrefix]], with every artifact checkpointed
    * for reuse: per-doc token arrays + sizes (`docs`), the ORDER-FIXING
    * token dfs, and the positional prefix table.
    */
  def ssjoinIndex(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, tNum: Int = 1, tDen: Int = 2): SsjoinIndex = {
    val toks = df.select(col(idCol).as("id"),
        explode(shingleArray(col(textCol), shingleN)).as("tok"))
      .localCheckpoint()
    val dfs = toks.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
      .localCheckpoint()
    val docs = toks.groupBy(col("id"))
      .agg(collect_list(col("tok")).as("ta"), count(lit(1)).as("sz"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tdf"), col("tok"))
    val prefix = toks.join(dfs, "tok")
      .join(docs.select(col("id"), col("sz")), "id")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <=
        col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) DIV $tDen") + 1)
      .select(col("id"), col("tok"), col("sz"), col("pos"))
      .localCheckpoint()
    SsjoinIndex(docs, dfs, prefix, shingleN, tNum, tDen)
  }

  /** INCREMENTAL prefix-filtered similarity join: every J ≥ t pair
    * INVOLVING a batch document, at delta cost against the pinned
    * base index. The enabling fact: the AllPairs prefix theorem holds
    * under ANY fixed total token order — ascending-df is only the
    * performance heuristic — so the order is PINNED at index-build
    * time and batch prefixes are computed under it (unseen tokens get
    * df 0: rarest, which is also the right heuristic — a token new in
    * the batch is globally rare by construction). Base prefixes are
    * therefore reusable AS-IS: no base re-shingle, no re-rank, no
    * prefix rebuild. Candidates = batch prefixes ⋈ (base ∪ batch)
    * prefixes — delta × prefix-collision bounded; exact verification
    * touches only candidate pairs. Base–base pairs are the standing
    * index's contract, not the fold's (the p_containment_incr
    * discipline).
    */
  def incrementalSsjoin(idx: SsjoinIndex, batch: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val (tNum, tDen) = (idx.tNum, idx.tDen)
    val btoks = batch.select(col(idCol).as("id"),
        explode(shingleArray(col(textCol), idx.shingleN)).as("tok"))
      .localCheckpoint()
    val bdocs = btoks.groupBy(col("id"))
      .agg(collect_list(col("tok")).as("ta"), count(lit(1)).as("sz"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tdf"), col("tok"))
    // batch prefixes under the PINNED base order (df 0 when unseen)
    val bpref = btoks
      .join(idx.dfs, Seq("tok"), "left")
      .withColumn("tdf", coalesce(col("tdf"), lit(0L)))
      .join(bdocs.select(col("id"), col("sz")), "id")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <=
        col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) DIV $tDen") + 1)
      .select(col("id"), col("tok"), col("sz"), col("pos"))
      .localCheckpoint()
    val allPref = idx.prefix.unionByName(bpref)
    // PPJoin positional bound, as in the full join: positions are
    // ranks under the SAME pinned order on both sides, so the
    // first-common-token soundness argument carries over verbatim
    val cand = bpref.select(col("id").as("ib"), col("tok"),
        col("sz").as("sb"), col("pos").as("pb"))
      .join(allPref.select(col("id").as("io"), col("tok"),
        col("sz").as("so"), col("pos").as("po")), Seq("tok"))
      .filter(col("ib") =!= col("io") &&
        greatest(col("sb"), col("so")) * tNum <=
          least(col("sb"), col("so")) * tDen)
      .groupBy(least(col("ib"), col("io")).as("id_a"),
        greatest(col("ib"), col("io")).as("id_b"))
      .agg(max(lit(1) + least(col("sb") - col("pb"),
        col("so") - col("po"))).as("ub"),
        first(col("sb") + col("so")).as("szsum"))
      .filter(col("ub") * (tNum + tDen) >= col("szsum") * tNum)
      .select(col("id_a"), col("id_b"))
    val allDocs = idx.docs.unionByName(bdocs)
    cand
      .join(allDocs.select(col("id").as("id_a"), col("ta").as("tka"),
        col("sz").as("sz_a")), "id_a")
      .join(allDocs.select(col("id").as("id_b"), col("ta").as("tkb"),
        col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("tka"), col("tkb"))).cast("long")
          .as("inter"),
        col("sz_a"), col("sz_b"))
      .filter(col("inter") * tDen >=
        (col("sz_a") + col("sz_b") - col("inter")) * tNum)
  }

  /** The candidate pairs the prefix filter admits (before exact
    * verification) — exposed so specs and audits can measure the prune
    * against the all-token-sharing-pairs volume.
    */
  def ssjoinCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, tNum: Int = 1, tDen: Int = 2): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(shingleArray(col(textCol), shingleN)).as("tok"))
    val dfc = toks.groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tdf"), col("tok"))
    val pref = toks.join(dfc, "tok").join(sizes, "id")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <=
        col("sz") - expr(s"(sz * $tNum + ${tDen - 1}) DIV $tDen") + 1)
      .select(col("id"), col("tok"), col("sz"), col("pos"))
    pref.select(col("id").as("id_a"), col("tok"), col("sz").as("sa"),
        col("pos").as("pa"))
      .join(pref.select(col("id").as("id_b"), col("tok"),
        col("sz").as("sb"), col("pos").as("pb")), Seq("tok"))
      .filter(col("id_a") < col("id_b") &&
        greatest(col("sa"), col("sb")) * tNum <=
          least(col("sa"), col("sb")) * tDen)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(lit(1) + least(col("sa") - col("pa"),
        col("sb") - col("pb"))).as("ub"),
        first(col("sa") + col("sb")).as("szsum"))
      .filter(col("ub") * (tNum + tDen) >= col("szsum") * tNum)
      .select(col("id_a"), col("id_b"))
  }

  // ------------------------------------------------------------- embedding

  /** Embedding-cosine near-dup pairs over a bounded pair set. `pairs`
    * carries (id_a, id_b); embeddings are looked up by join (broadcast
    * when small). Cosine computed in double precision to match any
    * SQL oracle.
    */
  def embedCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      pairs: DataFrame, threshold: Double): DataFrame = {
    val e = emb.select(col(idCol).as("__eid"), col(vecCol).cast("array<double>").as("__v"))
    pairs
      .join(e.select(col("__eid").as("id_a"), col("__v").as("va")), "id_a")
      .join(e.select(col("__eid").as("id_b"), col("__v").as("vb")), "id_b")
      .withColumn("cosine", VectorFunctions.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** LSH-bucketed embedding near-dup — the scale path: random-hyperplane
    * sign buckets ([[Ann.lshKeys]]) bound the pairwise work to bucket
    * population × tables, never n². Vectors ride inline through the
    * bucket self-join and the exact cosine is computed BEFORE the
    * multi-table dedup (same trade as [[Ann.lshKnn]]: recomputing ~100
    * flops per duplicate collision beats shuffling vector payloads
    * through a distinct — the dedup key is the 24-byte result triple).
    * Precision is exact (every emitted pair passes the true cosine
    * threshold); recall < 1 by construction, measured vs
    * [[embedCosineAllPairs]] in DedupSpec. Bucket population is
    * unbounded by default; `maxBucketSize` opts into the skew guard
    * via [[boundBuckets]], same rationale as the text-LSH path.
    *
    * For an externally-supplied candidate set (e.g. buckets from a
    * different index), feed pairs into [[embedCosinePairs]] instead.
    */
  def embedCosineLsh(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, bitsPerTable: Int = 4, numTables: Int = 8,
      seed: Long = 42L, maxBucketSize: Long = Long.MaxValue): DataFrame = {
    val keys = boundBuckets(
      Ann.lshKeys(emb, idCol, vecCol, dim, bitsPerTable, numTables, seed)
        .localCheckpoint(),
      Seq("table", "bucket"), maxBucketSize)
    val right = keys.select(col("id").as("id2"), col("v").as("v2"),
      col("table").as("table2"), col("bucket").as("bucket2"))
    keys.join(right,
        col("table") === col("table2") && col("bucket") === col("bucket2") &&
          col("id") < col("id2"))
      .withColumn("cosine", VectorFunctions.cosine(col("v"), col("v2")))
      .filter(col("cosine") >= threshold)
      .select(col("id").as("id_a"), col("id2").as("id_b"), col("cosine"))
      .distinct()
  }

  /** All-pairs variant (id_a < id_b) — quadratic; callers at scale use
    * [[embedCosineLsh]] or feed bucketed pairs into
    * [[embedCosinePairs]] instead. When one copy
    * of the table is provably broadcastable (row count checked), vectors
    * ride inline through a broadcast nested-loop self-join — zero
    * shuffle; past that bound it falls back to the id-cross-product +
    * shuffle-join formulation, which is slow but never OOMs a driver.
    */
  def embedCosineAllPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, broadcastRowBound: Long = 2000000L): DataFrame = {
    // ONE action serves both the branch decision and the join legs:
    // the projected table persists (memory, disk-spill past the bound —
    // never an OOM) before the count, so the count's scan IS the
    // materialization the chosen branch then reads from cache
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (e.count() <= broadcastRowBound) {
      val a = e.select(col(idCol).as("id_a"), col("__v").as("va"))
      val b = e.select(col(idCol).as("id_b"), col("__v").as("vb"))
      // eager result + unpersist: without this, each call with a
      // distinct input pinned the projected table for the session
      // lifetime (the r12 advisory). The result is pair-bounded (only
      // pairs above threshold survive) on this sf-bounded anchor path.
      val out = a.join(broadcast(b), col("id_a") < col("id_b"))
        .withColumn("cosine", VectorFunctions.cosine(col("va"), col("vb")))
        .filter(col("cosine") >= threshold)
        .select(col("id_a"), col("id_b"), col("cosine"))
        .localCheckpoint()
      e.unpersist(blocking = false)
      out
    } else {
      val ids = e.select(col(idCol).as("id_a"))
      val ids2 = e.select(col(idCol).as("id_b"))
      // same eager-result + unpersist discipline as the broadcast
      // branch: the lazy frame otherwise keeps the persisted projection
      // pinned for the session lifetime — and this branch is the LARGE-
      // input one, whose cache footprint matters most (r13 advisory)
      val out = embedCosinePairs(e, idCol, "__v",
        ids.crossJoin(ids2).filter(col("id_a") < col("id_b")), threshold)
        .localCheckpoint()
      e.unpersist(blocking = false)
      out
    }
  }
}
