package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-pruned semi join — the runtime-filter pattern for the dim-table
  * regime broadcast joins can't reach (reference join surface:
  * `server/server.go` MATCH edge-resolution loop; re-expressed as Spark's
  * own `InjectRuntimeFilter` discipline made explicit and deterministic).
  *
  * At 100 TB the painful join shape is fact ⋈ dim where dim is far too
  * large to broadcast as a hash relation (tens of millions of keys) but
  * the JOIN is selective: shuffling the whole fact table to discover
  * that 95% of its rows match nothing is the single biggest avoidable
  * shuffle in a warehouse. A Bloom filter over the dim keys is
  * megabytes regardless of dim row width, so it CAN ship to every
  * executor, and probing it is a codegen'd long-hash + bit-test with no
  * serialization boundary — the fact rows that can't match die inside
  * the scan stage, BEFORE the exchange. The exact semi join then runs
  * over survivors only, so false positives cost shuffle bytes, never
  * correctness: the composition is bit-equal to the plain semi join by
  * construction.
  *
  * Spark has this as an optimizer rule (`InjectRuntimeFilter`), but it
  * fires on its own cost heuristics and only inside one query. This
  * operator is the explicit face: build once, prune any number of
  * downstream scans (the build side is a reusable byte array — the
  * cross-query reuse a pipeline over one dim set wants).
  *
  * Driver-state discipline: the only collected object is the filter
  * itself, whose size is fixed by `numBits` at build time (~1.2 MB for
  * 1M keys at 1% fpp) — the same bounded-codebook contract as the
  * k-means/BPE/IVF driver tables, independent of dim cardinality.
  */
object BloomJoin {

  /** Serialized Bloom filter over `xxhash64(dim(dimKey))`, built by ONE
    * partial-aggregated pass (the `BloomFilterAggregate` buffers merge
    * by OR, so the build is map-side combined like any agg). `fpp` and
    * `expectedItems` fix the bit budget up front: size is a build-time
    * constant, not a function of data volume.
    */
  def build(dim: DataFrame, dimKey: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val numBits = optimalNumBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(col(dimKey))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    // BloomFilterAggregate yields NULL over zero input rows; callers
    // must handle a null filter (empty dim) explicitly — probing a null
    // literal makes every predicate three-valued NULL.
    dim.select(Bridge.column(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** `might_contain(filter, xxhash64(key))` as a native codegen'd
    * predicate — evaluates inside WholeStageCodegen in the scan stage.
    * Note `xxhash64` is non-nullable (a NULL key hashes to the seed),
    * so this is a real boolean even for NULL keys — callers that need
    * NULL-never-matches semantics must add an explicit `isNotNull`.
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      Bridge.expression(xxhash64(key))))

  /** Exact semi join with Bloom pre-pruning: filter the fact side down
    * to possible matches inside its scan stage, then restore exactness
    * with the real semi join over survivors. Identical output to
    * `fact.join(dim, fact(factKey) === dim(dimKey), "left_semi")` on
    * any input; the Bloom stage only cuts the fact bytes entering the
    * exchange (by ~the join selectivity, minus fpp).
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build(dim, dimKey, expectedItems, fpp)
    if (bf == null) return fact.filter(lit(false)) // empty dim: semi = ∅
    val pruned = fact.filter(mightContain(bf, col(factKey)))
    pruned.join(dim, pruned(factKey) === dim(dimKey), "left_semi")
  }

  /** Anti-join face: Bloom filters have no false NEGATIVES, so a row
    * whose key misses the filter is DEFINITELY unmatched and can skip
    * the exchange entirely — it goes straight to the output. Only the
    * might-contain survivors (true matches + fpp) pay the exact
    * anti-join shuffle. Output is bit-equal to the plain anti join.
    */
  def antiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build(dim, dimKey, expectedItems, fpp)
    if (bf == null) return fact // empty dim: anti join keeps every row
    // Exclusive partition of fact: NULL keys match nothing, so they are
    // definite misses regardless of the filter bit (xxhash64 hashes NULL
    // to the seed, so mightContain(NULL) can be true — routing on the
    // probe alone would emit such rows twice).
    val maybe = fact.filter(mightContain(bf, col(factKey)) &&
      col(factKey).isNotNull)
    val definiteMiss = fact.filter(!mightContain(bf, col(factKey)) ||
      col(factKey).isNull)
    definiteMiss.unionAll(
      maybe.join(dim, maybe(factKey) === dim(dimKey), "left_anti"))
  }

  /** Standard Bloom sizing: bits = -n·ln p / (ln 2)². */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong.max(64L)
  }
}
