package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) expressed as
  * relational algebra — the point-frequency member of the mergeable-
  * sketch family (Misra-Gries top-k, HLL++ distinct). No UDAF and no
  * driver-side array: the sketch IS a grouped count over a fixed
  * (depth × width) bucket space, so Spark's partial aggregation makes
  * it mergeable by construction and the shuffle after the map-side
  * combine is bounded by depth·width rows REGARDLESS of corpus size —
  * the property that makes a CMS pass cheaper than an exact token
  * groupBy at 100 TB, where the full token shuffle is corpus-sized.
  *
  * Guarantee: bucket counts only ever aggregate supersets of each
  * item's occurrences, so `estimate = min over rows of bucket count`
  * NEVER under-counts. [[heavyExact]] leans on exactly that: the
  * sketch prefilters candidate occurrences (no true heavy item can be
  * lost), and a second exact pass over the surviving occurrences
  * removes the false positives — output is bit-identical to a plain
  * `GROUP BY … HAVING count(*) >= t`, which is why the driver query
  * carries a full DuckDB hash oracle even though the sketch itself is
  * approximate. Hash rows: `xxhash64(i, item) mod width` per depth
  * row i — Spark's codegen hash, no UDF anywhere.
  */
object CountMin {

  /** Per-depth-row bucket index of `item` — shared by build and probe
    * so the two sides can never drift.
    */
  private def bucket(i: Column, item: Column, width: Int): Column =
    pmod(xxhash64(i, item), lit(width.toLong))

  /** The sketch as a (i, b, c) bucket-count table: ≤ depth·width rows,
    * one shuffle whose width is bounded by the bucket space (map-side
    * combine crushes the corpus-sized input down first).
    */
  def sketch(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    items
      .select(posexplode(array(Seq.fill(depth)(col(itemCol)): _*)).as(Seq("i", "it")))
      .select(col("i"), bucket(col("i"), col("it"), width).as("b"))
      .groupBy(col("i"), col("b")).agg(count(lit(1)).as("c"))
  }

  /** CMS point estimates for every row of `probes`: join the probe set
    * against the bucket table on (i, bucket) and take the min count
    * over the depth rows. Estimates are upper bounds on the true
    * frequency (within εN with the usual (e/width, e^-depth)
    * guarantee). `probes` should be small (a watchlist); for filtering
    * a corpus-sized stream use [[heavyExact]]'s broadcast-map form.
    */
  def estimate(sk: DataFrame, probes: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    val p = probes
      .select(posexplode(array(Seq.fill(depth)(col(itemCol)): _*)).as(Seq("i", "it")))
      .select(col("it"), col("i"), bucket(col("i"), col("it"), width).as("b"))
    p.join(broadcast(sk), Seq("i", "b"), "left")
      .groupBy(col("it").as(itemCol))
      // an empty bucket means frequency 0; min over depth rows
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Exact heavy hitters via a CMS prefilter: items whose TRUE count
    * ≥ `threshold`, with exact counts — bit-equal to
    * `GROUP BY item HAVING count(*) >= threshold`, but the only
    * corpus-sized shuffle is the final groupBy over SURVIVING
    * occurrences (the heavy items), because the sketch pass shuffles
    * ≤ depth·width rows and the probe is a broadcast map lookup in
    * codegen. The two-pass pattern every 100 TB frequency job runs
    * when the item domain is too wide to count exactly in one shuffle.
    */
  def heavyExact(items: DataFrame, itemCol: String, threshold: Long,
      depth: Int = 4, width: Int = 8192): DataFrame = {
    val sk = sketch(items, itemCol, depth, width)
    // fold the bucket table into ONE broadcast row: a map keyed by
    // i·width + b. Entry count is bounded by depth·width (and by
    // depth·distinct below that), so the build side is sketch-sized,
    // never corpus-sized.
    val skMap = sk.agg(
      map_from_entries(collect_list(struct(
        (col("i").cast("long") * width + col("b")).as("k"), col("c"))))
        .as("m"))
    val est = least((0 until depth).map { i =>
      coalesce(
        element_at(col("m"),
          lit(i.toLong * width) + bucket(lit(i), col(itemCol), width)),
        lit(0L))
    }: _*)
    items.crossJoin(broadcast(skMap))
      .filter(est >= threshold) // CMS never under-counts: no true heavy item drops
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("exact_count"))
      .filter(col("exact_count") >= threshold)
  }

  /** Equi-join SIZE estimation by CMS inner product (Cormode &
    * Muthukrishnan §4.2 — the AMS F₂ use case when both sides are the
    * same stream): |A ⋈ B on k| = Σ_k f_A(k)·f_B(k), and the per-row
    * bucket dot product Σ_b c_A(i,b)·c_B(i,b) only ever ADDS collision
    * mass, so `min` over the depth rows is an upper bound within
    * (e/width)·N_A·N_B in expectation. This is optimizer-grade
    * statistics at 100 TB: the broadcast-vs-shuffle and skew-salting
    * decisions read two kilobyte-scale bucket tables instead of
    * counting the join — both sketches shuffle ≤ depth·width rows
    * whatever the corpus, and the dot product runs over the bucket
    * space. Returns one row: (est, the depth-row estimates folded).
    */
  def joinSizeEstimate(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      depth: Int = 4, width: Int = 8192): DataFrame = {
    val s1 = sketch(a, aCol, depth, width)
      .select(col("i"), col("b"), col("c").as("c1"))
    val s2 = sketch(b, bCol, depth, width)
      .select(col("i"), col("b"), col("c").as("c2"))
    // zero-fill the depth rows: a depth row whose two sketches share no
    // (i, b) bucket has dot = 0 — it must CONTRIBUTE that zero to the
    // min (disjoint key domains estimate 0), not silently drop out and
    // hand the min to a looser row
    val spark = a.sparkSession
    import spark.implicits._
    val allRows = (0 until depth).toDF("i")
    val dots = s1.join(s2, Seq("i", "b"))
      .groupBy(col("i")).agg(sum(col("c1") * col("c2")).as("dot"))
    allRows.join(dots, Seq("i"), "left")
      .select(coalesce(col("dot"), lit(0L)).as("dot"))
      .agg(min(col("dot")).as("est_join_size"))
  }
}
