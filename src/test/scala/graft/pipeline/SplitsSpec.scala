package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkSpec {

  private lazy val keys = {
    import spark.implicits._
    (0L until 4000L).toDF("k")
  }

  test("splits are disjoint, exhaustive, and near the requested fractions") {
    val counts = Splits.assign(keys, "k", trainPct = 80, valPct = 10)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 4000L)
    // md5 is uniform: 1/256-granular thresholds land near the request
    assert(math.abs(counts("train") / 4000.0 - 0.8) < 0.03)
    assert(math.abs(counts("val") / 4000.0 - 0.1) < 0.03)
  }

  test("assignment is a pure function of the key: stable across shuffles") {
    val once = Splits.assign(keys, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val again = Splits.assign(keys.repartition(7, col("k")), "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(once === again)
  }

  test("stratified sampling honors per-stratum rates and stays key-pure") {
    import spark.implicits._
    val df = (0L until 4000L).map(i => (i, s"src${i % 4}")).toDF("k", "s")
    val rates = Seq("src0" -> 100, "src1" -> 50, "src2" -> 0)
    val kept = Splits.sampleStratified(df, "k", "s", rates, defaultPct = 10)
    val bySrc = kept.groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === 1000L) // 100% stratum keeps everything
    assert(!bySrc.contains("src2")) // 0% stratum keeps nothing
    assert(math.abs(bySrc("src1") / 1000.0 - 0.5) < 0.06)
    assert(math.abs(bySrc("src3") / 1000.0 - 0.1) < 0.04) // default rate
    // purity: a row's fate is independent of partitioning and of which
    // other rows exist
    val keptIds = kept.select("k").collect().map(_.getLong(0)).toSet
    val subsetKept = Splits.sampleStratified(
        df.filter(col("k") < 2000).repartition(5, col("k")), "k", "s", rates, 10)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(subsetKept === keptIds.filter(_ < 2000))
  }

  test("budget mixture keeps whole small strata and slices big ones deterministically") {
    import spark.implicits._
    // src_small: 10 rows x 10 tokens = 100 <= budget 500 -> keep all;
    // src_big: 1000 rows x 10 tokens = 10000 -> rate 0.05
    val df = ((0L until 10L).map(i => (i, "src_small", 10L)) ++
      (100L until 1100L).map(i => (i, "src_big", 10L))).toDF("k", "s", "w")
    val kept = Splits.sampleByBudget(df, "k", "s", "w", budget = 500L)
    val bySrc = kept.groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src_small") === 10L)
    // rate floor(256*0.05)/256 = 12/256 ≈ 4.7%: the hash slice lands near it
    assert(bySrc("src_big") > 20L && bySrc("src_big") < 80L)
    // determinism + key-purity: same result on a repartitioned subset
    val keptBig = kept.filter(col("s") === "src_big")
      .select("k").collect().map(_.getLong(0)).toSet
    val again = Splits.sampleByBudget(
        df.filter(col("s") === "src_big").repartition(7, col("k")),
        "k", "s", "w", budget = 500L)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(again === keptBig)
  }

  test("temperature mixture upsamples small strata relative to proportional") {
    import spark.implicits._
    // big: 2000 rows × 1 token, small: 100 rows × 1 token
    val df = ((0L until 2000L).map(i => (i, "big", 1L)) ++
      (10000L until 10100L).map(i => (i, "small", 1L))).toDF("k", "s", "w")
    def keptBySrc(kept: org.apache.spark.sql.DataFrame) =
      kept.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
    val temp = keptBySrc(Splits.sampleByTemperature(df, "k", "s", "w",
      alpha = 0.5, budget = 300L))
    // the GLOBAL budget is respected: ~300 of 2100 tokens kept
    assert(math.abs(temp.values.sum - 300L) < 60L, s"temp=$temp")
    // α = 0.5 shifts share toward the small stratum: shares ∝ √mass →
    // small's keep rate ≈ 300·(√100/(√2000+√100))/100 ≈ 55%, far above
    // the uniform global-proportional 300/2100 ≈ 14%; big lands below it
    assert(temp("small").toDouble / 100 > 0.35, s"temp=$temp")
    assert(temp("big").toDouble / 2000 < 0.145, s"temp=$temp")
    // determinism: same key set on re-evaluation over a repartition
    val again = keptBySrc(Splits.sampleByTemperature(df.repartition(7, col("k")),
      "k", "s", "w", alpha = 0.5, budget = 300L))
    assert(again === temp)
  }

  test("sampleTopN keeps exactly n per stratum, whole strata when smaller") {
    import spark.implicits._
    val df = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "tiny"))).toDF("k", "s")
    val kept = Splits.sampleTopN(df, "k", "s", n = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(kept.count(_._2 == "big") === 10)
    assert(kept.count(_._2 == "tiny") === 3)
    // selection is the md5-minimal key set, not arbitrary
    val expectBig = (0L until 100L)
      .sortBy(k => org.apache.commons.codec.digest.DigestUtils.md5Hex(k.toString))
      .take(10).toSet
    assert(kept.filter(_._2 == "big").map(_._1).toSet === expectBig)
    // pure function of the keys: layout-independent
    val again = Splits.sampleTopN(df.repartition(7, col("k")), "k", "s", n = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(again === kept.toSet)
  }

  test("weightedSample favors heavy rows, is layout-pure, keeps small strata whole") {
    import spark.implicits._
    // 500 light rows (w=1) + 100 heavy rows (w=20) in one stratum: an
    // A-ES draw of 60 should be dominated by heavy rows (each is 20x
    // as likely); the assertion is deterministic because the "draw" is
    // a pure function of the keys
    val df = ((0L until 500L).map(i => (i, "s", 1L)) ++
      (1000L until 1100L).map(i => (i, "s", 20L)) ++
      (2000L until 2005L).map(i => (i, "tiny", 5L))).toDF("k", "s", "w")
    val kept = Splits.weightedSample(df, "k", "s", "w", n = 60)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "s") === 60)
    assert(kept.count(_._2 == "tiny") === 5) // stratum smaller than n
    val heavy = kept.count(t => t._2 == "s" && t._1 >= 1000L)
    // 100 heavy rows out of 600, weight 20 vs 1: expected heavy share
    // ~20·100/(20·100+500) ≈ 80%; even a loose bound separates regimes
    assert(heavy >= 40, s"only $heavy/60 heavy rows survived")
    // pure function of (key, weight): layout-independent
    val again = Splits.weightedSample(df.repartition(9, col("k")), "k", "s", "w", n = 60)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === kept.toSet)
    // exact model cross-check: the survivors are the top-60 by the
    // closed-form sort key (md5-52-bit uniform, rounded pow, key tiebreak)
    def skey(k: Long, w: Long): Double = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(k.toString).take(13)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
      BigDecimal(math.pow(u, 1.0 / w)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (((0L until 500L).map(k => (k, 1L)) ++
      (1000L until 1100L).map(k => (k, 20L))))
      .sortBy { case (k, w) => (-skey(k, w), k) }.take(60).map(_._1).toSet
    assert(kept.filter(_._2 == "s").map(_._1).toSet === expect)
  }

  test("degenerate percentages: all-train and all-test") {
    val allTrain = Splits.assign(keys, "k", trainPct = 100, valPct = 0)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(allTrain === Seq("train"))
    val allTest = Splits.assign(keys, "k", trainPct = 0, valPct = 0)
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(allTest === Seq("test"))
    assertThrows[IllegalArgumentException](Splits.assign(keys, "k", 90, 20))
  }
}
