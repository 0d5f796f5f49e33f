package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hilbert encode: bijectivity + the defining adjacency property
  * (consecutive curve positions are grid neighbors), exhaustively on
  * small grids through the same code path the expression runs; the
  * curve's locality advantage over Morton order asserted numerically;
  * and interpreted ≡ codegen parity for the Column face.
  */
class HilbertSpec extends SparkSpec {

  test("exhaustive on 8x8 and 32x32: bijection and unit-step adjacency") {
    for (bits <- Seq(3, 5)) {
      val n = 1 << bits
      val cells = for (x <- 0 until n; y <- 0 until n)
        yield (x, y, HilbertEncode.encode(x.toLong, y.toLong, bits))
      val ds = cells.map(_._3)
      assert(ds.toSet == (0L until n.toLong * n).toSet, s"bits=$bits not a bijection")
      val byD = cells.sortBy(_._3)
      byD.sliding(2).foreach { case Seq((x1, y1, _), (x2, y2, _)) =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"bits=$bits: non-adjacent consecutive cells ($x1,$y1)→($x2,$y2)")
      }
    }
  }

  test("locality beats Morton: total consecutive-cell distance on 32x32") {
    val n = 32
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y)
    def pathLen(key: (Int, Int) => Long): Long =
      cells.sortBy { case (x, y) => key(x, y) }.sliding(2).map {
        case Seq((x1, y1), (x2, y2)) =>
          (math.abs(x1 - x2) + math.abs(y1 - y2)).toLong
      }.sum
    val h = pathLen((x, y) => HilbertEncode.encode(x.toLong, y.toLong, 5))
    val z = pathLen((x, y) => ZOrder.interleave(x.toLong, y.toLong))
    assert(h == n * n - 1, s"hilbert path $h is not minimal")
    assert(z > h, s"morton path $z not worse than hilbert $h")
  }

  test("16-bit grid: injective on random keys; masking matches 16-bit truncation") {
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(20000)((rnd.nextLong().abs % 65536,
      rnd.nextLong().abs % 65536)).distinct
    val enc = pts.map { case (x, y) => HilbertEncode.encode(x, y) }
    assert(enc.distinct.size == pts.size)
    assert(HilbertEncode.encode(65536L + 7, 131072L + 9) ==
      HilbertEncode.encode(7, 9))
  }

  test("expression: interpreted equals codegen equals the scala recurrence") {
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (65535L, 65535L), (1234L, 4321L))
      .toDF("a", "b")
    val want = Seq((3L, 5L), (0L, 0L), (65535L, 65535L), (1234L, 4321L))
      .map { case (a, b) => HilbertEncode.encode(a, b) }
    val gotCodegen = df.select(HilbertEncode(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(gotCodegen == want)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val gotInterp = df.select(HilbertEncode(col("a"), col("b")))
        .collect().map(_.getLong(0)).toSeq
      assert(gotInterp == want)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
