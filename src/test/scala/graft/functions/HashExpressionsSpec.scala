package graft.functions

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused signature expressions must be bit-identical to the
  * explode + groupBy SQL formulations they replaced (which pin the
  * xxhash64 seed/composition semantics), in both execution modes.
  */
class HashExpressionsSpec extends SparkSpec {

  private val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum", "gold")

  private lazy val docs: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (Seq.tabulate(30) { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (98L -> "one") :+ (99L -> "")).toDF("doc_id", "text")
  }

  test("minhash signature expression matches the groupBy formulation bit-for-bit") {
    val viaExpr = Dedup.minhashSignatures(docs, "doc_id", "text", shingleN = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaGroupBy = Dedup.signaturesFromHashed(
        Dedup.hashedShingles(docs, "doc_id", "text", n = 2))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr.keySet === viaGroupBy.keySet)
    viaExpr.foreach { case (id, sig) => assert(sig === viaGroupBy(id), s"doc $id") }
  }

  test("winnow expression selects the same fingerprint set as the HOF formulation") {
    val viaExpr = docs.select(col("doc_id"),
        Dedup.winnowFingerprints(col("text"), 3, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val viaHof = docs.select(col("doc_id"),
        Dedup.winnowFingerprintsHof(col("text"), 3, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(viaExpr === viaHof)
    assert(viaExpr.values.forall(_.nonEmpty))
    // interpreted mode agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = docs.select(col("doc_id"),
          Dedup.winnowFingerprints(col("text"), 3, 4).as("fps"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      assert(interp === viaExpr)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("zorder expression interleaves bits, known answers, both execution modes") {
    import spark.implicits._
    // zorder(5, 3): a=0b101 at even positions -> 0b10001 (17);
    // b=0b011 at odd positions -> 0b1010 (10); z = 27
    assert(ZOrder.interleave(5L, 3L) === 27L)
    assert(ZOrder.interleave(0L, 0L) === 0L)
    assert(ZOrder.interleave((1L << 31) - 1, 0L) === 0x1555555555555555L)
    val df = Seq((5L, 3L), (0L, 0L), (123456789L, 987654321L)).toDF("a", "b")
    def run(codegen: Boolean): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try df.select(ZOrder(col("a"), col("b")).as("z")).collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val viaCodegen = run(codegen = true)
    val viaInterp = run(codegen = false)
    assert(viaCodegen === viaInterp)
    assert(viaCodegen.head === 27L)
    // definition check: bit i of a lands at position 2i, b at 2i+1
    val (a, b) = (123456789L, 987654321L)
    val expected = (0 until 31).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)
    assert(viaCodegen(2) === expected)
  }

  test("simhash expression matches the vote-aggregation formulation bit-for-bit") {
    val viaExpr = Dedup.simhash(docs, "doc_id", "text", shingleN = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the round-1 explode + 64-sum-votes formulation, inlined
    val sh = Dedup.shingles(docs, "doc_id", "text", n = 2)
      .withColumn("h", xxhash64(col("sh")))
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val packed = (0 until 64)
      .map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    val viaAgg = sh.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"), packed.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaAgg)
  }

  test("interpreted mode agrees with codegen") {
    val conf = spark.conf
    val prev = conf.get("spark.sql.codegen.wholeStage", "true")
    def run(): (Map[Long, Seq[Long]], Map[Long, Long]) = (
      Dedup.minhashSignatures(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap,
      Dedup.simhash(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val (mhC, shC) = run()
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val (mhI, shI) = run()
      assert(mhC === mhI)
      assert(shC === shI)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", prev)
      conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
