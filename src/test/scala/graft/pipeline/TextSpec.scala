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
}
