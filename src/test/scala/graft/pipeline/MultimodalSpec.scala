package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("extractMeta emits deterministic typed metadata from binary payloads") {
    import spark.implicits._
    val df = Multimodal.withPayload(
      Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text"), "text")
    assert(df.schema("payload").dataType.typeName === "binary")
    val metas = Multimodal.extractMeta(spark, df, "doc_id")
      .collect().map(m => m.media_id -> m).toMap
    assert(metas(1L).byte_size === 3L)
    assert(metas(1L).sha ===
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(metas(1L).width === 1L + 3 % 1024)
    assert(metas(1L).height === 1L + (3 * 7) % 768)
    assert(metas(2L).byte_size === 0L)
    assert(metas.values.forall(_.format == "fake/raw"))
  }

  test("resize emits the target byte budget per row, deterministically") {
    import spark.implicits._
    val df = Multimodal.withPayload(
      Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text"), "text")
    val out = Multimodal.resize(spark, df, "doc_id", 128, 64)
      .collect().map { case (id, b) => id -> b }.toMap
    val budget = 128 * 64 / 256 + 8
    assert(out(1L).length === budget && out(2L).length === budget)
    assert(out(1L)(0) === 'h'.toByte && out(1L)(11) === 'h'.toByte) // wraps
    assert(out(2L).forall(_ == 0))
  }

  test("sampleFrames fans one payload out to every stride-th frame") {
    import spark.implicits._
    val payload = ("x" * 300) // 4 full 64-byte frames, sample 0 and 2
    val df = Multimodal.withPayload(Seq((7L, payload)).toDF("doc_id", "text"), "text")
    val frames = Multimodal.sampleFrames(spark, df, "doc_id", frameBytes = 64, stride = 2)
      .collect().sortBy(_._2)
    assert(frames.map(f => (f._1, f._2)).toSeq === Seq((7L, 0L), (7L, 2L)))
    assert(frames.forall(_._3.length === 64))
  }
}
