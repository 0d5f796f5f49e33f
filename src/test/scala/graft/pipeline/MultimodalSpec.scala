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
}
