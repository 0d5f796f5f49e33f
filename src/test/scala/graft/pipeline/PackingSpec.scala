package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def pack(rows: Seq[(Long, Long)], budget: Long, shardSize: Long) = {
    import spark.implicits._
    Packing.packGreedy(rows.toDF("doc_id", "tk"), "doc_id", "tk",
        budget, shardSize, spark)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("greedy packing fills to the budget, resets on overflow, isolates oversize docs") {
    //            id -> tokens   (shard 0, budget 10)
    val got = pack(Seq(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 25L, 5L -> 1L, 6L -> 9L),
      budget = 10L, shardSize = 100L)
    assert(got(1L) === (0L, 0L)) // 4
    assert(got(2L) === (0L, 0L)) // 4+4=8 fits
    assert(got(3L) === (0L, 1L)) // 8+4 > 10 → new pack
    assert(got(4L) === (0L, 2L)) // oversize: its own pack, never split
    assert(got(5L) === (0L, 3L)) // 25+1 > 10 → new pack after the oversize
    assert(got(6L) === (0L, 3L)) // 1+9 = 10: exact fit shares
  }

  test("sharding bounds the chain: packing restarts per shard and is layout-pure") {
    import spark.implicits._
    val rows = (0L until 250L).map(i => i -> (i % 7 + 1))
    val once = pack(rows, budget = 16L, shardSize = 50L)
    // every shard starts at pack 0 and never mixes ids across shards
    (0L until 5L).foreach { s =>
      assert(once(s * 50L)._2 === 0L)
      assert(once.filter(_._2._1 == s).keySet === (s * 50L until s * 50L + 50L).toSet)
    }
    // pure function of the (id, tokens) table: partition layout is irrelevant
    val again = Packing.packGreedy(
        rows.toDF("doc_id", "tk").repartition(13, col("tk")), "doc_id", "tk",
        16L, 50L, spark)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again === once)
    // no pack exceeds the budget unless it is a single oversize doc
    val packTotals = rows.toMap.toSeq
      .groupMapReduce(kv => once(kv._1))(_._2)(_ + _)
    packTotals.foreach { case (packKey, total) =>
      val members = rows.filter(kv => once(kv._1) == packKey)
      assert(total <= 16L || members.sizeIs == 1, s"pack $packKey overflows with $members")
    }
  }

  test("chunkTokens: overlap, tail coverage, and short-doc collapse are exact") {
    import spark.implicits._
    def sha(s: String) =
      org.apache.commons.codec.digest.DigestUtils.sha256Hex(s)
    val toks10 = (0 until 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, toks10), (2L, "a b c")).toDF("doc_id", "text")
    val got = Packing.chunkTokens(df, "doc_id", "text", chunkSize = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // 10 tokens, C=4, S=2 → 1 + ceil(6/2) = 4 chunks at starts 0,2,4,6
    assert(got.keySet === Set((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), (2L, 0L)))
    assert(got((1L, 0L)) === ((0L, 4L, sha("t0 t1 t2 t3"))))
    assert(got((1L, 1L)) === ((2L, 4L, sha("t2 t3 t4 t5"))))
    assert(got((1L, 3L)) === ((6L, 4L, sha("t6 t7 t8 t9"))))
    // 3 tokens < C → one whole-doc chunk
    assert(got((2L, 0L)) === ((0L, 3L, sha("a b c"))))
    // 9 tokens: the last window is a partial tail, still covered
    val tail = Packing.chunkTokens(
        Seq((3L, (0 until 9).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", chunkSize = 4, stride = 2)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(tail === Map(0L -> ((0L, 4L)), 1L -> ((2L, 4L)),
      2L -> ((4L, 4L)), 3L -> ((6L, 3L))))
    assertThrows[IllegalArgumentException](
      Packing.chunkTokens(df, "doc_id", "text", chunkSize = 4, stride = 5))
  }

  test("packAudit: waste + fill account for every pack, oversize packs waste zero") {
    import spark.implicits._
    // the planted shape from the greedy test: packs fill 8, 4, 25, 10
    val rows = Seq(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 25L, 5L -> 1L, 6L -> 9L)
    val got = Packing.packAudit(rows.toDF("doc_id", "tk"), "doc_id", "tk",
        budget = 10L, shardSize = 100L, spark)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // 4 packs, 6 docs, 47 tokens packed; waste = 2 + 6 + 0 (oversize) + 0
    assert(got === Map(0L -> ((4L, 6L, 47L, 8L, 1.175))))
    // accounting identity on a multi-shard corpus WITHOUT oversize docs:
    // packed + waste = n_packs * budget, and doc/token mass is conserved
    val many = (0L until 250L).map(i => i -> (i % 7 + 1))
    val audit = Packing.packAudit(many.toDF("doc_id", "tk"), "doc_id", "tk",
        budget = 16L, shardSize = 50L, spark).collect()
    assert(audit.map(_.getLong(2)).sum === 250L)
    assert(audit.map(_.getLong(3)).sum === many.map(_._2).sum)
    audit.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) === r.getLong(1) * 16L)
    }
  }

  test("shuffle shards give a reproducible layout-independent training order") {
    import spark.implicits._
    val df = (0L until 500L).toDF("doc_id")
    val once = Packing.shuffleShards(df, "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // exhaustive and positionally dense per shard: positions are 1..n
    assert(once.size === 500)
    once.groupBy(_._2._1).foreach { case (_, rows) =>
      assert(rows.values.map(_._2).toSeq.sorted === (1L to rows.size).toSeq)
    }
    // 16 hex shards, roughly balanced
    val shardSizes = once.values.groupBy(_._1).view.mapValues(_.size)
    assert(shardSizes.size === 16)
    assert(shardSizes.values.forall(s => s > 10 && s < 60))
    // pure function of the keys: partition layout changes nothing
    val again = Packing.shuffleShards(df.repartition(11, col("doc_id")), "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(again === once)
  }
}
