package graft.store

import graft.SparkSpec

/** MERGE semantics of the snapshot ⊕ change-log compaction: last change
  * per key wins under the declared order, D deletes, I/U upsert, and
  * untouched base keys survive unchanged.
  */
class CdcMergeSpec extends SparkSpec {

  test("cdc merge applies last-wins upserts, deletes, inserts, and keeps untouched rows") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (6L, "f"))
      .toDF("k", "v")
    val changes = Seq(
      // key 2: update then a later delete → gone
      (2L, "b2", 1L, 1L, "U"),
      (2L, "b2x", 2L, 2L, "D"),
      // key 3: two updates → the later one wins
      (3L, "c1", 1L, 3L, "U"),
      (3L, "c2", 2L, 4L, "U"),
      // key 4: insert of a key absent from the base
      (4L, "d", 1L, 5L, "I"),
      // key 5: insert then delete → never appears
      (5L, "e", 1L, 6L, "I"),
      (5L, "e", 2L, 7L, "D"),
      // key 6: same ts twice → the sequence column breaks the tie
      (6L, "f1", 9L, 8L, "U"),
      (6L, "f2", 9L, 9L, "U")).toDF("k", "v", "ts", "seq", "op")
    val res = CdcMerge.merge(base, changes, "k", Seq("ts", "seq"), "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res === Map(1L -> "a", 3L -> "c2", 4L -> "d", 6L -> "f2"))
  }

  test("incremental compaction is batch-boundary-invariant and equals the one-shot merge") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (6L, "f")).toDF("k", "v")
    val changes = Seq(
      (2L, "b2", 1L, 1L, "U"), (2L, "b2x", 2L, 2L, "D"),
      (3L, "c1", 1L, 3L, "U"), (3L, "c2", 2L, 4L, "U"),
      (4L, "d", 1L, 5L, "I"),
      (5L, "e", 1L, 6L, "I"), (5L, "e", 2L, 7L, "D"),
      (6L, "f1", 9L, 8L, "U"), (6L, "f2", 9L, 9L, "U"))
    val oneShot = CdcMerge.merge(base, changes.toDF("k", "v", "ts", "seq", "op"),
        "k", Seq("ts", "seq"), "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // fold the log through compact() in ADVERSARIAL batch splits: the
    // delete of key 2 arrives BEFORE its earlier update, and key 3's
    // later update before its earlier one — tombstones + retained order
    // columns must keep the result identical to the one-shot merge
    val shuffled = Seq(
      Seq(changes(1), changes(3), changes(6)), // later changes first
      Seq(changes(0), changes(4), changes(8)),
      Seq(changes(2), changes(5), changes(7)))
    val init = CdcMerge.initState(base, changes.toDF("k", "v", "ts", "seq", "op"),
      "k", Seq("ts", "seq"), "op")
    val finalState = shuffled.foldLeft(init) { (st, b) =>
      CdcMerge.compact(st, b.toDF("k", "v", "ts", "seq", "op"),
        "k", Seq("ts", "seq"), "op").localCheckpoint()
    }
    val incremental = CdcMerge.visible(finalState, Seq("ts", "seq"), "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(incremental === oneShot)
  }
}
