package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("closure enumerates every (node, ancestor, depth) exactly once") {
    // forest: 1 ← {2, 3}, 2 ← {4, 5}, 4 ← 6; plus isolated root 9
    val parents = Seq(
      (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L), (6L, 4L)).toDF("node", "parent")
    val got = Hierarchy.closure(parents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = Set(
      (2L, 1L, 1L), (3L, 1L, 1L), (4L, 2L, 1L), (5L, 2L, 1L), (6L, 4L, 1L),
      (4L, 1L, 2L), (5L, 1L, 2L), (6L, 2L, 2L),
      (6L, 1L, 3L))
    assert(got === expected)
  }

  test("closure covers a deep chain past several doubling rounds") {
    // chain 1 ← 2 ← 3 ← ... ← 12: node 12 has 11 ancestors, and the
    // doubling loop needs 4 rounds (depths 1,2,4,8 frontier) to close
    val parents = (2L to 12L).map(n => (n, n - 1)).toDF("node", "parent")
    val got = Hierarchy.closure(parents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (for {
      n <- 2L to 12L
      a <- 1L until n
    } yield (n, a, n - a)).toSet
    assert(got === expected)
    // no duplicates: one row per (node, anc)
    val rows = Hierarchy.closure(parents).groupBy(col("node"), col("anc"))
      .count().filter(col("count") > 1)
    assert(rows.isEmpty)
  }

  test("closure matches driver ancestor chains on random forests") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 5 + rnd.nextInt(20)
      // random forest: each node's parent is a strictly smaller id (or
      // none) — acyclic by construction, arbitrary branching
      val parentOf = (1L until n.toLong).flatMap { v =>
        if (rnd.nextInt(4) == 0) None // root
        else Some(v -> rnd.nextInt(v.toInt).toLong)
      }.toMap
      val df = parentOf.toSeq.toDF("node", "parent")
      val got = Hierarchy.closure(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = (for {
        v <- parentOf.keys
        chain = Iterator.iterate(Option(v))(_.flatMap(parentOf.get))
          .drop(1).takeWhile(_.isDefined).map(_.get).toSeq
        (a, d) <- chain.zipWithIndex
      } yield (v, a, d.toLong + 1L)).toSet
      assert(got === expected, s"seed=$seed parents=$parentOf")
    }
  }

  test("maxDepth truncates the closure") {
    val parents = (2L to 8L).map(n => (n, n - 1)).toDF("node", "parent")
    val got = Hierarchy.closure(parents, maxDepth = 2)
      .agg(max(col("depth"))).first().getLong(0)
    assert(got <= 2L)
  }
}
