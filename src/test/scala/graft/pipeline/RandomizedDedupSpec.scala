package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized cross-check of the exact-Jaccard verify stage against a
  * driver-side set computation — the dedup candidates are rows-only in
  * the driver gate, so random corpora are the evidence that the
  * shingle/hash/join pipeline computes the textbook quantity.
  */
class RandomizedDedupSpec extends SparkSpec {

  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel")

  private def randomDoc(rnd: Random): String =
    Seq.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.trim.split("\\s+").toSeq
    if (toks.size < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("ngram jaccard matches driver set computation on random corpora") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val rnd = new Random(seed)
      val docs = (0L until 8L).map(i => (i, randomDoc(rnd)))
      val df = docs.toDF("doc_id", "text")
      val pairs = (for {
        a <- docs.indices; b <- (a + 1) until docs.size
      } yield (a.toLong, b.toLong)).toDF("id_a", "id_b")
      val got = Dedup.ngramJaccard(df, "doc_id", "text", pairs, shingleN = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      docs.indices.foreach { a =>
        ((a + 1) until docs.size).foreach { b =>
          val sa = shingleSet(docs(a)._2, 2)
          val sb = shingleSet(docs(b)._2, 2)
          val expected = sa.intersect(sb).size.toDouble / sa.union(sb).size
          assert(math.abs(got((a.toLong, b.toLong)) - expected) < 1e-12,
            s"seed=$seed pair=($a,$b)")
        }
      }
    }
  }

  test("exact dedup groups match driver grouping on random corpora with planted dupes") {
    import spark.implicits._
    val rnd = new Random(99)
    val base = (0L until 6L).map(i => (i, randomDoc(rnd)))
    val docs = base ++ Seq((6L, base(0)._2), (7L, base(2)._2), (8L, base(0)._2))
    val got = Dedup.exact(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val expected = docs.groupBy(_._2).map { case (_, g) =>
      g.map(_._1).min -> g.size.toLong
    }
    assert(got === expected)
  }

  test("decontamination matches driver set-overlap on random corpora") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(100 + seed)
      val test = (0L until 4L).map(i => (i, randomDoc(rnd)))
      val corpus = (10L until 20L).map(i => (i, randomDoc(rnd)))
      val got = Dedup.decontaminate(
          corpus.toDF("doc_id", "text"), test.toDF("doc_id", "text"),
          "doc_id", "text", n = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val testShingles = test.flatMap(d => shingleSet(d._2, 2)).toSet
      val expected = corpus
        .map(d => d._1 -> shingleSet(d._2, 2).intersect(testShingles).size.toLong)
        .filter(_._2 > 0).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("line dedup matches driver first-occurrence semantics on random corpora") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val rnd = new Random(200 + seed)
      // sentences drawn from a small pool force heavy cross-doc repeats
      val pool = Vector("alpha bravo", "charlie delta", "echo foxtrot",
        "golf hotel alpha", "bravo charlie")
      val docs = (0L until 10L).map { i =>
        i -> Seq.fill(1 + rnd.nextInt(4))(pool(rnd.nextInt(pool.size)))
          .mkString(". ") // interior terminators; final sentence bare
      }
      val got = Dedup.lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // driver model: first (doc, pos) wins per distinct sentence
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.map { case (id, text) =>
        val lines = text.toLowerCase.trim.split("[.!?]+\\s+").toSeq
          .map(_.replaceAll("[.!?]+$", "")).filter(_.nonEmpty)
        val kept = lines.count(l => seen.add(l))
        id -> ((lines.size.toLong, kept.toLong))
      }.toMap
      assert(got === expected, s"seed=$seed docs=$docs")
    }
  }

  test("span dedup matches driver first-occurrence removal on random corpora") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val rnd = new Random(300 + seed)
      // tiny vocab + short window force heavy window collisions,
      // including intra-doc repeats and sub-window docs
      val docs = (0L until 12L).map { i =>
        i -> Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(3))).mkString(" ")
      }
      val k = 3
      val got = Dedup.spanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // driver model: corpus-order first occurrence of each k-window
      // survives; every other occurrence covers its k positions
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.map { case (id, text) =>
        val toks = text.trim.split("\\s+").toSeq
        val covered = scala.collection.mutable.Set.empty[Int]
        if (toks.size >= k) {
          (0 to toks.size - k).foreach { s =>
            val w = toks.slice(s, s + k).mkString(" ")
            if (!seen.add(w)) covered ++= (s until s + k)
          }
        }
        id -> ((toks.size.toLong, (toks.size - covered.size).toLong))
      }.toMap
      assert(got === expected, s"seed=$seed docs=$docs")
    }
  }

  test("chunking matches driver window arithmetic on random lengths") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rnd = new Random(300 + seed)
      val docs = (0L until 12L).map { i =>
        i -> (0 until 1 + rnd.nextInt(40)).map(j => s"w$j").mkString(" ")
      }
      val c = 2 + rnd.nextInt(6)
      val s = 1 + rnd.nextInt(c)
      val got = Packing.chunkTokens(docs.toDF("doc_id", "text"), "doc_id", "text",
          chunkSize = c, stride = s)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
      val expected = docs.flatMap { case (id, text) =>
        val n = text.split("\\s+").length
        val nChunks = 1 + (math.max(n - c, 0) + s - 1) / s
        (0 until nChunks).map(k =>
          (id, k.toLong) -> ((k.toLong * s, math.min(c, n - k * s).toLong)))
      }.toMap
      assert(got === expected, s"seed=$seed c=$c s=$s")
    }
  }
}
