package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ANN exactness (brute) and recall (LSH) on the real embeddings table. */
class AnnSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf("sf0.001"), "embeddings")

  test("brute knn returns k ranked neighbors per query, cosine descending") {
    val res = Ann.bruteKnn(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", k = 4)
      .collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.keySet === Set(0L, 1L, 2L))
    byQuery.foreach { case (_, rows) =>
      assert(rows.length === 4)
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(r => r.getLong(1) == r.getLong(0))) // self excluded
    }
  }

  test("lsh knn achieves >=40% recall@5 vs brute on the test corpus") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Ann.bruteKnn(queries, emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.lshKnn(queries, emb, "vec_id", "embedding", dim = 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(s"recall@5 = $recall")
    assert(recall >= 0.4)
    // LSH results are a subset of true neighbors only in cosine terms;
    // every returned neighbor must at least be a real corpus id
    assert(lsh.forall { case (q, n) => q != n })
  }

  test("pq adc shortlist + exact re-rank recovers recall the codes alone cannot") {
    val queries = emb.filter(col("vec_id") < 20)
    // exact L2 ground truth, driver-side (sf0.001 corpus is tiny)
    val all = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val exact = (0L until 20L).flatMap { q =>
      val qv = all(q)
      all.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        .sortBy { case (id, d) => (d, id) }.take(5).map(q -> _._1)
    }.toSet
    def recallOf(got: Set[(Long, Long)]) =
      (exact intersect got).size.toDouble / exact.size
    // pure ADC: quantization error caps recall — these near-uniform
    // synthetic embeddings are the PQ worst case (measured 0.17 at
    // m=4 k=16; real clustered embeddings do far better). The floor
    // pins "codes carry signal", not production recall.
    val adc = Cluster.pqAdcKnn(emb, "vec_id", "embedding",
        m = 4, k = 16, rounds = 2, queries = queries, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcRecall = recallOf(adc)
    info(s"pure-adc recall@5 = $adcRecall")
    assert(adcRecall >= 0.1)
    assert(adc.forall { case (q, n) => q != n })
    // the deployed shape: ADC shortlist, exact re-rank of only the
    // shortlist — recall climbs with shortlist size (the cost knob)
    val r40 = recallOf(Cluster.pqRerankKnn(emb, "vec_id", "embedding",
        m = 4, k = 16, rounds = 2, queries = queries, topK = 5, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val r80 = recallOf(Cluster.pqRerankKnn(emb, "vec_id", "embedding",
        m = 4, k = 16, rounds = 2, queries = queries, topK = 5, shortlist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    info(s"rerank recall@5: shortlist40=$r40 shortlist80=$r80")
    assert(r40 >= 0.5)
    assert(r80 >= 0.7)
    assert(r80 >= r40)
  }

  test("hard negatives rank by similarity but never share the query's label") {
    import spark.implicits._
    val rows = Seq(
      // query 0 (label 0); vector 1 is same-label and CLOSEST — must be
      // excluded; 2 and 3 are different-label in descending similarity
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.01f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f), 1),
      (3L, Array(0.5f, 0.5f, 0.0f), 1),
      (4L, Array(0.0f, 1.0f, 0.0f), 2)).toDF("vec_id", "embedding", "label")
    val got = Ann.hardNegatives(rows.filter(col("vec_id") === 0), rows,
        "vec_id", "embedding", "label", k = 2)
      .collect().map(r => (r.getLong(2), r.getInt(3), r.getInt(5)))
    assert(got.toSeq === Seq((2L, 1, 1), (3L, 1, 2))) // ranked, same-label 1 excluded
  }

  test("ivf-pq: residual codes + coarse prune match flat-pq rerank recall at equal budget, candidates bounded by nProbe/nLists") {
    val queries = emb.filter(col("vec_id") < 20)
    val nq = 20
    // exact L2 ground truth (as the flat-PQ test)
    val all = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val corpusN = all.size
    val exact = (0L until nq.toLong).flatMap { q =>
      val qv = all(q)
      all.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          id -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        .sortBy { case (id, d) => (d, id) }.take(5).map(q -> _._1)
    }.toSet
    def recallOf(got: Set[(Long, Long)]) =
      (exact intersect got).size.toDouble / exact.size
    val (nLists, nProbe, short) = (16, 4, 40)
    val ivfpq = Cluster.ivfPqKnn(emb, "vec_id", "embedding",
        nLists = nLists, m = 4, k = 16, rounds = 2,
        queries = queries, topK = 5, nProbe = nProbe, shortlist = short)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = recallOf(Cluster.pqRerankKnn(emb, "vec_id", "embedding",
        m = 4, k = 16, rounds = 2, queries = queries, topK = 5,
        shortlist = short)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val r = recallOf(ivfpq)
    info(s"ivf-pq rerank recall@5 = $r vs flat-pq rerank = $flat (shortlist $short)")
    // equal re-rank budget: the residual-encoded codes must buy back at
    // least what the coarse prune gives up
    assert(r >= flat, s"ivf-pq recall $r fell below flat-pq $flat")
    // candidate volume: ADC scores only the probed lists' codes —
    // the whole point. Bound: nProbe/nLists of the corpus per query,
    // with 2x slack for list-size skew on this small corpus.
    val coarse = Cluster.kmeansFit(emb, "vec_id", "embedding", nLists, 2)
    val (sub2, books2, codes2) =
      Cluster.ivfPqFit(emb, "vec_id", "embedding", coarse, m = 4, k = 16, rounds = 2)
    val candCount = Cluster.ivfPqShortlistFrom(codes2.localCheckpoint(), sub2,
        books2, coarse, queries, "vec_id", "embedding", nProbe, Int.MaxValue)
      .count()
    val bound = (nq.toDouble * corpusN * nProbe / nLists * 2).toLong
    info(s"adc candidates = $candCount, bound = $bound (corpus $corpusN × $nq queries)")
    assert(candCount <= bound,
      s"candidate volume $candCount exceeds the nProbe/nLists bound $bound")
  }

  test("ivf knn achieves >=40% recall@5 vs brute on the test corpus") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Ann.bruteKnn(queries, emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfKnn(queries, emb, "vec_id", "embedding", k = 5,
        nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(s"recall@5 = $recall")
    assert(recall >= 0.4)
    assert(ivf.forall { case (q, n) => q != n })
  }
}
