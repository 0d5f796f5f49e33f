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
