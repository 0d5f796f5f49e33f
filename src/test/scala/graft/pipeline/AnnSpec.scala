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
