package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** The extension hook must expose the native expressions to pure SQL.
  * Built on a sibling session (same SparkContext) so the shared test
  * session is untouched; active/default sessions are restored after.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_* and fnv64 resolve and compute through spark.sql") {
    val base = spark // force shared session init first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql(
        """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                  vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
                  vec_l2sq(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l,
                  fnv64('abc') AS f,
                  simhash64(array('a', 'b')) AS sh,
                  minhash_signature(array('a', 'b'), 4) AS mh""").first()
      assert(r.getDouble(0) === 11.0)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      assert(r.getDouble(2) === 25.0)
      assert(r.getLong(3) === FnvHash64.hashBytes("abc".getBytes("UTF-8")))
      // parity with the Column-API expressions on the same inputs
      import s.implicits._
      val viaCol = Seq(Seq("a", "b")).toDF("arr")
        .select(HashFunctions.simhash64(org.apache.spark.sql.functions.col("arr")),
          HashFunctions.minhashSignature(org.apache.spark.sql.functions.col("arr"), 4))
        .first()
      assert(r.getLong(4) === viaCol.getLong(0))
      assert(r.getSeq[Long](5) === viaCol.getSeq[Long](1))
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
