package graft.store

import graft.SparkSpec
import graft.catalog.LayoutSpec
import org.apache.spark.sql.functions._

class StoreSpec extends SparkSpec {

  test("writeTable applies partition/bucket/sort layout") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString + "/t"
    val df = Seq.tabulate(100)(i => (i.toLong, i % 2, s"v$i")).toDF("id", "part", "payload")
    GraphStore.writeTable(df, dir,
      LayoutSpec(partitionBy = Seq("part"), bucketBy = Some((2, Seq("id"))), sortBy = Seq("id")))

    // hive-style partition directories
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq === Seq("part=0", "part=1"))

    // round-trips with full content
    val back = spark.read.parquet(dir)
    assert(back.count() === 100)
    assert(back.select(sum(col("id"))).first().getLong(0) === (0L until 100L).sum)

    // each file is sorted by id (rowgroup min/max usable as range index)
    val files = new java.io.File(dir + "/part=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f).select("id").collect().map(_.getLong(0))
      assert(ids.sameElements(ids.sorted))
    }
  }
}
