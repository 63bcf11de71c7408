package graft.engine

import java.nio.file.Files

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet collapses many small files into size-targeted ones") {
    val in = Files.createTempDirectory("graft-compact-in").toString
    val out = Files.createTempDirectory("graft-compact-out").toString
    (1 to 2000).map(i => (i.toLong, s"payload-$i"))
      .toDF("id", "v").repartition(20)
      .write.mode("overwrite").parquet(in)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) === 20)

    val n = Compaction.compactParquet(spark, in, out,
      targetFileBytes = 1L << 30) // everything fits one file
    assert(n === 1)
    assert(parquetFiles(out) === 1)
    assert(spark.read.parquet(out).count() === 2000)

    // a small target yields multiple files, rows preserved
    val out2 = Files.createTempDirectory("graft-compact-out2").toString
    val n2 = Compaction.compactParquet(spark, in, out2,
      targetFileBytes = 8 * 1024, sortCols = Seq("id"))
    assert(n2 > 1)
    assert(parquetFiles(out2) === n2)
    val back = spark.read.parquet(out2)
    assert(back.count() === 2000)
    assert(back.select("id").distinct().count() === 2000)
  }
}
