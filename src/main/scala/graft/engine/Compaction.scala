package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational cure for long-running ingestion
  * (each micro-batch/partition append leaves files far below the scan-
  * efficient size; a 100 TB table accreted in 10 MB files pays listing +
  * open cost on every query).
  *
  * Sizing is computed from the INPUT bytes on disk: files ≈
  * ceil(inputBytes / targetFileBytes). Input bytes are already compressed,
  * so with the same codec the output lands near the target (re-codec
  * changes the ratio — document the deploy codec). `sortCols` sorts within
  * the new files (clustered layout → better row-group min/max pruning for
  * range predicates on those columns).
  */
object Compaction {

  /** Rewrites `inDir` (parquet) into `outDir` as size-targeted files;
    * returns the file count written. Reads happen once; the only shuffle is
    * the repartition to the target count.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Nil,
      codec: String = "snappy"): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val path = new Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val arranged =
      if (sortCols.isEmpty) df.repartition(nFiles)
      else df.repartition(nFiles)
        .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
    arranged.write.mode("overwrite").option("compression", codec).parquet(outDir)
    nFiles
  }
}
