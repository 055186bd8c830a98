package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction: rewrite a parquet dataset into files sized
  * for scan efficiency. Streaming sinks and over-parallel writers leave
  * thousands of KB-sized files; at 100 TB that turns every scan into a
  * metadata storm (one task + one open per tiny file). Compaction reads
  * the dataset, computes the partition count from actual input bytes,
  * and rewrites with `coalesce`-free repartitioning (repartition, not
  * coalesce, so the write parallelism is real and rows re-balance).
  */
object Compaction {

  /** @param partitionCols hive-partition columns to PRESERVE in the
    *   rewritten layout — required when compacting a partitioned
    *   dataset (e.g. a streaming sink's date=.../ dirs), otherwise the
    *   rewrite would flatten the directories and lose partition pruning
    * @return number of output files written
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytesPerFile: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Seq.empty): Int = {
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inputBytes = fs.getContentSummary(hPath).getLength
    val nParts = math.max(1, math.ceil(inputBytes.toDouble / targetBytesPerFile).toInt)
    val writer = spark.read.parquet(inPath)
      .repartition(nParts)
      .write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(outPath)
    val outFs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    outFs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
