package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.core.Tables

class CompactionSpec extends SparkSpec {

  test("compaction collapses a many-small-files dataset without losing rows") {
    val inDir = Files.createTempDirectory("graft-smallfiles").toString
    val outDir = Files.createTempDirectory("graft-compacted").toString
    val li = Tables.lineitem(spark, sfDir)
    li.repartition(64).write.mode("overwrite").parquet(inDir) // 64 tiny files
    val inFiles = new java.io.File(inDir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(inFiles >= 32)

    val outFiles = Compaction.compact(spark, inDir, outDir, targetBytesPerFile = 1L << 20)
    assert(outFiles < inFiles / 4, s"expected big reduction, got $outFiles from $inFiles")
    assert(spark.read.parquet(outDir).count() == li.count())
  }
}
