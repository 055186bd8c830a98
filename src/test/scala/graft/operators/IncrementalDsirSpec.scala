package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Incremental DSIR == one-shot [[Dsir.importanceWeights]] over the
  * union of appended batches (the rescoring semantics: weights move
  * as q̂/p̂ absorb new data, and after any sequence of appends the
  * state answers exactly like the batch operator on everything seen),
  * under a 3-way split, committed-id re-delivery, and a crashed
  * partial segment.
  */
class IncrementalDsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 512

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("incdsir").toString

  private lazy val docs = Tables.documents(spark, sfDir)
    .withColumn("is_tgt", $"source".isin("src0", "src1")).cache()

  private def batchWeights(of: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    Dsir.importanceWeights(of, "doc_id", "text", "is_tgt", B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def incWeights(dir: String): Set[(Long, Long, Double)] =
    IncrementalDsir.weights(spark, dir, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("three-way split == one-shot importance weights; mid-state == one-shot prefix") {
    val dir = freshDir()
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    IncrementalDsir.appendBatch(
      docs.filter($"doc_id" <= cuts(0)), "doc_id", "text", "is_tgt", dir, 0L, B)
    IncrementalDsir.appendBatch(
      docs.filter($"doc_id" > cuts(0) && $"doc_id" <= cuts(1)),
      "doc_id", "text", "is_tgt", dir, 1L, B)
    // mid-state: the rescoring semantics — equals one-shot over the
    // PREFIX (models haven't seen batch 2 yet)
    assert(incWeights(dir) == batchWeights(docs.filter($"doc_id" <= cuts(1))),
      "mid-state weights differ from the one-shot prefix")
    IncrementalDsir.appendBatch(
      docs.filter($"doc_id" > cuts(1)), "doc_id", "text", "is_tgt", dir, 2L, B)
    assert(incWeights(dir) == batchWeights(docs),
      "final weights differ from the one-shot union")
  }

  test("re-delivered batch is a no-op; a crashed partial segment is ignored then repaired") {
    val dir = freshDir()
    val half = docs.agg(max($"doc_id")).head().getLong(0) / 2
    val b0 = docs.filter($"doc_id" <= half)
    val b1 = docs.filter($"doc_id" > half)
    IncrementalDsir.appendBatch(b0, "doc_id", "text", "is_tgt", dir, 0L, B)
    val after0 = incWeights(dir)
    // committed-id re-delivery with DIFFERENT contents: no-op
    IncrementalDsir.appendBatch(b1, "doc_id", "text", "is_tgt", dir, 0L, B)
    assert(incWeights(dir) == after0, "committed batch id was not a no-op")
    // crashed partial: census written, no marker -> invisible
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    b1.limit(3).select($"doc_id", lit(0L).as("f"))
      .write.parquet(s"$dir/batch=1/feats")
    assert(incWeights(dir) == after0, "uncommitted partial segment leaked into a read")
    // retry overwrites the garbage and commits
    IncrementalDsir.appendBatch(b1, "doc_id", "text", "is_tgt", dir, 1L, B)
    assert(incWeights(dir) == batchWeights(docs),
      "repaired state differs from the one-shot union")
  }
}
