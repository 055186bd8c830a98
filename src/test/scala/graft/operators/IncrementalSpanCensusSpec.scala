package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Incremental span census: scrubbing committed batches against the
  * accumulated census — under ANY doc-atomic split, wholesale
  * re-delivery, and a crashed partial segment — equals the one-shot
  * t23 scrub bit-for-bit, because both run SpanDedup.scrubCore and
  * differ only in where the duplicated-hash set comes from.
  */
class IncrementalSpanCensusSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("incspan").toString

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  private lazy val oneShot = SpanDedup.scrubSpans(docs, "doc_id", "text")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet

  private def scrubAll(dir: String): Set[(Long, Long, Long, String)] =
    IncrementalSpanCensus.scrubAgainst(docs, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet

  test("three-way batch split: scrub against accumulated census == one-shot t23") {
    val dir = freshDir()
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    IncrementalSpanCensus.appendBatch(
      docs.filter($"doc_id" <= cuts(0)), "doc_id", "text", dir, 0L)
    IncrementalSpanCensus.appendBatch(
      docs.filter($"doc_id" > cuts(0) && $"doc_id" <= cuts(1)), "doc_id", "text", dir, 1L)
    IncrementalSpanCensus.appendBatch(
      docs.filter($"doc_id" > cuts(1)), "doc_id", "text", dir, 2L)
    assert(scrubAll(dir) == oneShot)
  }

  test("re-delivery is a no-op; a crashed partial segment is ignored then repaired") {
    val dir = freshDir()
    val half = docs.select(max($"doc_id") / 2).head().getDouble(0)
    val b0 = docs.filter($"doc_id" <= half)
    val b1 = docs.filter($"doc_id" > half)
    IncrementalSpanCensus.appendBatch(b0, "doc_id", "text", dir, 0L)
    val afterOnce = IncrementalSpanCensus.load(spark, dir)
      .agg(sum($"nd")).head().getLong(0)
    // wholesale re-delivery of a committed batch: census unchanged
    IncrementalSpanCensus.appendBatch(b0, "doc_id", "text", dir, 0L)
    assert(IncrementalSpanCensus.load(spark, dir)
      .agg(sum($"nd")).head().getLong(0) == afterOnce)
    // crash mid-write: parquet files land but no _SUCCESS marker ->
    // uncommitted, load() must ignore the segment entirely
    SpanDedup.docSpanHashes(b1, "doc_id", "text", 5)
      .groupBy($"h").agg(count(lit(1)).as("nd"))
      .write.mode("overwrite").parquet(s"$dir/batch=1/census")
    new java.io.File(s"$dir/batch=1/census/_SUCCESS").delete()
    assert(IncrementalSpanCensus.load(spark, dir)
      .agg(sum($"nd")).head().getLong(0) == afterOnce)
    // retry repairs the partial segment; the full census now matches
    IncrementalSpanCensus.appendBatch(b1, "doc_id", "text", dir, 1L)
    assert(scrubAll(dir) == oneShot)
  }

  test("dropSpanDuplicatedAgainst == one-shot dropSpanDuplicated on the union corpus") {
    val dir = freshDir()
    val half = docs.select(max($"doc_id") / 2).head().getDouble(0)
    IncrementalSpanCensus.appendBatch(
      docs.filter($"doc_id" <= half), "doc_id", "text", dir, 0L)
    IncrementalSpanCensus.appendBatch(
      docs.filter($"doc_id" > half), "doc_id", "text", dir, 1L)
    val inc = IncrementalSpanCensus
      .dropSpanDuplicatedAgainst(docs, "doc_id", "text", dir, maxDupFrac = 0.3)
      .select($"doc_id").as[Long].collect().toSet
    val one = SpanDedup.dropSpanDuplicated(docs, "doc_id", "text", maxDupFrac = 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(inc == one, s"incremental kept ${inc.size}, one-shot kept ${one.size}")
  }
}
