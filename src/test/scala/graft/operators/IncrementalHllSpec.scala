package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Incremental HLL: the estimate from max-merged per-batch register
  * state — under ANY batch split, wholesale re-delivery, and a crashed
  * partial segment — equals the one-shot q53 estimator bit-for-bit,
  * because registers are a pure function of the value set and merge by
  * max (the union algebra HllSketchSpec pins).
  */
class IncrementalHllSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("inchll").toString

  private lazy val events = Tables.events(spark, sfDir).cache()

  private lazy val oneShot = HllSketch
    .estimateFromRegisters(
      HllSketch.registers(events, "event_type", "user_id"), "event_type")
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    .toSet

  private def estimateAll(dir: String): Set[(String, Long, Double, Double)] =
    IncrementalHll.estimate(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet

  test("three-way batch split: merged-state estimate == one-shot q53") {
    val dir = freshDir()
    IncrementalHll.appendBatch(
      events.filter($"event_id" % 3 === 0), "event_type", "user_id", dir, 0L)
    IncrementalHll.appendBatch(
      events.filter($"event_id" % 3 === 1), "event_type", "user_id", dir, 1L)
    IncrementalHll.appendBatch(
      events.filter($"event_id" % 3 === 2), "event_type", "user_id", dir, 2L)
    assert(estimateAll(dir) == oneShot)
  }

  test("re-delivery and overlapping batches cannot move the estimate") {
    val dir = freshDir()
    val b0 = events.filter($"event_id" % 2 === 0)
    val b1 = events.filter($"event_id" % 2 === 1)
    IncrementalHll.appendBatch(b0, "event_type", "user_id", dir, 0L)
    IncrementalHll.appendBatch(b1, "event_type", "user_id", dir, 1L)
    val first = estimateAll(dir)
    // committed-id re-delivery: write-side no-op
    IncrementalHll.appendBatch(b0, "event_type", "user_id", dir, 0L)
    // OVERLAPPING content under a fresh id: max-merge makes even a
    // double-counted batch value-idempotent — the sketch property
    IncrementalHll.appendBatch(b0, "event_type", "user_id", dir, 2L)
    assert(estimateAll(dir) == first)
    assert(first == oneShot)
  }

  test("a crashed partial segment is ignored, then repaired by retry") {
    val dir = freshDir()
    val b0 = events.filter($"event_id" % 2 === 0)
    val b1 = events.filter($"event_id" % 2 === 1)
    IncrementalHll.appendBatch(b0, "event_type", "user_id", dir, 0L)
    val afterOne = estimateAll(dir)
    // crash mid-write: files land but no _SUCCESS marker
    HllSketch.registers(b1, "event_type", "user_id")
      .withColumnRenamed("event_type", "g")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    new java.io.File(s"$dir/batch=1/_SUCCESS").delete()
    assert(estimateAll(dir) == afterOne, "uncommitted segment must be invisible")
    IncrementalHll.appendBatch(b1, "event_type", "user_id", dir, 1L)
    assert(estimateAll(dir) == oneShot)
  }
}
