package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Incremental quantiles: the estimate from merged per-batch bottom-k
  * sample state — under ANY batch split, wholesale re-delivery (same
  * id AND fresh id), and a crashed partial segment — equals the
  * one-shot q54 estimator bit-for-bit, because the sample is a pure
  * function of the (hash, value) SET and merges by union +
  * re-bottom-k (the KMV algebra SampleQuantilesSpec pins).
  */
class IncrementalQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val Ps = Seq(0.25, 0.5, 0.75, 0.9)

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("incq").toString

  private lazy val li = Tables.lineitem(spark, sfDir).cache()

  private def key = concat($"l_orderkey".cast("string"), lit("-"),
    $"l_linenumber".cast("string"))

  private lazy val oneShot = SampleQuantiles
    .estimateFromSample(
      SampleQuantiles.bottomKSample(li, $"l_returnflag", $"l_extendedprice", key),
      Ps, "est_q")
    .collect()
    .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    .toSet

  private def estimateAll(dir: String): Set[(String, Double, Double)] =
    IncrementalQuantiles.estimate(spark, dir, Ps)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet

  private def append(dir: String, batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
    IncrementalQuantiles.appendBatch(
      batch, $"l_returnflag", $"l_extendedprice", key, dir, id)

  test("three-way batch split: merged-state estimate == one-shot q54") {
    val dir = freshDir()
    append(dir, li.filter($"l_orderkey" % 3 === 0), 0L)
    append(dir, li.filter($"l_orderkey" % 3 === 1), 1L)
    append(dir, li.filter($"l_orderkey" % 3 === 2), 2L)
    assert(estimateAll(dir) == oneShot)
  }

  test("re-delivery and overlapping batches cannot move the estimate") {
    val dir = freshDir()
    val b0 = li.filter($"l_orderkey" % 2 === 0)
    val b1 = li.filter($"l_orderkey" % 2 === 1)
    append(dir, b0, 0L)
    append(dir, b1, 1L)
    val first = estimateAll(dir)
    // committed-id re-delivery: write-side no-op
    append(dir, b0, 0L)
    // OVERLAPPING content under a fresh id: the (g, h, v) set-dedup
    // merge makes even a double-delivered batch value-idempotent
    append(dir, b0, 2L)
    assert(estimateAll(dir) == first)
    assert(first == oneShot)
  }

  test("a crashed partial segment is ignored, then repaired by retry") {
    val dir = freshDir()
    val b0 = li.filter($"l_orderkey" % 2 === 0)
    val b1 = li.filter($"l_orderkey" % 2 === 1)
    append(dir, b0, 0L)
    val afterOne = estimateAll(dir)
    // crash mid-write: files land but no _SUCCESS marker
    SampleQuantiles.bottomKSample(b1, $"l_returnflag", $"l_extendedprice", key)
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    new java.io.File(s"$dir/batch=1/_SUCCESS").delete()
    assert(estimateAll(dir) == afterOne, "uncommitted segment must be invisible")
    append(dir, b1, 1L)
    assert(estimateAll(dir) == oneShot)
  }

  test("segment state stays groups x k regardless of batch size") {
    val dir = freshDir()
    append(dir, li, 0L)
    val seg = spark.read.parquet(s"$dir/batch=0")
    val groups = li.select($"l_returnflag").distinct().count()
    assert(seg.count() <= groups * SampleQuantiles.DefaultK,
      "a segment must be sample-sized, not batch-sized")
  }
}
