package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Snapshot (time-travel) reads on the segment stores: immutable
  * segments make the state at any past batch boundary reproducible
  * forever — the property a training run uses to pin its corpus while
  * the store keeps growing. Pinned here on the BM25 face (the cheapest
  * to build): a snapshot equals the store as it WAS, stays bit-stable
  * across later appends, and tombstones PIERCE it — a deleted doc is
  * unservable from every snapshot, because erasure beats time travel.
  */
class SnapshotReadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  private lazy val qt = docs.filter($"doc_id" % 97 === 0)
    .select($"doc_id".as("query_id"),
      explode(graft.functions.exprs.term_freqs($"text").getField("freqs")).as("f"))
    .select($"query_id", $"f.term".as("term"))

  test("a snapshot equals the store as it was, survives later appends, " +
    "and tombstones pierce it") {
    val half = docs.agg(max($"doc_id")).head().getLong(0) / 2
    val b0 = docs.filter($"doc_id" <= half)

    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    IncrementalIndex.appendBatch(b0, "doc_id", "text", dir, 0L)
    val atBatch0 = IncrementalIndex.searchTopK(spark, dir, qt)
      .collect().map(_.toString).toSet

    // grow the store — the snapshot read must not move
    IncrementalIndex.appendBatch(
      docs.filter($"doc_id" > half), "doc_id", "text", dir, 1L)
    val snap = IncrementalIndex.searchTopK(spark, dir, qt, 10, belowBatch = 1L)
      .collect().map(_.toString).toSet
    assert(snap == atBatch0, "snapshot at batch 1 differs from the state as it was")
    val full = IncrementalIndex.searchTopK(spark, dir, qt)
      .collect().map(_.toString).toSet
    assert(full != atBatch0, "the grown store should answer differently")

    // tombstone a batch-0 doc: BOTH the live read and the snapshot
    // must stop serving it
    val victim = b0.agg(max($"doc_id")).head().getLong(0)
    Tombstones.append(spark, dir, 0L, Seq(victim))
    val mirror = java.nio.file.Files.createTempDirectory("snap_mirror").toString
    IncrementalIndex.appendBatch(
      b0.filter($"doc_id" =!= victim), "doc_id", "text", mirror, 0L)
    val want = IncrementalIndex.searchTopK(spark, mirror, qt)
      .collect().map(_.toString).toSet
    val pierced = IncrementalIndex.searchTopK(spark, dir, qt, 10, belowBatch = 1L)
      .collect().map(_.toString).toSet
    assert(pierced == want,
      "tombstone did not pierce the snapshot (erasure must beat time travel)")
  }
}
