package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.queries.Registry

/** The incremental manifest's accumulated state answers exactly like
  * one-shot pipe02 on the union — under an id-ordered 3-way split and
  * wholesale re-delivery of a committed batch (the
  * IncrementalHygieneLadder delivery template, extended to the
  * downstream stages). The comparison target is the REGISTRY's pipe02
  * frame itself, so the equivalence is against exactly what the
  * oracle gate hashes — including the read-time cluster re-derivation
  * (clusters cannot be incremental edge state: the span stage's
  * verdict depends on future docs, so kept membership is only final
  * at read).
  */
class IncrementalManifestSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("incman").toString

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val norm = graft.functions.exprs.normalize_text($"text")
  private lazy val bench = docs.filter($"doc_id" % 37 === 0)
    .select($"doc_id", norm.as("text")).cache()
  private lazy val corp = docs.filter($"doc_id" % 37 =!= 0)
    .select($"doc_id", norm.as("text"), $"source").cache()

  private def canon(df: DataFrame): Set[Seq[String]] =
    df.collect().map((r: Row) =>
      (0 until r.length).map(i => String.valueOf(r.get(i)))).toSet

  private lazy val oneShot: Set[Seq[String]] =
    canon(Registry.byName("pipe02_manifest").run(spark, sfDir))

  private def man(dir: String): Set[Seq[String]] =
    canon(IncrementalManifest.manifest(spark, dir, "doc_id"))

  private def ingest(dir: String, batch: DataFrame, id: Long): Unit =
    IncrementalManifest.processBatch(
      batch, bench, "doc_id", "text", "source", dir, id)

  private lazy val (b0, b1, b2) = {
    val ids = corp.select($"doc_id").orderBy($"doc_id").collect().map(_.getLong(0))
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    (corp.filter($"doc_id" <= c1),
      corp.filter($"doc_id" > c1 && $"doc_id" <= c2),
      corp.filter($"doc_id" > c2))
  }

  test("3-way id-ordered split: accumulated manifest == one-shot pipe02") {
    val dir = freshDir()
    ingest(dir, b0, 0L)
    ingest(dir, b1, 1L)
    ingest(dir, b2, 2L)
    val got = man(dir)
    assert(got == oneShot,
      s"diverges: only-inc ${got.diff(oneShot).take(3)}, only-oneshot ${oneShot.diff(got).take(3)}")
    // non-vacuity: the downstream stages really fired
    val m = IncrementalManifest.manifest(spark, dir, "doc_id")
    assert(m.filter($"split" === "train" && $"selected").count() > 0)
    assert(m.filter($"bin_id".isNotNull).count() > 0)
  }

  test("re-delivery of a committed batch is a no-op on the manifest") {
    val dir = freshDir()
    ingest(dir, b0, 0L)
    ingest(dir, b1, 1L)
    val mid = man(dir)
    ingest(dir, b0, 0L) // at-least-once retry, out of order
    assert(man(dir) == mid)
    ingest(dir, b2, 2L)
    assert(man(dir) == oneShot)
  }

  test("crash between the ladder commit and the meta commit repairs on retry") {
    val dir = freshDir()
    ingest(dir, b0, 0L)
    ingest(dir, b1, 1L)
    // crash window: batch 1's ladder segments are committed but its
    // meta segment lost its marker (and carries WRONG partial
    // contents — the retry must overwrite, not trust it)
    val metaSeg = new java.io.File(s"$dir/meta/batch=1")
    assert(metaSeg.isDirectory, "fixture: meta segment missing entirely")
    b1.limit(1).select($"doc_id", $"source",
        lit(0L).as("tok"), lit(0L).as("mh_0"))
      .write.mode("overwrite").parquet(metaSeg.toString)
    new java.io.File(metaSeg, "_SUCCESS").delete()
    // a read INSIDE the window must fail loudly with the missing batch
    // id (ADVICE r16) — not hand the batch's kept docs NULL
    // split/tok/cluster_id in silence
    val e = intercept[IllegalArgumentException](
      IncrementalManifest.manifest(spark, dir, "doc_id").collect())
    assert(e.getMessage.contains("[1]") &&
      e.getMessage.contains("no committed meta segment"))
    // uncommitted garbage is invisible to reads and repaired by retry
    ingest(dir, b1, 1L)
    ingest(dir, b2, 2L)
    assert(man(dir) == oneShot)
  }

  test("maintenance: append loop crosses a compaction, manifest() unchanged") {
    val dir = freshDir()
    val cfg = StorePolicy.Config(maxSegments = 1)
    ingest(dir, b0, 0L)
    ingest(dir, b1, 1L)
    val mid = man(dir)
    // 2 committed segments per sub-store > maxSegments=1 → Compact,
    // applied to ALL five sub-stores under one atomic root swap
    assert(IncrementalManifest.maintain(spark, dir, cfg) == StorePolicy.Compact)
    for (p <- Seq("exact", "near", "spans", "verdicts", "meta")) {
      val segs = new java.io.File(s"$dir/$p").listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName).toSeq
      assert(segs == Seq("batch=0"), s"$p not folded: $segs")
    }
    assert(man(dir) == mid, "compaction must be read-identity")
    // the store keeps serving appends after the swap (fresh id — the
    // no-pre-swap-id-re-delivery contract), closing the loop end to end
    assert(IncrementalManifest.processBatchAndMaintain(
      b2, bench, "doc_id", "text", "source", dir, 2L, cfg = cfg) ==
      StorePolicy.Compact)
    assert(man(dir) == oneShot)
    // quiescent store with default thresholds: nothing to do
    assert(IncrementalManifest.maintain(spark, dir) == StorePolicy.NoOp)
  }

  test("maintenance swap crash windows re-converge (resume and rollback)") {
    val dir = freshDir()
    ingest(dir, b0, 0L)
    ingest(dir, b1, 1L)
    val mid = man(dir)
    val (live, work, old) =
      (new java.io.File(dir), new java.io.File(dir + ".maint"), new java.io.File(dir + ".old"))
    // window 1 — crash BETWEEN the two renames: live dir absent, .old
    // holds the pre-swap store, .maint is root-committed. Recovery at
    // the next maintain entry must resume the swap (keep .maint).
    assert(live.renameTo(work))
    new java.io.File(work, "_SUCCESS").createNewFile()
    assert(old.mkdirs()) // stale pre-swap leftovers
    IncrementalManifest.maintain(spark, dir)
    assert(live.isDirectory && !work.exists() && !old.exists())
    assert(man(dir) == mid)
    // window 2 — crash DURING the copy: live store intact, .maint
    // uncommitted junk, no .old. Recovery deletes the junk; the store
    // answers unchanged.
    assert(work.mkdirs())
    new java.io.File(work, "junk").createNewFile()
    IncrementalManifest.maintain(spark, dir)
    assert(!work.exists())
    assert(man(dir) == mid)
    // window 3 — rollback: live dir absent, .maint NOT root-committed,
    // .old holds the real store. Recovery must restore .old.
    assert(live.renameTo(old))
    assert(work.mkdirs())
    IncrementalManifest.maintain(spark, dir)
    assert(live.isDirectory && !old.exists())
    assert(man(dir) == mid)
  }

  test("first-batch crash window: maintain refuses to compact orphan verdicts " +
    "even when meta is entirely empty") {
    val dir = freshDir()
    ingest(dir, b0, 0L)
    ingest(dir, b1, 1L)
    val mid = man(dir)
    // crash window at the very start of the store's life: EVERY meta
    // commit is lost, so meta has no committed segment at all. The
    // guard must still fire (gate on verdicts having segments, not
    // meta — ADVICE r17): an aggressive maintain that skipped it would
    // renumber the orphan verdicts to batch 0, destroying the
    // re-delivery repair path (re-delivered docs screen as exact dups
    // under the fresh-id contract) and leaving manifest()'s subset
    // check permanently failing with an unrepairable batch 0.
    for (b <- Seq(0, 1))
      assert(new java.io.File(s"$dir/meta/batch=$b/_SUCCESS").delete())
    val e = intercept[IllegalArgumentException](
      IncrementalManifest.maintain(spark, dir, StorePolicy.Config(maxSegments = 1)))
    assert(e.getMessage.contains("[0, 1]") &&
      e.getMessage.contains("no committed meta segment"))
    // no swap started (the guard fires before any copy) and the
    // documented repair — re-deliver the batches — still works
    assert(!new java.io.File(dir + ".maint").exists())
    ingest(dir, b0, 0L)
    ingest(dir, b1, 1L)
    assert(man(dir) == mid)
  }
}
