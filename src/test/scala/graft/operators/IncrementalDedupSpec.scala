package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  /** Two near-dup families (w*, z*) plus two singletons; ids chosen so
    * every batch split below separates at least one family across
    * batches (the cross-batch state path) and doc 4 is near a doc (2)
    * that was itself dropped (the drop-against-dropped greedy rule).
    */
  private val corpus: Seq[(Long, String)] = {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near1 = ((1 to 39).map(i => s"w$i") :+ "wX").mkString(" ")
    val near2 = ((1 to 39).map(i => s"w$i") :+ "wY").mkString(" ")
    val farA = (1 to 40).map(i => s"z$i").mkString(" ")
    val farNear = ((1 to 39).map(i => s"z$i") :+ "zQ").mkString(" ")
    val other = (1 to 40).map(i => s"y$i").mkString(" ")
    Seq(1L -> base, 2L -> near1, 3L -> farA, 4L -> near2,
      5L -> farNear, 6L -> other)
  }

  private def expectedSurvivors: Seq[Long] =
    TextDedup.dropNearDuplicates(docs(corpus), "doc_id", "text", threshold = 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq

  test("id-ordered batch splits reproduce the one-shot batch dedup exactly") {
    for (splits <- Seq(Seq(2L, 4L), Seq(1L, 3L, 5L))) {
      val stateDir =
        Files.createTempDirectory("graft-incdedup").toString + "/state"
      val batches = (Seq(0L) ++ splits ++ Seq(Long.MaxValue))
        .sliding(2).toSeq
        .map { case Seq(lo, hi) => corpus.filter(c => c._1 > lo && c._1 <= hi) }
        .filter(_.nonEmpty)
      val got = batches.flatMap(b =>
        IncrementalDedup
          .processBatch(docs(b), "doc_id", "text", stateDir, threshold = 0.5)
          .collect().map(_.getLong(0))).sorted
      assert(got == expectedSurvivors,
        s"split at $splits diverged: got $got, expected $expectedSurvivors")
    }
  }

  test("a doc near an already-DROPPED doc is still dropped (greedy policy)") {
    val stateDir =
      Files.createTempDirectory("graft-incdedup").toString + "/state"
    // batch 1: base + its near-dup (2 dropped); batch 2: another near-dup
    IncrementalDedup.processBatch(
      docs(corpus.filter(_._1 <= 2)), "doc_id", "text", stateDir, 0.5)
    val b2 = IncrementalDedup.processBatch(
      docs(corpus.filter(_._1 == 4)), "doc_id", "text", stateDir, 0.5)
    assert(b2.isEmpty, "doc 4 near-duplicates SEEN doc 1/2 and must be dropped")
  }

  test("a retried micro-batch (same batchId) is idempotent: no state growth, same survivors") {
    val stateDir =
      Files.createTempDirectory("graft-incdedup").toString + "/state"
    val b1 = corpus.filter(_._1 <= 2)
    val b2 = corpus.filter(c => c._1 > 2 && c._1 <= 4)
    val s1 = IncrementalDedup
      .processBatch(docs(b1), "doc_id", "text", stateDir, 0.5, Some(0L))
      .collect().map(_.getLong(0)).toSeq
    val s2 = IncrementalDedup
      .processBatch(docs(b2), "doc_id", "text", stateDir, 0.5, Some(1L))
      .collect().map(_.getLong(0)).toSeq
    def stateRows: Long =
      spark.read.parquet(s"$stateDir/batch=0", s"$stateDir/batch=1").count()
    val rowsBefore = stateRows
    // at-least-once redelivery: foreachBatch re-runs the SAME batch id
    val retried = IncrementalDedup
      .processBatch(docs(b2), "doc_id", "text", stateDir, 0.5, Some(1L))
      .collect().map(_.getLong(0)).toSeq
    assert(retried.sorted == s2.sorted, "retry must return identical survivors")
    assert(stateRows == rowsBefore, "retry must not re-append signatures")
    // downstream batches judge against a single copy of the state
    val s3 = IncrementalDedup
      .processBatch(docs(corpus.filter(_._1 > 4)), "doc_id", "text",
        stateDir, 0.5, Some(2L))
      .collect().map(_.getLong(0)).toSeq
    assert((s1 ++ s2 ++ s3).sorted == expectedSurvivors,
      "post-retry stream must still equal the one-shot batch result")
  }

  test("a crashed partial state write (no _SUCCESS) is repaired on retry") {
    val stateDir =
      Files.createTempDirectory("graft-incdedup").toString + "/state"
    IncrementalDedup.processBatch(
      docs(corpus.filter(_._1 <= 2)), "doc_id", "text", stateDir, 0.5, Some(0L))
    // simulate a crash mid-write of batch 1: a partial parquet file
    // lands in the batch dir but _SUCCESS never does
    val partial = new java.io.File(s"$stateDir/batch=1")
    partial.mkdirs()
    val src = new java.io.File(s"$stateDir/batch=0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(src.toPath,
      java.nio.file.Paths.get(s"$stateDir/batch=1/part-partial.parquet"))

    val b2 = corpus.filter(c => c._1 > 2 && c._1 <= 4)
    val survivors = IncrementalDedup
      .processBatch(docs(b2), "doc_id", "text", stateDir, 0.5, Some(1L))
      .collect().map(_.getLong(0)).toSeq

    // reference: same batches against a clean state dir
    val cleanDir =
      Files.createTempDirectory("graft-incdedup").toString + "/state"
    IncrementalDedup.processBatch(
      docs(corpus.filter(_._1 <= 2)), "doc_id", "text", cleanDir, 0.5, Some(0L))
    val expected = IncrementalDedup
      .processBatch(docs(b2), "doc_id", "text", cleanDir, 0.5, Some(1L))
      .collect().map(_.getLong(0)).toSeq
    assert(survivors.sorted == expected.sorted,
      "partial uncommitted state must not leak into the screen")
    assert(new java.io.File(s"$stateDir/batch=1/_SUCCESS").exists(),
      "retry must commit the batch (overwriting the partial write)")
    assert(!new java.io.File(s"$stateDir/batch=1/part-partial.parquet").exists(),
      "overwrite must replace the crashed partial file")
  }

  test("streaming wiring: foreachBatch screens each micro-batch against state") {
    val inDir = Files.createTempDirectory("graft-incdedup-in").toString
    val stateDir =
      Files.createTempDirectory("graft-incdedup").toString + "/state"
    val survivors = scala.collection.mutable.ArrayBuffer.empty[Long]

    val b1 = corpus.filter(_._1 <= 3)
    docs(b1).write.mode("append").parquet(inDir)
    val streamIn = spark.readStream.schema(docs(b1).schema).parquet(inDir)
    val q = IncrementalDedup
      .attach(streamIn, "doc_id", "text", stateDir, threshold = 0.5) {
        (surv, _) => survivors ++= surv.collect().map(_.getLong(0))
      }
      .start()
    q.processAllAvailable()
    docs(corpus.filter(_._1 > 3)).write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()

    assert(survivors.sorted.toSeq == expectedSurvivors,
      s"streamed survivors ${survivors.sorted} != batch $expectedSurvivors")
  }
}
