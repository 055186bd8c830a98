package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Incremental inverted index: search over segments accumulated in
  * ANY doc-atomic batch split — including wholesale re-delivery and a
  * crashed partial write — equals the one-shot s12 query bit-for-bit.
  */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("incidx").toString

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  private lazy val qt = docs.filter($"doc_id" % 97 === 0)
    .select($"doc_id".as("query_id"),
      explode(graft.functions.exprs.term_freqs($"text").getField("freqs")).as("f"))
    .select($"query_id", $"f.term".as("term"))

  private lazy val oneShot = graft.queries.SimilarityQueries.s12Bm25
    .run(spark, sfDir).collect().toSet

  private def assertEqualsOneShot(indexDir: String): Unit = {
    val got = IncrementalIndex.searchTopK(spark, indexDir, qt).collect().toSet
    assert(got == oneShot, s"incremental ${got.size} rows vs one-shot ${oneShot.size}")
  }

  test("three-way batch split == one-shot s12") {
    val dir = freshDir()
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    IncrementalIndex.appendBatch(
      docs.filter($"doc_id" <= cuts(0)), "doc_id", "text", dir, 0L)
    IncrementalIndex.appendBatch(
      docs.filter($"doc_id" > cuts(0) && $"doc_id" <= cuts(1)), "doc_id", "text", dir, 1L)
    IncrementalIndex.appendBatch(
      docs.filter($"doc_id" > cuts(1)), "doc_id", "text", dir, 2L)
    assertEqualsOneShot(dir)
  }

  test("re-delivered batch is a no-op; a crashed partial segment is ignored then repaired") {
    val dir = freshDir()
    val half = docs.select(max($"doc_id") / 2).head().getDouble(0)
    val b0 = docs.filter($"doc_id" <= half)
    val b1 = docs.filter($"doc_id" > half)
    IncrementalIndex.appendBatch(b0, "doc_id", "text", dir, 0L)
    // wholesale re-delivery of a committed batch: no duplicate postings
    IncrementalIndex.appendBatch(b0, "doc_id", "text", dir, 0L)
    // crash mid-write: docs part landed, postings did not -> segment
    // uncommitted, load() must ignore it
    b1.select($"doc_id", graft.functions.exprs.term_freqs($"text").getField("dl").as("dl"))
      .write.mode("overwrite").parquet(s"$dir/batch=1/docs")
    val (dAfterCrash, _) = IncrementalIndex.load(spark, dir)
    assert(dAfterCrash.count() == b0.count())
    // the retry repairs the partial segment
    IncrementalIndex.appendBatch(b1, "doc_id", "text", dir, 1L)
    val (dAll, pAll) = IncrementalIndex.load(spark, dir)
    assert(dAll.count() == docs.count())
    assert(pAll.select($"doc_id", $"term").distinct().count() == pAll.count())
    assertEqualsOneShot(dir)
  }

  test("empty index loads empty frames; zero-token docs still count in stats") {
    val dir = freshDir()
    val (d0, p0) = IncrementalIndex.load(spark, dir)
    assert(d0.count() == 0 && p0.count() == 0)
    // a whitespace-only doc contributes dl=0 to docs but no postings —
    // n_docs must still include it (s12 counts every corpus doc)
    Seq((1L, "alpha beta"), (2L, "   \t  ")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"${dir}_src/documents.parquet")
    val src = spark.read.parquet(s"${dir}_src/documents.parquet")
    IncrementalIndex.appendBatch(src, "doc_id", "text", dir, 0L)
    val (d, p) = IncrementalIndex.load(spark, dir)
    assert(d.count() == 2 && p.count() == 2) // alpha, beta postings only
    assert(d.filter($"dl" === 0).count() == 1)
  }
}
