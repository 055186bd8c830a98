package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Incremental IVF×PQ: an index grown in arbitrary batches against a
  * frozen model answers searches identically to the one-shot s10
  * query (same constants: 16 cells, m=4, k=16, nprobe=4, top-5).
  */
class IncrementalAnnSpec extends SparkSpec {
  import spark.implicits._

  private val (nCents, pqM, pqK, dim, nprobe, topK, nq) = (16, 4, 16, 64, 4, 5, 8)

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("incann").toString

  private lazy val vecs = Tables.embeddings(spark, sfDir).cache()
  private lazy val queries = vecs.filter($"vec_id" < nq)

  private lazy val oneShot = graft.queries.SimilarityQueries.s10IvfPq
    .run(spark, sfDir).collect().toSet

  test("index grown in three batches == one-shot s10 IVF-PQ search") {
    val dir = freshDir()
    IncrementalAnn.createIndex(vecs, "embedding", "vec_id", dir, nCents, pqM, pqK, dim)
    val ids = vecs.select($"vec_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    IncrementalAnn.appendBatch(
      vecs.filter($"vec_id" <= cuts(0)), "embedding", "vec_id", dir, 0L)
    IncrementalAnn.appendBatch(
      vecs.filter($"vec_id" > cuts(0) && $"vec_id" <= cuts(1)), "embedding", "vec_id", dir, 1L)
    IncrementalAnn.appendBatch(
      vecs.filter($"vec_id" > cuts(1)), "embedding", "vec_id", dir, 2L)
    val got = IncrementalAnn
      .searchTopK(spark, dir, queries, "vec_id", "embedding", nprobe, topK)
      .collect().toSet
    assert(got == oneShot, s"incremental ${got.size} rows vs one-shot ${oneShot.size}")
  }

  test("model is frozen at creation; re-delivery and partial segments are repaired") {
    val dir = freshDir()
    val m0 = IncrementalAnn.createIndex(
      vecs, "embedding", "vec_id", dir, nCents, pqM, pqK, dim)
    // re-creating must NOT refit (identical model back)
    val m1 = IncrementalAnn.createIndex(
      vecs.limit(50), "embedding", "vec_id", dir, nCents, pqM, pqK, dim)
    assert(m0.centroids.map(_.toSeq).toSeq == m1.centroids.map(_.toSeq).toSeq)
    assert(m0.cb.codes.map(_.map(_.toSeq).toSeq).toSeq ==
      m1.cb.codes.map(_.map(_.toSeq).toSeq).toSeq)
    val half = vecs.select(max($"vec_id") / 2).head().getDouble(0)
    val b0 = vecs.filter($"vec_id" <= half)
    val b1 = vecs.filter($"vec_id" > half)
    IncrementalAnn.appendBatch(b0, "embedding", "vec_id", dir, 0L)
    IncrementalAnn.appendBatch(b0, "embedding", "vec_id", dir, 0L) // re-delivery
    // crashed partial segment: a codes dir without _SUCCESS is ignored
    b1.limit(3).select($"vec_id", lit(0L).as("c_id"),
      lit(0).as("code_0"), lit(0).as("code_1"), lit(0).as("code_2"), lit(0).as("code_3"))
      .write.parquet(s"$dir/batch=1/codes")
    new java.io.File(s"$dir/batch=1/codes/_SUCCESS").delete()
    IncrementalAnn.appendBatch(b1, "embedding", "vec_id", dir, 1L) // repair
    val got = IncrementalAnn
      .searchTopK(spark, dir, queries, "vec_id", "embedding", nprobe, topK)
      .collect().toSet
    assert(got == oneShot)
    // no vector appears twice in the accumulated codes
    val codes = spark.read.parquet(s"$dir/batch=0/codes")
      .unionByName(spark.read.parquet(s"$dir/batch=1/codes"))
    assert(codes.select($"vec_id").distinct().count() == codes.count())
  }
}
