package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Streaming cluster maintenance == one-shot d06, under any batch
  * split, re-delivery, and crash repair.
  */
class IncrementalClustersSpec extends SparkSpec {
  import spark.implicits._

  private def oneShot(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val pairs = TextDedup.minhashCandidates(d, "doc_id", "text")
      .filter($"est_sim" >= 0.5)
      .select($"doc_a", $"doc_b")
    NearDupClusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def clustersOf(stateDir: String): Set[(Long, Long)] =
    IncrementalClusters.clusters(spark, stateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("3-way id-range split of the real corpus reproduces one-shot d06 clusters") {
    val d = graft.core.Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val expected = oneShot(d)
    assert(expected.nonEmpty, "fixture corpus must contain near-dup clusters")
    val stateDir = Files.createTempDirectory("graft-incclu").toString + "/state"
    val n = d.count()
    Seq(
      d.filter($"doc_id" < n / 3),
      d.filter($"doc_id" >= n / 3 && $"doc_id" < 2 * n / 3),
      d.filter($"doc_id" >= 2 * n / 3)
    ).foreach(b => IncrementalClusters.appendBatch(b, "doc_id", "text", stateDir))
    assert(clustersOf(stateDir) == expected)
  }

  /** Near-dup families split so a LOWER id arrives AFTER a higher one
    * — the case IncrementalDedup's asymmetric join cannot cover and
    * this operator's both-directions join must.
    */
  private val families: Seq[(Long, String)] = {
    def fam(p: String, tail: String) =
      ((1 to 40).map(i => s"$p$i") :+ tail).mkString(" ")
    Seq(
      1L -> fam("w", "w40"), 5L -> fam("w", "wX"), 9L -> fam("w", "wY"),
      2L -> fam("z", "z40"), 7L -> fam("z", "zQ"),
      3L -> fam("y", "y40"))
  }

  test("NON-id-ordered batches accumulate the same clusters (order independence)") {
    val d = families.toDF("doc_id", "text")
    val expected = oneShot(d)
    assert(expected.map(_._1) == Set(1L, 5L, 9L, 2L, 7L),
      s"families fixture must cluster as planted, got $expected")
    // higher ids first, then the low-id members that bridge them
    for (split <- Seq(
        Seq(Seq(9L, 7L), Seq(5L, 3L), Seq(1L, 2L)),
        Seq(Seq(5L), Seq(9L, 2L), Seq(1L, 7L, 3L)))) {
      val stateDir = Files.createTempDirectory("graft-incclu").toString + "/state"
      split.foreach { ids =>
        val b = families.filter(f => ids.contains(f._1)).toDF("doc_id", "text")
        IncrementalClusters.appendBatch(b, "doc_id", "text", stateDir)
      }
      assert(clustersOf(stateDir) == expected, s"split $split diverged")
    }
  }

  test("re-delivered batch (same batchId) is a no-op; crashed partial is ignored then repaired") {
    val d = families.toDF("doc_id", "text")
    val stateDir = Files.createTempDirectory("graft-incclu").toString + "/state"
    val b0 = families.filter(_._1 <= 3).toDF("doc_id", "text")
    val b1 = families.filter(f => f._1 > 3 && f._1 <= 7).toDF("doc_id", "text")
    IncrementalClusters.appendBatch(b0, "doc_id", "text", stateDir, batchId = Some(0L))
    IncrementalClusters.appendBatch(b1, "doc_id", "text", stateDir, batchId = Some(1L))
    val before = clustersOf(stateDir)
    // wholesale re-delivery of batch 1: state must not change
    IncrementalClusters.appendBatch(b1, "doc_id", "text", stateDir, batchId = Some(1L))
    assert(clustersOf(stateDir) == before)
    // crash mid-batch-2: sigs written, edges missing -> uncommitted,
    // invisible to clusters()
    val b2 = families.filter(_._1 > 7).toDF("doc_id", "text")
    val seg = new org.apache.hadoop.fs.Path(stateDir, "batch=2")
    TextDedup.minhashSignatures(b2, "doc_id", "text")
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(seg, "sigs").toString)
    assert(clustersOf(stateDir) == before, "partial batch leaked into state")
    // the foreachBatch retry repairs it and lands the full corpus
    IncrementalClusters.appendBatch(b2, "doc_id", "text", stateDir, batchId = Some(2L))
    assert(clustersOf(stateDir) == oneShot(d))
  }

  test("empty state yields an empty, well-typed cluster frame") {
    val stateDir = Files.createTempDirectory("graft-incclu").toString + "/state"
    val c = IncrementalClusters.clusters(spark, stateDir)
    assert(c.columns.toSeq == Seq("doc_id", "comp"))
    assert(c.isEmpty)
  }
}
