package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The incremental graph-ANN face's contract (see the class doc's
  * approximation caveat — graph insertion is approximate by design, so
  * unlike the value-sketch faces the pin is NOT incremental ≡ batch
  * edge-for-edge): determinism, structural validity, append/crash/
  * re-delivery idempotence, and search recall over the incrementally
  * grown graph within noise of the batch-built s19 graph.
  */
class IncrementalGraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private val K = 10
  private val Beam = 2 * K
  private val Hops = 3
  private val NQ = 8

  private def freshDir(): String =
    Files.createTempDirectory("iga_state").toString

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))
  private lazy val n = emb.count()

  /** Bootstrap on ids < n/2, then two appends covering the rest. */
  private def buildIncremental(dir: String): Unit = {
    val half = n / 2
    val q3 = half + (n - half) / 2
    IncrementalGraphAnn.createIndex(
      emb.filter(col("vec_id") < half), dir, K, rounds = 3)
    IncrementalGraphAnn.appendBatch(
      emb.filter(col("vec_id") >= half && col("vec_id") < q3),
      dir, batchId = 1, K, Beam, Hops)
    IncrementalGraphAnn.appendBatch(
      emb.filter(col("vec_id") >= q3), dir, batchId = 2, K, Beam, Hops)
  }

  private def graphRows(dir: String): Set[(Long, Long, Long, Int)] =
    IncrementalGraphAnn.currentGraph(spark, dir, K)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet

  private def searchRecall(dir: String): Double = {
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val exact = vecs.keys.filter(_ < NQ).map { i =>
      i -> vecs.keys.filter(_ != i)
        .flatMap(j => graft.functions.VectorFunctions
          .roundedCosine(vecs(i), vecs(j)).map(c => (j, c)))
        .toSeq.sortBy { case (j, c) => (-c, j) }
        .take(K).map(_._1).toSet
    }.toMap
    val q = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // K + 1 so the query's own node (in-corpus, cos 1.0 once visited)
    // can be dropped without costing a result slot — the same
    // full-beam-then-filter-self accounting the batch comparator uses
    val found = IncrementalGraphAnn
      .searchTopK(spark, dir, q, K + 1, Beam, Hops)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._3).filter(_._2 != id).take(K).map(_._2).toSet
      }
    val per = exact.map { case (id, ex) =>
      ex.intersect(found.getOrElse(id, Set.empty)).size.toDouble / ex.size
    }
    per.sum / per.size
  }

  test("current graph is structurally valid and covers every committed id") {
    val dir = freshDir()
    buildIncremental(dir)
    val g = graphRows(dir)
    val byId = g.groupBy(_._1)
    assert(byId.keySet == (0L until n).toSet, "some committed id has no adjacency")
    byId.foreach { case (id, rows) =>
      assert(rows.size <= K, s"node $id has ${rows.size} out-edges")
      assert(!rows.exists(_._2 == id), s"node $id has a self-edge")
      assert(rows.map(_._4).toSeq.sorted == (1 to rows.size), s"node $id ranks not dense")
    }
  }

  test("edge similarities are the rounded-cosine micro scores of their endpoints") {
    val dir = freshDir()
    buildIncremental(dir)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    graphRows(dir).take(200).foreach { case (id, nbr, sim, _) =>
      val expect = graft.functions.VectorFunctions
        .roundedCosine(vecs(id), vecs(nbr))
        .map(c => math.floor(c * 1000000.0 + 0.5).toLong)
      assert(expect.contains(sim), s"edge ($id,$nbr): stored $sim, expected $expect")
    }
  }

  test("the build is deterministic: two independent builds produce identical graphs") {
    val d1 = freshDir(); val d2 = freshDir()
    buildIncremental(d1); buildIncremental(d2)
    assert(graphRows(d1) == graphRows(d2))
  }

  test("append is idempotent: re-delivered committed batch no-ops; a crashed partial " +
    "segment with WRONG contents is ignored then overwritten by the retry") {
    val d1 = freshDir(); val d2 = freshDir()
    buildIncremental(d1)
    val half = n / 2
    val q3 = half + (n - half) / 2
    IncrementalGraphAnn.createIndex(
      emb.filter(col("vec_id") < half), d2, K, rounds = 3)
    IncrementalGraphAnn.appendBatch(
      emb.filter(col("vec_id") >= half && col("vec_id") < q3),
      d2, batchId = 1, K, Beam, Hops)
    // crash: batch 2 dies mid-write, leaving garbage WITHOUT _SUCCESS
    val crashDir = new java.io.File(s"$d2/batch=2"); crashDir.mkdirs()
    Seq((999999L, 999999L, 0L)).toDF("id", "nbr", "sim_micro")
      .write.mode("overwrite").parquet(s"$d2/batch=2/edges")
    // uncommitted segment is invisible to reads
    assert(!graphRows(d2).exists(_._1 == 999999L))
    // retry overwrites it; re-delivering batch 1 afterwards no-ops
    IncrementalGraphAnn.appendBatch(
      emb.filter(col("vec_id") >= q3), d2, batchId = 2, K, Beam, Hops)
    IncrementalGraphAnn.appendBatch(
      emb.filter(col("vec_id") >= half && col("vec_id") < q3),
      d2, batchId = 1, K, Beam, Hops)
    assert(graphRows(d2) == graphRows(d1))
  }

  test("clashing vec_ids are rejected") {
    val dir = freshDir()
    IncrementalGraphAnn.createIndex(
      emb.filter(col("vec_id") < n / 2), dir, K, rounds = 3)
    assertThrows[IllegalArgumentException] {
      IncrementalGraphAnn.appendBatch(
        emb.filter(col("vec_id") < 3), dir, batchId = 1, K, Beam, Hops)
    }
  }

  test("search recall over the incrementally grown graph is within noise of the " +
    "batch-built s19 graph") {
    val dir = freshDir()
    buildIncremental(dir)
    val inc = searchRecall(dir)
    val batchGraph = NnDescent.knnGraph(emb, "vec_id", "embedding", K, 3)
      .select(col("id"), col("nbr")).localCheckpoint(true)
    val q = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val exact = vecs.keys.filter(_ < NQ).map { i =>
      i -> vecs.keys.filter(_ != i)
        .flatMap(j => graft.functions.VectorFunctions
          .roundedCosine(vecs(i), vecs(j)).map(c => (j, c)))
        .toSeq.sortBy { case (j, c) => (-c, j) }
        .take(K).map(_._1).toSet
    }.toMap
    val foundB = NnDescent.beamSearch(batchGraph, emb, q, Beam, Hops)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._3).filter(_._2 != id).take(K).map(_._2).toSet
      }
    val perB = exact.map { case (id, ex) =>
      ex.intersect(foundB.getOrElse(id, Set.empty)).size.toDouble / ex.size
    }
    val batch = perB.sum / perB.size
    info(s"incremental-graph search recall: $inc; batch s19 graph: $batch")
    // same beam/hops/seeds over either graph; the incremental graph
    // may legitimately differ edge-wise but must stay a working index
    assert(inc >= batch - 0.15, s"incremental recall $inc collapsed vs batch $batch")
    assert(inc >= 0.60, s"incremental recall $inc below absolute floor")
  }

  test("the DISTRIBUTED probe face over the maintained store == the driver face, " +
    "including through tombstones") {
    val dir = freshDir()
    buildIncremental(dir)
    val q = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def rows(df: DataFrame): Set[String] = df.collect().map(_.toString).toSet
    assert(
      rows(IncrementalGraphAnn.searchTopKDistributed(spark, dir, q, K, Beam, Hops)) ==
        rows(IncrementalGraphAnn.searchTopK(spark, dir, q, K, Beam, Hops)),
      "distributed != driver over the committed store")
    // erase a handful of ids: both faces must agree on the store minus
    // the tombstoned rows (deletes pierce the graph and the vectors)
    val victims = IncrementalGraphAnn.searchTopK(spark, dir, q, 3, Beam, Hops)
      .filter(col("node") >= NQ).limit(4)
      .collect().map(_.getLong(1)).distinct.toSeq
    assert(victims.nonEmpty, "fixture degenerate: no victims to tombstone")
    Tombstones.append(spark, dir, 1L, victims)
    val drv = rows(IncrementalGraphAnn.searchTopK(spark, dir, q, K, Beam, Hops))
    val dst = rows(IncrementalGraphAnn.searchTopKDistributed(spark, dir, q, K, Beam, Hops))
    assert(dst == drv, "distributed != driver after tombstones")
    assert(!victims.exists(v => drv.exists(_.contains(s",$v,"))),
      "a tombstoned id survived in search results")
  }

  test("decontaminateBatch fails loudly on non-numeric AND on NULL ids " +
    "instead of collapsing them into one q_id group") {
    val dir = freshDir()
    IncrementalGraphAnn.createIndex(
      emb.filter(col("vec_id") < 64), dir, K, rounds = 1)
    val v = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head.getSeq[Float](0)
    def run(id: String): Unit = IncrementalGraphAnn.decontaminateBatch(
      Seq((id, v)).toDF("doc_id", "embedding"),
      dir, "doc_id", "embedding", K, Beam, Hops, tauMicro = 0L).collect()
    run("7") // numeric-string id: the happy path still works
    for (bad <- Seq("seven", null: String)) {
      val e = intercept[Exception](run(bad))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => String.valueOf(t.getMessage)).mkString(" | ")
      assert(msgs.contains("requires a non-null numeric"),
        s"id=$bad: wrong failure: $msgs")
    }
  }
}
