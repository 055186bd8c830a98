package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The r16 closed loop on the two segment stores with real serving
  * reads: BM25 (IncrementalIndex, per-part commit markers) and IVF×PQ
  * (IncrementalAnn, cell-partitioned codes + store-level frozen
  * model). What the generic [[StorePolicy.Layout]] hook must get
  * right beyond the flat-store scenarios StorePolicySpec already
  * pins:
  *
  *  - the policy SEES these stores' segments at all (their commit
  *    marker is a part's parquet `_SUCCESS`, not a segment-level one);
  *  - reads are identical across the swap (search results, not just
  *    row unions);
  *  - vacuum physically drops tombstoned rows AND frees the ids;
  *  - the maintained copy preserves IncrementalAnn's `c_id=` physical
  *    partitioning (the probe path's pruning) and carries the frozen
  *    `model/` dir through the swap;
  *  - crash recovery converges for a per-part-marker store too.
  */
class StoreMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  // tiny thresholds so a 4-batch loop crosses them; ratio disabled so
  // the firing signal is deterministic per test
  private val cfg = StorePolicy.Config(
    maxSegments = 3, smallFileRatio = 1.1, vacuumTombstoneBytes = 64L * 1024 * 1024)

  private lazy val docs = Tables.documents(spark, sfDir).cache()
  private lazy val vecs = Tables.embeddings(spark, sfDir).cache()

  private lazy val qt = docs.filter($"doc_id" % 97 === 0)
    .select($"doc_id".as("query_id"),
      explode(graft.functions.exprs.term_freqs($"text").getField("freqs")).as("f"))
    .select($"query_id", $"f.term".as("term"))

  private def idxSearch(dir: String): Set[org.apache.spark.sql.Row] =
    IncrementalIndex.searchTopK(spark, dir, qt).collect().toSet

  private def quarters(ids: Seq[Long]): Seq[(Long, Long)] = {
    val qs = Seq(0, 1, 2, 3).map(i => ids(i * ids.length / 4))
    Seq((Long.MinValue, qs(1)), (qs(1), qs(2)), (qs(2), qs(3)), (qs(3), Long.MaxValue))
  }

  test("BM25 store: the append loop compacts itself and search never changes") {
    val dir = freshDir("maint-idx")
    val ids = docs.select($"doc_id").as[Long].collect().sorted.toSeq
    val actions = quarters(ids).zipWithIndex.map { case ((lo, hi), i) =>
      IncrementalIndex.appendAndMaintain(
        docs.filter($"doc_id" > lo && $"doc_id" <= hi),
        "doc_id", "text", dir, i.toLong, cfg)
    }
    // batches 0-2 stay under maxSegments = 3; batch 3 crosses (4 > 3)
    assert(actions == Seq(
      StorePolicy.NoOp, StorePolicy.NoOp, StorePolicy.NoOp, StorePolicy.Compact),
      s"got $actions")
    // the folded store is ONE committed segment under BOTH conventions
    assert(StorePolicy.statsOf(spark, dir, cfg, IncrementalIndex.layout)
      .committedSegments == 1)
    assert(fs.exists(new Path(dir, "batch=0/postings/_SUCCESS")) &&
      fs.exists(new Path(dir, "batch=0/docs/_SUCCESS")))
    // and search over it equals the one-shot s12 query on the corpus
    val oneShot = graft.queries.SimilarityQueries.s12Bm25
      .run(spark, sfDir).collect().toSet
    assert(idxSearch(dir) == oneShot, "compacted index broke BM25 parity")
  }

  test("BM25 store: tombstone pressure vacuums; reads hold; the id is FREED") {
    val dir = freshDir("maint-idx-vac")
    val half = docs.select(max($"doc_id") / 2).head().getDouble(0)
    IncrementalIndex.appendAndMaintain(
      docs.filter($"doc_id" <= half), "doc_id", "text", dir, 0L, cfg)
    IncrementalIndex.appendAndMaintain(
      docs.filter($"doc_id" > half), "doc_id", "text", dir, 1L, cfg)
    val victim = docs.agg(min($"doc_id")).head().getLong(0)
    Tombstones.append(spark, dir, 0L, Seq(victim))
    val filtered = idxSearch(dir) // tombstone-filtered read, pre-vacuum
    assert(!filtered.exists(_.getLong(2) == victim),
      "tombstoned doc must not be served")
    // any tombstone bytes cross a 1-byte threshold -> the NEXT append
    // (here an empty drain batch) vacuums as a side effect
    val vacCfg = cfg.copy(vacuumTombstoneBytes = 1L)
    val a = IncrementalIndex.appendAndMaintain(
      docs.filter(lit(false)), "doc_id", "text", dir, 2L, vacCfg)
    assert(a == StorePolicy.Vacuum, s"got $a")
    assert(idxSearch(dir) == filtered, "vacuum changed the served search")
    assert(StorePolicy.statsOf(spark, dir, vacCfg, IncrementalIndex.layout)
      .tombstoneBytes == 0L, "vacuum must clear the tombstone segments")
    // the freed id is re-insertable (requireNotTombstoned passes now)
    IncrementalIndex.appendBatch(
      docs.filter($"doc_id" === victim), "doc_id", "text", dir, 3L)
    assert(idxSearch(dir).size >= filtered.size)
  }

  test("IVF-PQ store: compaction preserves search, cell partitioning, and the model") {
    val (nCents, pqM, pqK, dim, nprobe, topK, nq) = (16, 4, 16, 64, 4, 5, 8)
    val dir = freshDir("maint-ann")
    IncrementalAnn.createIndex(vecs, "embedding", "vec_id", dir, nCents, pqM, pqK, dim)
    val queries = vecs.filter($"vec_id" < nq)
    def search() = IncrementalAnn
      .searchTopK(spark, dir, queries, "vec_id", "embedding", nprobe, topK)
      .collect().toSet
    val ids = vecs.select($"vec_id").as[Long].collect().sorted.toSeq
    val actions = quarters(ids).zipWithIndex.map { case ((lo, hi), i) =>
      IncrementalAnn.appendAndMaintain(
        vecs.filter($"vec_id" > lo && $"vec_id" <= hi),
        "embedding", "vec_id", dir, i.toLong, cfg)
    }
    assert(actions == Seq(
      StorePolicy.NoOp, StorePolicy.NoOp, StorePolicy.NoOp, StorePolicy.Compact),
      s"got $actions")
    // one committed segment, still physically cell-partitioned
    assert(StorePolicy.statsOf(spark, dir, cfg, IncrementalAnn.layout())
      .committedSegments == 1)
    val cellDirs = fs.listStatus(new Path(dir, "batch=0/codes")).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("c_id="))
    assert(cellDirs.nonEmpty, "compaction dropped the c_id= partitioning")
    // the frozen model survived the swap (aux-dir carry)
    assert(fs.exists(new Path(dir, "model/centroids/_SUCCESS")) &&
      fs.exists(new Path(dir, "model/codebook/_SUCCESS")),
      "the swap lost the store-level model/ dir")
    // and the maintained store answers EXACTLY like the one-shot s10
    val oneShot = graft.queries.SimilarityQueries.s10IvfPq
      .run(spark, sfDir).collect().toSet
    assert(search() == oneShot, "compacted IVF-PQ broke s10 parity")
  }

  test("per-part-marker store recovers from a crash between the renames") {
    val dir = freshDir("maint-idx-crash")
    val half = docs.select(max($"doc_id") / 2).head().getDouble(0)
    (0 to 3).foreach { i =>
      val batch =
        if (i % 2 == 0) docs.filter($"doc_id" <= half && $"doc_id" % 4 === i / 2)
        else docs.filter($"doc_id" > half && $"doc_id" % 4 === i / 2)
      IncrementalIndex.appendBatch(batch, "doc_id", "text", dir, i.toLong)
    }
    val before = idxSearch(dir)
    // copy commits, then the crash: live renamed away, swap unfinished
    assert(StorePolicy.maintainedCopy(
      spark, dir, s"$dir.maint", IncrementalIndex.layout, cfg) == StorePolicy.Compact)
    assert(fs.rename(new Path(dir), new Path(s"$dir.old")))
    // the next maintenance entry completes the swap, then decides NoOp
    assert(StorePolicy.maintain(
      spark, dir, IncrementalIndex.layout, cfg) == StorePolicy.NoOp)
    assert(idxSearch(dir) == before, "recovered store serves different results")
    assert(!fs.exists(new Path(s"$dir.old")) && !fs.exists(new Path(s"$dir.maint")))
  }
}
