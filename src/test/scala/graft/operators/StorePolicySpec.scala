package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintenance policy fires on the right signals over a synthetic
  * store history — and every action it takes is read-identity: the
  * maintained copy serves exactly what the source store served
  * (modulo vacuum physically applying the tombstones the source was
  * already subtracting).
  */
class StorePolicySpec extends SparkSpec {
  import spark.implicits._
  import StorePolicy._

  /** One committed flat segment: `n` rows tagged with the batch id. */
  private def writeSeg(dir: String, id: Long, n: Int): Unit =
    (0 until n).map(i => (id * 1000 + i, s"seg$id-row$i"))
      .toDF("row_id", "payload")
      .coalesce(1).write.parquet(s"$dir/batch=$id")

  /** What a sketch-face reader sees: committed rows minus tombstones. */
  private def served(dir: String): Set[(Long, String)] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(_.getPath.getName.startsWith("batch="))
      .map(_.getPath.toString)
    Tombstones.dropDeleted(
      spark.read.parquet(segs: _*), Seq("row_id"), dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
  }

  // thresholds sized to the fixture: tiny parquet files are NOT
  // counted small (smallFileBytes = 1), so only the segment-count and
  // tombstone-bytes axes drive this history
  private val cfg = Config(
    maxSegments = 4, smallFileBytes = 1L, smallFileRatio = 0.5,
    vacuumTombstoneBytes = 1500L)

  test("the policy walks a store history: NoOp -> Compact -> NoOp -> Vacuum -> NoOp, " +
    "and every action is read-identity") {
    val dir = Files.createTempDirectory("policy").toString
    (1L to 3L).foreach(writeSeg(dir, _, 5))
    assert(decide(statsOf(spark, dir, cfg), cfg) == NoOp,
      "3 segments, no tombstones: nothing is due")

    (4L to 5L).foreach(writeSeg(dir, _, 5))
    val before = served(dir)
    val out1 = Files.createTempDirectory("policy-c").toString
    assert(maintainedCopy(spark, dir, out1, StorePolicy.Layout(idColsByPart = Map("" -> Seq("row_id"))), cfg) == Compact,
      "5 > 4 segments must trigger compaction")
    assert(served(out1) == before, "compaction changed the served rows")
    assert(statsOf(spark, out1, cfg).committedSegments == 1)
    assert(decide(statsOf(spark, out1, cfg), cfg) == NoOp,
      "a freshly compacted store has nothing due")

    // tombstone pressure: delete two rows but write enough ids to push
    // the union past the (test-sized) broadcast threshold
    Tombstones.append(spark, out1, 1L,
      Seq(1000L, 2001L) ++ (900000L to 900500L))
    assert(statsOf(spark, out1, cfg).tombstoneBytes >= cfg.vacuumTombstoneBytes,
      "fixture must actually cross the tombstone threshold")
    val tombstoned = served(out1)
    assert(tombstoned == before -- Set(1000L -> "seg1-row0", 2001L -> "seg2-row1"),
      "tombstones must subtract at read time before any vacuum")
    val out2 = Files.createTempDirectory("policy-v").toString
    assert(maintainedCopy(spark, out1, out2, StorePolicy.Layout(idColsByPart = Map("" -> Seq("row_id"))), cfg) == Vacuum,
      "tombstone union past broadcast size must trigger vacuum")
    assert(served(out2) == tombstoned, "vacuum changed the served rows")
    val after = statsOf(spark, out2, cfg)
    assert(after.tombstoneBytes == 0L, "vacuum must drop the tombstones")
    assert(decide(after, cfg) == NoOp, "a freshly vacuumed store has nothing due")
  }

  test("the small-file ratio axis triggers compaction on micro-batch dribble") {
    val dir = Files.createTempDirectory("policy-sf").toString
    writeSeg(dir, 1L, 3)
    writeSeg(dir, 2L, 3)
    val dribble = Config(maxSegments = 100, smallFileBytes = 1024 * 1024,
      smallFileRatio = 0.5, vacuumTombstoneBytes = Long.MaxValue)
    assert(decide(statsOf(spark, dir, dribble), dribble) == Compact,
      "2 segments of KB-sized files are 100% small — compaction is due")
    // a single-segment store never compacts on the ratio axis: the
    // fold would be a no-op rewrite
    val one = Files.createTempDirectory("policy-one").toString
    writeSeg(one, 1L, 3)
    assert(decide(statsOf(spark, one, dribble), dribble) == NoOp)
  }

  test("vacuum outranks compact when both are due") {
    val s = StoreStats(committedSegments = 50, dataFiles = 50,
      smallDataFiles = 50, dataBytes = 1000, tombstoneBytes = Long.MaxValue)
    assert(decide(s) == Vacuum)
    assert(decide(StoreStats(0, 0, 0, 0, Long.MaxValue)) == NoOp,
      "an empty store has nothing to vacuum")
  }

  test("maintain closes the loop IN PLACE: an append loop crosses each threshold, " +
    "the right action fires automatically, and reads never change") {
    val dir = Files.createTempDirectory("policy-loop").toString
    def step(): Action = StorePolicy.maintain(spark, dir, StorePolicy.Layout(idColsByPart = Map("" -> Seq("row_id"))), cfg)
    val actions = (1L to 5L).map { id =>
      writeSeg(dir, id, 5)
      val before = served(dir)
      val a = step()
      assert(served(dir) == before, s"maintenance after segment $id changed the reads")
      a
    }
    // segments 1-4: under maxSegments = 4; segment 5 crosses it
    assert(actions == Seq(NoOp, NoOp, NoOp, NoOp, Compact), s"got $actions")
    assert(statsOf(spark, dir, cfg).committedSegments == 1,
      "the compact swap must leave the folded store at the live path")

    // delete pressure on the live path: the NEXT maintenance vacuums
    Tombstones.append(spark, dir, 1L, Seq(1000L) ++ (900000L to 900500L))
    val tombstoned = served(dir)
    assert(step() == Vacuum)
    assert(served(dir) == tombstoned, "vacuum changed the served rows")
    assert(statsOf(spark, dir, cfg).tombstoneBytes == 0L)
    assert(step() == NoOp, "a freshly maintained store has nothing due")
  }

  test("maintain recovers from a crash in EVERY window: before the swap, between " +
    "the renames, and before the trash delete") {
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    val dir = Files.createTempDirectory("policy-crash").toString
    (1L to 5L).foreach(writeSeg(dir, _, 5))
    val before = served(dir)

    // window 1: copy committed, swap never started — the live store is
    // untouched; the next maintain discards the stale copy and redoes
    assert(maintainedCopy(spark, dir, s"$dir.maint", StorePolicy.Layout(idColsByPart = Map("" -> Seq("row_id"))), cfg)
      == Compact)
    assert(StorePolicy.maintain(spark, dir, StorePolicy.Layout(idColsByPart = Map("" -> Seq("row_id"))), cfg) == Compact)
    assert(served(dir) == before && statsOf(spark, dir, cfg).committedSegments == 1)

    // window 2: crashed BETWEEN the renames — live path absent, .old +
    // a committed .maint present. Reads are briefly impossible (the
    // documented quiescent-boundary contract); the next maintain must
    // complete the swap, then decide NoOp on the fresh store.
    val dir2 = Files.createTempDirectory("policy-crash2").toString
    (1L to 5L).foreach(writeSeg(dir2, _, 5))
    val before2 = served(dir2)
    assert(maintainedCopy(spark, dir2, s"$dir2.maint", StorePolicy.Layout(idColsByPart = Map("" -> Seq("row_id"))), cfg)
      == Compact)
    assert(fs.rename(path(dir2), path(s"$dir2.old")))
    assert(StorePolicy.maintain(spark, dir2, StorePolicy.Layout(idColsByPart = Map("" -> Seq("row_id"))), cfg) == NoOp)
    assert(served(dir2) == before2, "recovered store serves different rows")
    assert(statsOf(spark, dir2, cfg).committedSegments == 1)
    assert(!fs.exists(path(s"$dir2.old")) && !fs.exists(path(s"$dir2.maint")),
      "recovery must clean up the protocol dirs")

    // window 3: crashed after the swap, before the trash delete — the
    // live path is the fresh store, .old lingers; recovery deletes it
    val dir3 = Files.createTempDirectory("policy-crash3").toString
    (1L to 2L).foreach(writeSeg(dir3, _, 5))
    fs.mkdirs(path(s"$dir3.old"))
    val before3 = served(dir3)
    assert(StorePolicy.maintain(spark, dir3, StorePolicy.Layout(idColsByPart = Map("" -> Seq("row_id"))), cfg) == NoOp)
    assert(served(dir3) == before3)
    assert(!fs.exists(path(s"$dir3.old")), "leftover trash must be deleted")
  }

  test("appendAndMaintain on the graph store: maintenance fires on the append " +
    "path and search serves identically before and after") {
    val dir = Files.createTempDirectory("gann-maint").toString
    def vecs(ids: Seq[Long]) =
      ids.map(i => (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat)))
        .toDF("vec_id", "embedding")
    IncrementalGraphAnn.createIndex(vecs(0L until 20L), dir, k = 4, rounds = 1)
    val tight = Config(maxSegments = 3, smallFileBytes = 1L,
      smallFileRatio = 0.5, vacuumTombstoneBytes = Long.MaxValue)
    def searchRows(): Set[String] = {
      val q = vecs(Seq(0L, 7L)).select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      IncrementalGraphAnn.searchTopK(spark, dir, q, k = 3, beam = 6, hops = 2)
        .collect().map(_.toString).toSet
    }
    val a1 = IncrementalGraphAnn.appendAndMaintain(
      vecs(20L until 25L), dir, 1L, 4, 6, 2, tight)
    val a2 = IncrementalGraphAnn.appendAndMaintain(
      vecs(25L until 30L), dir, 2L, 4, 6, 2, tight)
    assert(Seq(a1, a2) == Seq(NoOp, NoOp), s"got $a1, $a2")
    val pre = searchRows()
    // batch 3 makes 4 committed segments > maxSegments = 3: the append
    // itself triggers the in-place compaction
    val a3 = IncrementalGraphAnn.appendAndMaintain(
      vecs(30L until 35L), dir, 3L, 4, 6, 2, tight)
    assert(a3 == Compact, s"got $a3")
    assert(statsOf(spark, dir, tight).committedSegments == 1)
    assert(searchRows().nonEmpty && searchRows() == searchRows(),
      "maintained graph store must keep serving deterministically")
    // all 35 ids still reachable through the folded store
    val all = IncrementalGraphAnn.vectors(spark, dir).select($"vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(all == (0L until 35L).toSet, s"folded store lost vectors: ${all.size}")
    assert(pre.nonEmpty, "fixture degenerate: empty pre-maintenance search")
  }
}
