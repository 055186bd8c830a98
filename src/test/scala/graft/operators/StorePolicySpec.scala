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
    assert(maintainedCopy(spark, dir, out1, Map("" -> Seq("row_id")), cfg) == Compact,
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
    assert(maintainedCopy(spark, out1, out2, Map("" -> Seq("row_id")), cfg) == Vacuum,
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
}
