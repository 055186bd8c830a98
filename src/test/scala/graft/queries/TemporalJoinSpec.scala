package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** q56 (as-of join) and q57 (bucketed range join): semantics pinned
  * against driver-side brute force on the real table, tie/edge
  * semantics on a crafted events table, and the plan shapes that ARE
  * the operators' point — q56 joins with one shuffle and no join node
  * at all; q57 never degrades to the BroadcastNestedLoop plan the
  * naive inequality join would give.
  */
class TemporalJoinSpec extends SparkSpec {

  /** (event_id, epoch µs, user_id, event_type, value) off the real
    * table — µs longs so the brute force sees the full ts precision.
    */
  private def eventRows(dir: String): Seq[(Long, Long, Long, String, Double)] =
    Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")), col("user_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq

  test("q56 equals the brute-force as-of join on the real table") {
    val rows = eventRows(sfDir)
    val clicks = rows.filter(_._4 == "click")
    val want: Map[Long, Option[(Long, Double, Long)]] =
      rows.filter(_._4 == "purchase").map { case (pid, pus, user, _, _) =>
        val prior = clicks.filter(c => c._3 == user && c._2 <= pus)
        val best = prior.sortBy(c => (c._2, c._1)).lastOption
        pid -> best.map(c => (c._1, c._5, pus - c._2))
      }.toMap
    val got = Registry.byName("q56_asof_join").run(spark, sfDir)
      .collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None
          else Some((r.getLong(2), r.getDouble(3), r.getLong(4))))
      }.toMap
    assert(got.keySet == want.keySet, "purchase row set differs")
    got.foreach { case (pid, g) =>
      assert(g == want(pid), s"purchase $pid: $g != ${want(pid)}")
    }
  }

  test("q56 tie semantics: equal-ts click counts; max event_id wins a ts tie") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:00:10")
    val rows = Seq(
      // user 1: two clicks at the SAME ts before the purchase — the
      // higher event_id must win
      (10L, t0, 1L, "click", 1.0, "{}"),
      (11L, t0, 1L, "click", 2.0, "{}"),
      (12L, t1, 1L, "purchase", 9.0, "{}"),
      // user 2: click at EXACTLY the purchase ts — `>=` includes it
      (20L, t1, 2L, "click", 3.0, "{}"),
      (21L, t1, 2L, "purchase", 9.0, "{}"),
      // user 3: only a LATER click — no match, null row
      (30L, t1, 3L, "purchase", 9.0, "{}"),
      (31L, Timestamp.valueOf("2024-01-01 00:00:20"), 3L, "click", 4.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("asof").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byName("q56_asof_join").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(4))))).toMap
    assert(got(12L) == Some((11L, 10000000L)), s"ts-tie pick: ${got(12L)}")
    assert(got(21L) == Some((20L, 0L)), s"equal-ts inclusion: ${got(21L)}")
    assert(got(30L).isEmpty, s"future click leaked backward: ${got(30L)}")
  }

  test("q56 plans ONE corpus shuffle; census shrinks map-side; stitch broadcasts") {
    // the sliced two-phase as-of join's contract: exactly THREE
    // non-broadcast exchanges — (user_id, slice) for the carry window
    // [the only corpus-wide one], the boundary census's exchange ABOVE
    // a partial max_by (map-side shrink to ≤ keys × slices rows before
    // any data moves), and the per-key stitch window over that tiny
    // frame — and the join back is a broadcast of the tiny side, never
    // a shuffled join of the corpus
    val p = Registry.byName("q56_asof_join").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    def n(t: String) = p.sliding(t.length).count(_ == t)
    assert(n("Exchange") - n("BroadcastExchange") == 3,
      s"sliced as-of join must cost one corpus + two tiny shuffles:\n$p")
    assert(p.contains("partial_max_by"),
      s"boundary census must shrink map-side before its exchange:\n$p")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the stitch join must broadcast the keys×slices side:\n$p")
  }

  test("q57 equals the brute-force range join on the real table") {
    val rows = eventRows(sfDir)
    val want = rows.filter(_._4 == "error").map { case (eid, eus, _, _, _) =>
      val in = rows.filter(r => r._2 >= eus - 10000000L && r._2 < eus)
      // integer cents (the query's convention): EXACT equality — the
      // whole point of quantizing is that summation order can't matter
      eid -> (in.size.toLong, in.map(r => math.floor(r._5 * 100 + 0.5).toLong).sum)
    }.toMap
    val got = Registry.byName("q57_range_join").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == want.keySet, "error row set differs")
    got.foreach { case (eid, g) =>
      assert(g == want(eid), s"error $eid: $g != ${want(eid)}")
    }
  }

  test("q57 hot burst: a flash crowd in one 10-s window stays correct and salted") {
    import spark.implicits._
    def ts(s: Long) = new Timestamp(
      Timestamp.valueOf("2024-05-01 00:00:00").getTime + s * 1000L)
    // >30% of ALL events land inside one 10-second window (the
    // flash-crowd burst that would serialize an unsalted bucket into
    // one straggler task at 100×); errors sit inside, at the edge of,
    // and far away from the burst
    val burst = (0L until 40L).map(i =>
      (100L + i, ts(100 + (i % 10)), i % 5, "view", 1.0 + i, "{}"))
    val spread = (0L until 60L).map(i =>
      (200L + i, ts(i * 120), i % 7, "click", 0.5 * i, "{}"))
    val errs = Seq(
      (900L, ts(105), 1L, "error", 0.0, "{}"),   // mid-burst
      (901L, ts(110), 2L, "error", 0.0, "{}"),   // just past the burst start
      (902L, ts(3000), 3L, "error", 0.0, "{}"),  // far from the burst
      (903L, ts(0), 4L, "error", 0.0, "{}"))     // nothing strictly before
    val all = burst ++ spread ++ errs
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    all.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val us = all.map(r => (r._1, r._2.getTime * 1000L, r._5))
    val want = errs.map { e =>
      val eus = e._2.getTime * 1000L
      val in = us.filter(r => r._2 >= eus - 10000000L && r._2 < eus)
      e._1 -> (in.size.toLong, in.map(r => math.floor(r._3 * 100 + 0.5).toLong).sum)
    }.toMap
    val q = Registry.byName("q57_range_join").run(spark, dir)
    val got = q.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"$got != $want")
    // the salt must be IN the plan: a deterministic xxhash64-derived
    // right-side salt joined as part of the equi-key
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("xxhash64"), s"bucket salt missing from the plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"salted range join degraded:\n$p")
  }

  test("q59 leak-freedom: a purchase inside a session never sees that session; " +
    "the previous COMPLETED session is the feature") {
    import spark.implicits._
    def ts(m: Long) = new Timestamp(
      Timestamp.valueOf("2024-03-01 00:00:00").getTime + m * 60000L)
    // user 1 — session A: events at 0,5,10 min (values 100,200,300);
    // >30 min gap; session B opens at 60 with a view, purchase at 61
    // (same session as the view): features must be ALL of A, never B.
    // user 2 — purchase at 5 min INSIDE its very first session (an
    // event precedes it at 0): no completed prior session -> all-null.
    val rows = Seq(
      (10L, ts(0), 1L, "view", 1.0, "{}"),
      (11L, ts(5), 1L, "click", 2.0, "{}"),
      (12L, ts(10), 1L, "view", 3.0, "{}"),
      (13L, ts(60), 1L, "view", 4.0, "{}"),
      (14L, ts(61), 1L, "purchase", 9.0, "{}"),
      (20L, ts(0), 2L, "view", 5.0, "{}"),
      (21L, ts(5), 2L, "purchase", 9.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("pit").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byName("q59_pit_features").run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None
         else Some((r.getLong(3), r.getLong(4), r.getLong(5))))).toMap
    // session A: 3 events, 100+200+300 cents, ended (61-10) min before
    assert(got(14L) == Some((3L, 600L, 51L * 60000000L)),
      s"purchase 14 must see exactly session A: ${got(14L)}")
    assert(got(21L).isEmpty,
      s"purchase 21 leaked features from its own open session: ${got(21L)}")
  }

  test("q57 never plans BroadcastNestedLoop or Cartesian") {
    val p = Registry.byName("q57_range_join").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join degraded to BNLJ:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian range join:\n$p")
  }
}
