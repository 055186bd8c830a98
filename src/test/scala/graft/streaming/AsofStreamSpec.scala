package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables
import graft.queries.Registry
import graft.streaming.EventStreams.{AsofEv, AsofRow}

/** Streaming as-of join == batch q56, across micro-batch splits and
  * under out-of-order in-watermark delivery: every emitted left row
  * must carry the latest right row at-or-before it, with the batch
  * window's exact tie semantics.
  */
class AsofStreamSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = implicitly[org.apache.spark.sql.Encoder[AsofEv]].schema

  private def startStream(dir: String, name: String) = {
    val in = spark.readStream.schema(evSchema).parquet(dir).as[AsofEv]
    EventStreams.streamingAsof(in)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
  }

  private val kicker =
    AsofEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, 1, 0.0)

  private def streamed(name: String) =
    spark.table(name).as[AsofRow].filter($"user_id" =!= -1L)
      .select($"event_id", $"user_id", $"click_id", $"click_value", $"lag_us")

  test("stream == batch q56 on the real events table, split in two micro-batches") {
    val dir = Files.createTempDirectory("asof-in").toString
    val evs = Tables.events(spark, sfDir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "purchase", 1).otherwise(0).as("tag"),
        $"value")
      .as[AsofEv].cache()
    val mid = new Timestamp(
      evs.select(percentile_approx($"ts", lit(0.5), lit(1000))).head()
        .getTimestamp(0).getTime)
    evs.filter($"ts" <= lit(mid)).write.mode("append").parquet(dir)
    val q = startStream(dir, "asof_real")
    q.processAllAvailable()
    evs.filter($"ts" > lit(mid)).write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = streamed("asof_real")
    val batch = Registry.byName("q56_asof_join").run(spark, sfDir)
      .select($"event_id", $"user_id", $"click_id", $"click_value", $"lag_us")
    assert(got.count() > 0 && got.count() == batch.count())
    assert(got.exceptAll(batch).count() == 0, "streamed rows not in batch")
    assert(batch.exceptAll(got).count() == 0, "batch rows missing from stream")
  }

  test("out-of-order in-watermark delivery and ts ties resolve like the batch window") {
    val t0 = Timestamp.valueOf("2024-07-01 08:00:00").getTime
    def ts(m: Long) = new Timestamp(t0 + m * 60000L)
    val dir = Files.createTempDirectory("asof-ooo").toString
    // arrival batch 1: the purchase (at 40) BEFORE its matching click
    // (at 20, arriving in batch 2, inside the 2h watermark) — the
    // reorder buffer must hold the purchase until the watermark passes
    // it, then join the later-arriving earlier click. Also: two clicks
    // at the SAME ts (ids 5, 6) — max event_id must win; and a click
    // at EXACTLY a purchase's ts (user 8) — `>=` includes it.
    Seq(
      AsofEv(7L, ts(40), 10L, 1, 0.0),
      AsofEv(8L, ts(50), 20L, 1, 0.0)).toDS()
      .write.mode("append").parquet(dir)
    val q = startStream(dir, "asof_ooo")
    q.processAllAvailable()
    Seq(
      AsofEv(7L, ts(20), 5L, 0, 1.5),
      AsofEv(7L, ts(20), 6L, 0, 2.5),
      AsofEv(8L, ts(50), 21L, 0, 3.5)).toDS()
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_ooo").as[AsofRow]
      .filter($"user_id" =!= -1L).collect()
      .map(r => r.event_id -> r).toMap
    assert(got(10L).click_id.contains(6L),
      s"ts-tie pick / out-of-order join: ${got(10L)}")
    assert(got(10L).click_value.contains(2.5) &&
      got(10L).lag_us.contains(20L * 60000000L), s"carried fields: ${got(10L)}")
    assert(got(20L).click_id.contains(21L) && got(20L).lag_us.contains(0L),
      s"equal-ts inclusion: ${got(20L)}")
  }

  test("backward stream with a tolerance == batch asofJoin(tolerance) on the real events") {
    val tolUs = 30L * 60000000L // 30 minutes
    val dir = Files.createTempDirectory("asof-tol-in").toString
    val evs = Tables.events(spark, sfDir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "purchase", 1).otherwise(0).as("tag"),
        $"value")
      .as[AsofEv].cache()
    val mid = new Timestamp(
      evs.select(percentile_approx($"ts", lit(0.5), lit(1000))).head()
        .getTimestamp(0).getTime)
    evs.filter($"ts" <= lit(mid)).write.mode("append").parquet(dir)
    val in = spark.readStream.schema(evSchema).parquet(dir).as[AsofEv]
    val q = EventStreams.streamingAsof(in, Some(tolUs))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_tol").start()
    q.processAllAvailable()
    evs.filter($"ts" > lit(mid)).write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = streamed("asof_tol")
    val ev = Tables.events(spark, sfDir)
    val batch = graft.operators.AsofJoin.asofJoin(
      ev.filter($"event_type" === "purchase").select($"user_id", $"ts", $"event_id"),
      ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"),
          $"value".as("click_value")),
      Seq("user_id"), "ts", "click_id", "backward", Some(tolUs))
      .select($"event_id", $"user_id", $"asof.click_id".as("click_id"),
        $"asof.click_value".as("click_value"),
        (unix_micros($"ts") - unix_micros($"asof.asof_ts")).as("lag_us"))
    // the tolerance must actually bite on this data, or the test
    // degenerates to the uncapped case
    assert(batch.filter($"click_id".isNull).count() > 0,
      "fixture too loose: no purchase exceeds the tolerance")
    assert(got.count() > 0 && got.count() == batch.count())
    assert(got.exceptAll(batch).count() == 0, "streamed rows not in batch")
    assert(batch.exceptAll(got).count() == 0, "batch rows missing from stream")
  }

  test("idle state is RECLAIMED: a capped machine's store empties as the watermark " +
    "passes every horizon; uncapped backward keeps exactly the per-user anchors") {
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    val t0 = Timestamp.valueOf("2024-07-01 08:00:00").getTime
    def ts(m: Long) = new Timestamp(t0 + m * 60000L)
    // three users, a right and a matched left each — nothing pending
    // once the watermark passes
    val evs = (1L to 3L).flatMap(u => Seq(
      AsofEv(u, ts(10), u * 10, 0, 1.0),
      AsofEv(u, ts(20), u * 10 + 1, 1, 0.0)))

    // FORWARD (capped by construction): all six users' buffers drain
    // and their state rows disappear — only the kicker's own left stays
    val fdir = Files.createTempDirectory("asof-reclaim-f").toString
    evs.toDS().write.mode("append").parquet(fdir)
    val fin = spark.readStream.schema(evSchema).parquet(fdir).as[AsofEv]
    val fq = EventStreams.streamingAsofForward(fin, 60000000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_reclaim_f").start()
    fq.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(fdir)
    fq.processAllAvailable()
    // one more empty-ish batch so timeouts fire under the advanced wm
    Seq(kicker.copy(event_id = 1L, ts = Timestamp.valueOf("2031-01-01 00:00:00")))
      .toDS().write.mode("append").parquet(fdir)
    fq.processAllAvailable()
    val fRows = stateRows(fq)
    fq.stop()
    assert(fRows <= 1, s"forward state not reclaimed: $fRows rows (want <= 1, the kicker)")

    // BACKWARD with tolerance: anchors are swept too
    val bdir = Files.createTempDirectory("asof-reclaim-b").toString
    evs.toDS().write.mode("append").parquet(bdir)
    val bin = spark.readStream.schema(evSchema).parquet(bdir).as[AsofEv]
    val bq = EventStreams.streamingAsof(bin, Some(60000000L))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_reclaim_b").start()
    bq.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(bdir)
    bq.processAllAvailable()
    Seq(kicker.copy(event_id = 1L, ts = Timestamp.valueOf("2031-01-01 00:00:00")))
      .toDS().write.mode("append").parquet(bdir)
    bq.processAllAvailable()
    val bRows = stateRows(bq)
    bq.stop()
    assert(bRows <= 1, s"capped backward state not reclaimed: $bRows rows")

    // UNCAPPED backward: the anchor is the semantics — exactly one
    // state row per user with a right, plus the pending kicker
    val udir = Files.createTempDirectory("asof-reclaim-u").toString
    evs.toDS().write.mode("append").parquet(udir)
    val uin = spark.readStream.schema(evSchema).parquet(udir).as[AsofEv]
    val uq = EventStreams.streamingAsof(uin)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("asof_reclaim_u").start()
    uq.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(udir)
    uq.processAllAvailable()
    val uRows = stateRows(uq)
    uq.stop()
    assert(uRows == 4, s"uncapped backward must keep 3 anchors + kicker: $uRows rows")
  }
}
