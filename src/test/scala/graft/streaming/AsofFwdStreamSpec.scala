package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables
import graft.operators.AsofJoin
import graft.streaming.EventStreams.{AsofEv, AsofFwdRow}

/** Streaming FORWARD as-of (with tolerance) == the batch operator
  * `AsofJoin.asofJoin(direction = "forward", tolerance = tol)`,
  * across micro-batch splits and under out-of-order delivery —
  * including the None row a left emits exactly once when no right
  * arrives inside its tolerance window.
  */
class AsofFwdStreamSpec extends SparkSpec {
  import spark.implicits._

  private val TolUs = 30L * 60000000L // 30 minutes

  private val evSchema = implicitly[org.apache.spark.sql.Encoder[AsofEv]].schema

  private def startStream(dir: String, name: String) = {
    val in = spark.readStream.schema(evSchema).parquet(dir).as[AsofEv]
    EventStreams.streamingAsofForward(in, TolUs)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
  }

  private val kicker =
    AsofEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, 1, 0.0)

  test("stream == batch forward as-of with tolerance on the real events table, " +
    "split in two micro-batches") {
    val dir = Files.createTempDirectory("asof-fwd-in").toString
    // left = error (tag 1), right = view (tag 0): q61's read, capped
    val evs = Tables.events(spark, sfDir)
      .filter($"event_type".isin("view", "error"))
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "error", 1).otherwise(0).as("tag"),
        $"value")
      .as[AsofEv].cache()
    val mid = new Timestamp(
      evs.select(percentile_approx($"ts", lit(0.5), lit(1000))).head()
        .getTimestamp(0).getTime)
    evs.filter($"ts" <= lit(mid)).write.mode("append").parquet(dir)
    val q = startStream(dir, "asof_fwd_real")
    q.processAllAvailable()
    evs.filter($"ts" > lit(mid)).write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asof_fwd_real").as[AsofFwdRow]
      .filter($"user_id" =!= -1L)
      .select($"event_id", $"user_id", $"next_id", $"next_value", $"gap_us")
    val ev = Tables.events(spark, sfDir)
    val batch = AsofJoin.asofJoin(
      ev.filter($"event_type" === "error").select($"user_id", $"ts", $"event_id"),
      ev.filter($"event_type" === "view")
        .select($"user_id", $"ts", $"event_id".as("next_id"),
          $"value".as("next_value")),
      Seq("user_id"), "ts", "next_id", "forward", Some(TolUs))
      .select($"event_id", $"user_id", $"asof.next_id".as("next_id"),
        $"asof.next_value".as("next_value"),
        (unix_micros($"asof.asof_ts") - unix_micros($"ts")).as("gap_us"))
    assert(got.count() > 0 && got.count() == batch.count(),
      s"row counts: stream ${got.count()} vs batch ${batch.count()}")
    assert(got.exceptAll(batch).count() == 0, "streamed rows not in batch")
    assert(batch.exceptAll(got).count() == 0, "batch rows missing from stream")
  }

  test("out-of-order delivery, equal-ts inclusion with max-id tie, nearest-not-" +
    "latest pick, and the exactly-once None row past the tolerance") {
    val t0 = Timestamp.valueOf("2024-07-01 08:00:00").getTime
    def ts(m: Long) = new Timestamp(t0 + m * 60000L)
    val dir = Files.createTempDirectory("asof-fwd-ooo").toString
    // user 7: the error (at 10) arrives FIRST; its matching views
    // arrive in batch 2 — one at 25 and one EARLIER at 20 (both in
    // window): the pick must be the EARLIEST (20), not the first-
    // arrived. user 8: view at exactly the error's ts (inclusive) with
    // an equal-ts twin — max event_id wins. user 9: only a view at
    // +45 min — outside the 30-min tolerance, so exactly one None row.
    Seq(
      AsofEv(7L, ts(10), 10L, 1, 0.0),
      AsofEv(8L, ts(10), 20L, 1, 0.0),
      AsofEv(9L, ts(10), 30L, 1, 0.0),
      AsofEv(9L, ts(55), 31L, 0, 9.0)).toDS()
      .write.mode("append").parquet(dir)
    val q = startStream(dir, "asof_fwd_ooo")
    q.processAllAvailable()
    Seq(
      AsofEv(7L, ts(25), 11L, 0, 1.5),
      AsofEv(7L, ts(20), 12L, 0, 2.5),
      AsofEv(8L, ts(10), 21L, 0, 3.5),
      AsofEv(8L, ts(10), 22L, 0, 4.5)).toDS()
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof_fwd_ooo").as[AsofFwdRow]
      .filter($"user_id" =!= -1L).collect()
    val got = rows.map(r => r.event_id -> r).toMap
    assert(rows.length == 3, s"each left must emit exactly once: ${rows.toSeq}")
    assert(got(10L).next_id.contains(12L) &&
      got(10L).gap_us.contains(10L * 60000000L),
      s"earliest-in-window must win over first-arrived: ${got(10L)}")
    assert(got(20L).next_id.contains(22L) && got(20L).gap_us.contains(0L),
      s"equal-ts inclusion with max-id tie: ${got(20L)}")
    assert(got(30L).next_id.isEmpty && got(30L).gap_us.isEmpty,
      s"out-of-tolerance right must yield a None row: ${got(30L)}")
  }
}
