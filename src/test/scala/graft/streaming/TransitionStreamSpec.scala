package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables
import graft.streaming.EventStreams.{TransEv, TransitionRow}

/** Streaming ordered transitions == batch lag, across micro-batch
  * splits and under out-of-order in-watermark delivery: the reorder
  * buffer must emit each user's chain in exact (ts, event_id) order
  * regardless of arrival order.
  */
class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = implicitly[org.apache.spark.sql.Encoder[TransEv]].schema

  private def startStream(dir: String, name: String) = {
    val in = spark.readStream.schema(evSchema).parquet(dir).as[TransEv]
    EventStreams.orderedTransitions(in)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
  }

  /** Batch reference: q46's lag extraction on the same rows. */
  private def batchTransitions(evs: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    evs.select($"user_id", $"event_type",
      lag($"event_type", 1).over(w).as("prev_type"))
      .filter($"prev_type".isNotNull)
      .select($"user_id", $"prev_type", $"event_type")
  }

  private val kicker =
    TransEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "kick")

  test("stream == batch transitions on the real events table, split in two micro-batches") {
    val dir = Files.createTempDirectory("trans-in").toString
    val evs = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type").cache()
    val mid = new Timestamp(
      evs.select(percentile_approx($"ts", lit(0.5), lit(1000))).head()
        .getTimestamp(0).getTime)
    evs.filter($"ts" <= lit(mid)).write.mode("append").parquet(dir)
    val q = startStream(dir, "trans_real")
    q.processAllAvailable()
    evs.filter($"ts" > lit(mid)).write.mode("append").parquet(dir)
    q.processAllAvailable()
    // far-future kicker: advances the watermark so every user's held
    // buffer flushes via its event-time timeout
    Seq(kicker).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("trans_real").as[TransitionRow]
      .filter($"user_id" =!= -1L)
      .select($"user_id", $"prev_type", $"event_type")
    val batch = batchTransitions(evs)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0, "streamed transitions not in batch")
    assert(batch.exceptAll(streamed).count() == 0, "batch transitions missing from stream")
  }

  test("out-of-order in-watermark arrivals still emit in event-time order") {
    val t0 = Timestamp.valueOf("2024-07-01 08:00:00").getTime
    def ts(m: Long) = new Timestamp(t0 + m * 60000L)
    val dir = Files.createTempDirectory("trans-ooo").toString
    // arrival batch 1: the LATER events (C at 40, D at 60); batch 2
    // delivers the earlier A/B (at 0/20, inside the 2h watermark).
    // Event-time order is A->B->C->D; arrival order is C,D,A,B.
    Seq(TransEv(7L, ts(40), 3L, "C"), TransEv(7L, ts(60), 4L, "D"))
      .toDS().write.mode("append").parquet(dir)
    val q = startStream(dir, "trans_ooo")
    q.processAllAvailable()
    Seq(TransEv(7L, ts(0), 1L, "A"), TransEv(7L, ts(20), 2L, "B"))
      .toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_ooo").as[TransitionRow]
      .filter($"user_id" === 7L)
      .collect().map(r => (r.prev_type, r.event_type)).toSet
    assert(got == Set(("A", "B"), ("B", "C"), ("C", "D")),
      s"expected the event-time chain, got $got")
  }

  test("equal-timestamp events order by event_id across batch boundaries") {
    val t0 = Timestamp.valueOf("2024-07-01 08:00:00")
    val dir = Files.createTempDirectory("trans-tie").toString
    // same ts, delivered higher-event_id first, in separate batches
    Seq(TransEv(9L, t0, 5L, "Y")).toDS().write.mode("append").parquet(dir)
    val q = startStream(dir, "trans_tie")
    q.processAllAvailable()
    Seq(TransEv(9L, t0, 2L, "X")).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(kicker).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_tie").as[TransitionRow]
      .filter($"user_id" === 9L)
      .collect().map(r => (r.prev_type, r.event_type)).toSet
    assert(got == Set(("X", "Y")), s"tie must break on event_id: got $got")
  }
}
