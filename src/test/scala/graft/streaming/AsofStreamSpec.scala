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
}
