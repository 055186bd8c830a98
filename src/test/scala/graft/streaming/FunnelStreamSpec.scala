package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables
import graft.streaming.EventStreams.{FunnelEv, FunnelRow}

/** Streaming funnel == batch q44 stage semantics, across micro-batch
  * splits and under the out-of-order resurrection case (a late earlier
  * view making an already-seen click the new t2).
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = implicitly[org.apache.spark.sql.Encoder[FunnelEv]].schema

  // attribution window wider than any intra-user gap in the data, so
  // each user finalizes exactly one funnel (the batch q44 semantics)
  private def startFunnel(dir: String, name: String) = {
    val in = spark.readStream.schema(evSchema).parquet(dir).as[FunnelEv]
    EventStreams.streamingFunnel(in, idleTimeoutMinutes = 365 * 24 * 60)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
  }

  /** Batch reference: q44's per-user stage computation on the same rows. */
  private def batchStages(evs: org.apache.spark.sql.DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
    evs
      .withColumn("t1", min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("t2", min(when($"event_type" === "click" && $"ts" > $"t1", $"ts")).over(w))
      .withColumn("t3", min(when($"event_type" === "purchase" && $"ts" > $"t2", $"ts")).over(w))
      .groupBy($"user_id")
      .agg(min($"t1").as("t1"), min($"t2").as("t2"), min($"t3").as("t3"))
      .filter($"t1".isNotNull)
  }

  test("stream == batch stages on the real events table, split in two micro-batches") {
    val dir = Files.createTempDirectory("funnel-in").toString
    val evs = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_type").cache()
    // split by event TIME (not user): a later batch must not fall
    // behind the watermark the first batch establishes
    val mid = new Timestamp(
      evs.select(percentile_approx($"ts", lit(0.5), lit(1000))).head()
        .getTimestamp(0).getTime)
    evs.filter($"ts" <= lit(mid)).write.mode("append").parquet(dir)
    val q = startFunnel(dir, "funnel_real")
    q.processAllAvailable()
    evs.filter($"ts" > lit(mid)).write.mode("append").parquet(dir)
    q.processAllAvailable()
    // far-future kicker advances the watermark past every idle timeout
    Seq(FunnelEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), "view"))
      .toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_real").as[FunnelRow]
      .filter($"user_id" =!= -1L)
      .select($"user_id", $"t1", $"t2", $"t3")
    val batch = batchStages(evs)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0, "streamed rows not in batch")
    assert(batch.exceptAll(streamed).count() == 0, "batch rows missing from stream")
  }

  test("attribution window: a user returning after the idle horizon starts a fresh funnel") {
    val t0 = Timestamp.valueOf("2024-07-01 08:00:00").getTime
    def ts(m: Long) = new Timestamp(t0 + m * 60000L)
    val dir = Files.createTempDirectory("funnel-window").toString
    // round 1: view@0, click@10; then 5h idle (> 60-min window);
    // round 2: view@310 only
    Seq(FunnelEv(5L, ts(0), "view"), FunnelEv(5L, ts(10), "click"),
      FunnelEv(5L, ts(310), "view"),
      FunnelEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), "view"))
      .toDS().write.mode("append").parquet(dir)
    val in = spark.readStream.schema(evSchema).parquet(dir).as[FunnelEv]
    val q = EventStreams.streamingFunnel(in, idleTimeoutMinutes = 60)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("funnel_window").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_window").as[FunnelRow].collect()
      .filter(_.user_id == 5L).sortBy(_.t1.getTime)
    assert(rows.length == 2, s"expected two funnel rounds, got ${rows.length}")
    assert(rows(0).t1 == ts(0) && rows(0).t2.contains(ts(10)) && rows(0).t3.isEmpty)
    assert(rows(1).t1 == ts(310) && rows(1).t2.isEmpty)
  }

  test("a late earlier view resurrects an already-seen click (and its purchase)") {
    val t0 = Timestamp.valueOf("2024-06-01 12:00:00").getTime
    def ts(m: Long) = new Timestamp(t0 + m * 60000L)
    val dir = Files.createTempDirectory("funnel-ooo").toString
    // batch 1: click@5 and purchase@6 arrive with view@10 — click 5 is
    // NOT eligible (not after the view), purchase has no stage-2 yet
    Seq(FunnelEv(7L, ts(5), "click"), FunnelEv(7L, ts(6), "purchase"),
      FunnelEv(7L, ts(10), "view"))
      .toDS().write.mode("append").parquet(dir)
    val q = startFunnel(dir, "funnel_ooo")
    q.processAllAvailable()
    // batch 2: an EARLIER view (in-watermark) lowers t1 to 2 — click 5
    // must resurrect as t2, purchase 6 as t3
    Seq(FunnelEv(7L, ts(2), "view")).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(FunnelEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), "view"))
      .toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val r = spark.table("funnel_ooo").as[FunnelRow].collect()
      .find(_.user_id == 7L).get
    assert(r.t1 == ts(2))
    assert(r.t2.contains(ts(5)), s"click must resurrect, got ${r.t2}")
    assert(r.t3.contains(ts(6)), s"purchase must resurrect, got ${r.t3}")
  }
}
