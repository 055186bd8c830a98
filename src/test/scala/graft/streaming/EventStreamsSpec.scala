package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables
import graft.streaming.EventStreams.{Ev, Session}

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly windowed agg == batch result once watermark closes all windows") {
    val batchEvents = Tables.events(spark, sfDir)
      .select($"ts", $"event_type", $"value").cache()
    val dir = Files.createTempDirectory("graft-stream-in").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = EventStreams.hourlyWindowedAgg(streamIn).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("hourly_out")
      .start()
    q.processAllAvailable()
    // sentinel far-future event advances the watermark past every real window
    val maxTs = batchEvents.agg(max($"ts")).head().getTimestamp(0)
    Seq((new Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000), "sentinel", 0.0))
      .toDF("ts", "event_type", "value")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hourly_out")
      .filter($"event_type" =!= "sentinel")
      .select($"hour_start", $"event_type", $"n", round($"total_value", 4).as("tv"))
    val batch = EventStreams.hourlyWindowedAgg(batchEvents)
      .select($"hour_start", $"event_type", $"n", round($"total_value", 4).as("tv"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0, "streaming rows not in batch result")
    assert(batch.exceptAll(streamed).count() == 0, "batch rows missing from streaming result")
  }

  test("sessionize tracks the true session start for out-of-order in-watermark events") {
    val t0 = Timestamp.valueOf("2024-04-01 12:00:00").getTime
    def ts(min: Long): Timestamp = new Timestamp(t0 + min * 60000L)
    val dir = Files.createTempDirectory("graft-ooo-in").toString

    Seq(Ev(30L, ts(0), 1.0)).toDS().write.mode("append").parquet(dir)
    val streamIn = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
      .parquet(dir).as[Ev]
    val q = EventStreams.sessionize(streamIn).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("ooo_sessions").start()
    q.processAllAvailable()
    // batch 2: an EARLIER event (within watermark) merges into the open
    // session; a far-future event then times it out
    Seq(Ev(30L, ts(-10), 2.0)).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(Ev(30L, ts(14400), 0.0)).toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val s = spark.table("ooo_sessions").as[Session].collect()
      .find(_.session_id == 1L).get
    assert(s.n_events == 2 && s.session_value == 3.0)
    assert(s.start_ts == ts(-10), s"start must move back to the earliest event, got ${s.start_ts}")
    assert(s.end_ts == ts(0))
  }

  test("streaming dedup drops re-delivered keys within the watermark") {
    val t0 = Timestamp.valueOf("2024-05-01 00:00:00").getTime
    def ts(min: Long): Timestamp = new Timestamp(t0 + min * 60000L)
    val dir = Files.createTempDirectory("graft-dedup-in").toString

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    Seq((1L, ts(0)), (2L, ts(1)), (1L, ts(2)))
      .toDF("event_id", "ts").write.mode("append").parquet(dir)
    val q = EventStreams.streamingDedup(
      spark.readStream.schema(schema).parquet(dir), Seq("event_id"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    // second batch: one re-delivery of key 2, one new key
    Seq((2L, ts(5)), (3L, ts(6))).toDF("event_id", "ts")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("windowed CMS sketch: stream grid == batch grid across micro-batch splits") {
    val batchEvents = Tables.events(spark, sfDir)
      .select($"ts", $"event_type").cache()
    val dir = Files.createTempDirectory("graft-cms-in").toString
    // two parquet appends -> at least two micro-batches. The split is
    // by EVENT TIME (a replay in arrival order): batch 1's watermark
    // advances to splitTs - 2h, so batch 2's events (ts >= splitTs)
    // are never late — a key-based split would feed half the events
    // in behind the watermark and lose them
    val splitTs = batchEvents
      .agg(expr("percentile_approx(cast(ts AS double), 0.5D)")).head().getDouble(0)
    val (lo, hi) = (batchEvents.filter($"ts".cast("double") < splitTs),
      batchEvents.filter($"ts".cast("double") >= splitTs))
    lo.write.mode("append").parquet(dir)

    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = EventStreams.windowedKeySketch(streamIn, "ts", "event_type")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cms_out").start()
    q.processAllAvailable()
    hi.write.mode("append").parquet(dir)
    q.processAllAvailable()
    val maxTs = batchEvents.agg(max($"ts")).head().getTimestamp(0)
    Seq((new Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000), "sentinel"))
      .toDF("ts", "event_type").write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val batch = EventStreams.windowedKeySketch(batchEvents, "ts", "event_type")
    val streamed = spark.table("cms_out")
    // drop the sentinel's window (it contains only the sentinel)
    val realWindows = batch.select($"hour_start").collect().map(_.getTimestamp(0)).toSet
    val streamReal = streamed.filter($"hour_start".isInCollection(realWindows))
    assert(streamReal.count() == batch.count() && batch.count() > 0)
    assert(streamReal.exceptAll(batch).count() == 0, "stream grid != batch grid")

    // the emitted grids are probe-able: estimate >= exact per window
    val exact = batchEvents
      .groupBy(window($"ts", "1 hour"), $"event_type").count()
      .select($"window.start".as("hour_start"), $"event_type", $"count")
    val probed = exact.join(batch, Seq("hour_start"))
      .select($"count",
        graft.functions.CountMinSketch.probe($"sketch", $"event_type").as("est"))
      .collect()
    assert(probed.nonEmpty && probed.forall(r => r.getLong(1) >= r.getLong(0)),
      "CMS probe undercounted inside a window")
  }

  test("windowedTopK: rank-on-read over streamed grids == over batch grids") {
    val batchEvents = Tables.events(spark, sfDir)
      .select($"ts", $"event_type").cache()
    val dir = Files.createTempDirectory("graft-cmstopk-in").toString
    val splitTs = batchEvents
      .agg(expr("percentile_approx(cast(ts AS double), 0.5D)")).head().getDouble(0)
    val (lo, hi) = (batchEvents.filter($"ts".cast("double") < splitTs),
      batchEvents.filter($"ts".cast("double") >= splitTs))
    lo.write.mode("append").parquet(dir)
    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = EventStreams.windowedKeySketch(streamIn, "ts", "event_type")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cmstopk_out").start()
    q.processAllAvailable()
    hi.write.mode("append").parquet(dir)
    q.processAllAvailable()
    val maxTs = batchEvents.agg(max($"ts")).head().getTimestamp(0)
    Seq((new Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000), "sentinel"))
      .toDF("ts", "event_type").write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val candidates = batchEvents.select($"event_type").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val batchGrids = EventStreams.windowedKeySketch(batchEvents, "ts", "event_type")
    val realWindows = batchGrids.select($"hour_start").collect()
      .map(_.getTimestamp(0)).toSet
    val streamGrids = spark.table("cmstopk_out")
      .filter($"hour_start".isInCollection(realWindows))

    val fromStream = EventStreams.windowedTopK(streamGrids, candidates, k = 3)
    val fromBatch = EventStreams.windowedTopK(batchGrids, candidates, k = 3)
    assert(fromBatch.count() > 0)
    assert(fromStream.exceptAll(fromBatch).count() == 0 &&
      fromBatch.exceptAll(fromStream).count() == 0,
      "rank-on-read must not depend on where micro-batch boundaries fell")

    // heavy-hitter guarantee per window: a candidate whose EXACT
    // in-window count beats the k-th largest estimate must be ranked
    val exact = batchEvents
      .groupBy(window($"ts", "1 hour"), $"event_type").count()
      .select($"window.start".as("hour_start"),
        $"event_type".as("key"), $"count".as("exact_cnt"))
    val kth = fromBatch.groupBy($"hour_start").agg(min($"est_cnt").as("kth_est"))
    val mustAppear = exact.join(kth, "hour_start")
      .filter($"exact_cnt" > $"kth_est")
      .select($"hour_start", $"key")
    assert(mustAppear.join(fromBatch, Seq("hour_start", "key"), "left_anti")
      .count() == 0,
      "a key with exact count above the k-th estimate was missing from top-k")
  }

  test("windowed KMV sketch: stream == batch across splits AND re-deliveries") {
    val batchEvents = Tables.events(spark, sfDir)
      .select($"ts", $"user_id").cache()
    val dir = Files.createTempDirectory("graft-kmv-in").toString
    val splitTs = batchEvents
      .agg(expr("percentile_approx(cast(ts AS double), 0.5D)")).head().getDouble(0)
    val (lo, hi) = (batchEvents.filter($"ts".cast("double") < splitTs),
      batchEvents.filter($"ts".cast("double") >= splitTs))
    lo.write.mode("append").parquet(dir)

    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = EventStreams.windowedDistinctSketch(streamIn, "ts", "user_id")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("kmv_out").start()
    q.processAllAvailable()
    // re-deliver the first half wholesale: unlike the CMS grid, the
    // KMV sketch must be IDEMPOTENT under at-least-once delivery —
    // duplicate hashes change nothing, so stream must still == batch
    lo.write.mode("append").parquet(dir)
    q.processAllAvailable()
    hi.write.mode("append").parquet(dir)
    q.processAllAvailable()
    val maxTs = batchEvents.agg(max($"ts")).head().getTimestamp(0)
    Seq((new Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000), 999999L))
      .toDF("ts", "user_id").write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val batch = EventStreams.windowedDistinctSketch(batchEvents, "ts", "user_id")
    val streamed = spark.table("kmv_out")
    val realWindows = batch.select($"hour_start").collect().map(_.getTimestamp(0)).toSet
    val streamReal = streamed.filter($"hour_start".isInCollection(realWindows))
    assert(streamReal.count() == batch.count() && batch.count() > 0)
    assert(streamReal.exceptAll(batch).count() == 0,
      "stream KMV sketch != batch sketch")

    // estimate semantics per window: exact while unsaturated, within
    // 3 sigma of the true distinct count once the sketch is full
    val k = graft.functions.MinKSketch.K
    val exact = batchEvents
      .groupBy(window($"ts", "1 hour")).agg(countDistinct($"user_id").as("nd"))
      .select($"window.start".as("hour_start"), $"nd")
    val rows = exact.join(batch, Seq("hour_start"))
      .select($"nd", size($"sketch").as("sz"), $"est_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, sz, est) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      if (sz < k) assert(est == nd.toDouble, s"unsaturated window must be exact: $nd vs $est")
      else assert(math.abs(est - nd) / nd <= 3.0 / math.sqrt(k - 2),
        s"saturated window estimate $est too far from $nd")
    }
  }

  test("windowed weighted reservoir: stream == batch == window-function sample") {
    val batchEvents = Tables.events(spark, sfDir)
      .select($"ts", $"event_id", $"value").cache()
    val dir = Files.createTempDirectory("graft-res-in").toString
    val splitTs = batchEvents
      .agg(expr("percentile_approx(cast(ts AS double), 0.5D)")).head().getDouble(0)
    val (lo, hi) = (batchEvents.filter($"ts".cast("double") < splitTs),
      batchEvents.filter($"ts".cast("double") >= splitTs))
    lo.write.mode("append").parquet(dir)

    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = EventStreams.windowedWeightedSample(streamIn, "ts", "event_id", "value")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("res_out").start()
    q.processAllAvailable()
    // wholesale re-delivery: re-sent events carry the same
    // deterministic sample key, so the reservoir must not move
    lo.write.mode("append").parquet(dir)
    q.processAllAvailable()
    hi.write.mode("append").parquet(dir)
    q.processAllAvailable()
    val maxTs = batchEvents.agg(max($"ts")).head().getTimestamp(0)
    Seq((new Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000), 999999L, 1.0))
      .toDF("ts", "event_id", "value").write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val batch = EventStreams.windowedWeightedSample(batchEvents, "ts", "event_id", "value")
    val streamed = spark.table("res_out")
    val realWindows = batch.select($"hour_start").collect().map(_.getTimestamp(0)).toSet
    val streamReal = streamed.filter($"hour_start".isInCollection(realWindows))
    assert(streamReal.count() == batch.count() && batch.count() > 0)
    assert(streamReal.exceptAll(batch).count() == 0,
      "stream reservoir != batch reservoir")

    // independent cross-check: the UDAF reservoir must equal the
    // window-function sample over the same hour grouping
    val viaOperator = graft.operators.WeightedSample
      .samplePerGroup(
        batchEvents.withColumn("hour_start", date_trunc("hour", $"ts")),
        "hour_start", "event_id", "value", k = 10)
      .select($"hour_start", $"samp_key", $"event_id".cast("long").as("id"))
    val viaUdaf = batch.select($"hour_start", explode($"sample").as("s"))
      .select($"hour_start", $"s._1".as("samp_key"), $"s._2".as("id"))
    assert(viaUdaf.count() == viaOperator.count())
    assert(viaUdaf.exceptAll(viaOperator).count() == 0,
      "UDAF reservoir disagrees with the window-function sample")
  }

  test("stream-stream interval join (click attribution) == batch join") {
    val t0 = Timestamp.valueOf("2024-06-01 00:00:00").getTime
    def ts(min: Long): Timestamp = new Timestamp(t0 + min * 60000L)
    val viewsDir = Files.createTempDirectory("graft-views-in").toString
    val clicksDir = Files.createTempDirectory("graft-clicks-in").toString

    val views = Seq(
      (1L, 100L, ts(0)), (2L, 200L, ts(0)), (2L, 201L, ts(5)))
      .toDF("user_id", "event_id", "ts")
    val clicks = Seq(
      (1L, 110L, ts(10)), // matches view 100
      (1L, 111L, ts(50)), // outside the 30-min horizon -> no match
      (2L, 210L, ts(20)), // matches views 200 and 201
      (3L, 310L, ts(0))) // no view at all
      .toDF("user_id", "event_id", "ts")
    views.write.mode("overwrite").parquet(viewsDir)
    clicks.write.mode("overwrite").parquet(clicksDir)

    val q = EventStreams.clickAttribution(
      spark.readStream.schema(views.schema).parquet(viewsDir),
      spark.readStream.schema(clicks.schema).parquet(clicksDir))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attrib_out").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("attrib_out")
      .select($"user_id", $"click_id", $"view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(streamed == Seq((1L, 110L, 100L), (2L, 210L, 200L), (2L, 210L, 201L)))

    val batch = EventStreams.clickAttribution(views, clicks)
      .select($"user_id", $"click_id", $"view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(batch == streamed, "stream-stream join diverged from the batch join")
  }

  test("flatMapGroupsWithState sessionization: gap closes sessions, timeout closes idle ones") {
    val t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ts(min: Long): Timestamp = new Timestamp(t0 + min * 60000L)

    val dir = Files.createTempDirectory("graft-sess-in").toString
    val batch1 = Seq(
      Ev(10L, ts(0), 1.0), Ev(10L, ts(10), 2.0), Ev(10L, ts(45), 5.0),
      Ev(20L, ts(0), 7.0))
    val batch2 = Seq(Ev(10L, ts(14400), 9.0)) // +10 days: watermark jump

    batch1.toDS().write.mode("append").parquet(dir)
    val streamIn = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
      .parquet(dir).as[Ev]
    val q = EventStreams.sessionize(streamIn).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_out")
      .start()
    q.processAllAvailable()
    batch2.toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_out").as[Session].collect()
      .sortBy(s => (s.user_id, s.session_id))

    // user 10: [0,10] closed by the 35-min gap; [45] closed by event-time
    // timeout after the watermark jump; the far-future event stays open.
    // user 20: single event closed by timeout.
    assert(out.map(s => (s.user_id, s.session_id, s.n_events, s.session_value)).toSeq ==
      Seq((10L, 1L, 2L, 3.0), (10L, 2L, 1L, 5.0), (20L, 1L, 1L, 7.0)))
    val s1 = out.head
    assert(s1.start_ts == ts(0) && s1.end_ts == ts(10))
  }
}
