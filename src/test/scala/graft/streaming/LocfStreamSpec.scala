package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables
import graft.queries.Registry
import graft.streaming.EventStreams.{LocfEv, LocfRow}

/** Streaming LOCF grid == batch q58, across micro-batch splits: the
  * timer-driven snapshot emitter must produce the identical
  * all-users × all-days matrix — including null rows for users whose
  * first event arrives after the grid start, and carried rows for
  * users long idle — given the batch-derived grid bounds.
  */
class LocfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = implicitly[org.apache.spark.sql.Encoder[LocfEv]].schema

  test("stream == batch q58 on the real events table, split in two micro-batches") {
    val dir = Files.createTempDirectory("locf-in").toString
    val evs = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id",
        ($"event_type" === "view").as("is_obs"), $"value")
      .as[LocfEv].cache()
    val b = Tables.events(spark, sfDir)
      .agg(unix_micros(date_trunc("day", min($"ts"))),
        unix_micros(date_trunc("day", max($"ts")))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val mid = new Timestamp(
      evs.select(percentile_approx($"ts", lit(0.5), lit(1000))).head()
        .getTimestamp(0).getTime)

    evs.filter($"ts" <= lit(mid)).write.mode("append").parquet(dir)
    val in = spark.readStream.schema(evSchema).parquet(dir).as[LocfEv]
    val q = EventStreams.streamingLocf(in, lo, hi, 86400000000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("locf_real").start()
    q.processAllAvailable()
    evs.filter($"ts" > lit(mid)).write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(LocfEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, false, 0.0))
      .toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("locf_real").as[LocfRow]
      .filter($"user_id" =!= -1L)
      .select($"user_id", $"day", $"obs_id", $"obs_value", $"staleness_hours")
    val batch = Registry.byName("q58_locf_gapfill").run(spark, sfDir)
      .select($"user_id", $"day", $"obs_id", $"obs_value", $"staleness_hours")
    assert(got.count() > 0 && got.count() == batch.count(),
      s"row counts: stream ${got.count()} vs batch ${batch.count()}")
    assert(got.exceptAll(batch).count() == 0, "streamed rows not in batch")
    assert(batch.exceptAll(got).count() == 0, "batch rows missing from stream")
  }

  test("a user first seen late backfills its earlier grid instants as nulls") {
    val t0 = Timestamp.valueOf("2024-05-01 00:00:00")
    def plusDays(d: Int, m: Int = 0) =
      new Timestamp(t0.getTime + d * 86400000L + m * 60000L)
    val lo = (t0.getTime / 1000L) * 1000000L
    val hi = lo + 4L * 86400000000L // 5-day grid
    val dir = Files.createTempDirectory("locf-late").toString
    // user 5's FIRST event (an observation) lands on day 3
    Seq(LocfEv(5L, plusDays(3, 30), 50L, true, 7.5)).toDS()
      .write.mode("append").parquet(dir)
    val in = spark.readStream.schema(evSchema).parquet(dir).as[LocfEv]
    val q = EventStreams.streamingLocf(in, lo, hi, 86400000000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("locf_late").start()
    q.processAllAvailable()
    Seq(LocfEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, false, 0.0))
      .toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("locf_late").as[LocfRow].collect()
      .filter(_.user_id == 5L).map(r => r.day -> r).toMap
    assert(got.size == 5, s"expected 5 grid rows, got ${got.keys.toSeq.sorted}")
    Seq("2024-05-01", "2024-05-02", "2024-05-03", "2024-05-04").foreach { d =>
      assert(got(d).obs_id.isEmpty, s"day $d should be a null backfill: ${got(d)}")
    }
    // day 5's instant (2024-05-05 00:00) is 23h30m after the obs at
    // 2024-05-04 00:30 -> floor 23
    assert(got("2024-05-05").obs_id.contains(50L) &&
      got("2024-05-05").staleness_hours.contains(23L),
      s"carried row wrong: ${got("2024-05-05")}")
  }
}
