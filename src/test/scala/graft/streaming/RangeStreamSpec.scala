package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables
import graft.queries.Registry

/** Streaming range-join counts == batch q57, across micro-batch
  * splits: the stream-stream interval join + downstream aggregation
  * must emit each error's prior-window census exactly once, including
  * zero-match errors (left-outer null rows emitted on watermark).
  */
class RangeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("event_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value",
      org.apache.spark.sql.types.DoubleType)))

  test("stream == batch q57 on the real events table, split in two micro-batches") {
    val dir = Files.createTempDirectory("range-in").toString
    val evs = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"event_type", $"value").cache()
    val mid = new Timestamp(
      evs.select(percentile_approx($"ts", lit(0.5), lit(1000))).head()
        .getTimestamp(0).getTime)
    evs.filter($"ts" <= lit(mid)).write.mode("append").parquet(dir)

    val in = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.streamingRangeCounts(
      in.filter($"event_type" === "error"), in)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("range_real").start()
    q.processAllAvailable()
    evs.filter($"ts" > lit(mid)).write.mode("append").parquet(dir)
    q.processAllAvailable()
    // far-future kicker advances both sides' watermarks so the join
    // buffer drains and every aggregation window closes. It must pass
    // the LEFT side's error filter too: the global watermark is the
    // MIN of both sides', so a kicker visible only to the right side
    // leaves the last errors' windows unclosed
    Seq((-1L, Timestamp.valueOf("2030-01-01 00:00:00"), "error", 0.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("range_real").filter($"event_id" =!= -1L)
    val batch = Registry.byName("q57_range_join").run(spark, sfDir)
    assert(got.count() > 0 && got.count() == batch.count(),
      s"row counts: stream ${got.count()} vs batch ${batch.count()}")
    assert(got.exceptAll(batch).count() == 0, "streamed rows not in batch")
    assert(batch.exceptAll(got).count() == 0, "batch rows missing from stream")
  }
}
