package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables
import graft.queries.Registry
import graft.streaming.EventStreams.{PitEv, PitRow}

/** Streaming point-in-time features == batch q59, across micro-batch
  * splits: the fused sessionize+as-of state machine must emit every
  * purchase with exactly the batch's feature row — the last session
  * that ended strictly before it, never its own.
  */
class PitStreamSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = implicitly[org.apache.spark.sql.Encoder[PitEv]].schema

  test("stream == batch q59 on the real events table, split in two micro-batches") {
    val dir = Files.createTempDirectory("pit-in").toString
    val evs = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id",
        ($"event_type" === "purchase").as("is_label"), $"value")
      .as[PitEv].cache()
    val mid = new Timestamp(
      evs.select(percentile_approx($"ts", lit(0.5), lit(1000))).head()
        .getTimestamp(0).getTime)
    evs.filter($"ts" <= lit(mid)).write.mode("append").parquet(dir)

    val in = spark.readStream.schema(evSchema).parquet(dir).as[PitEv]
    val q = EventStreams.streamingPitFeatures(in)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("pit_real").start()
    q.processAllAvailable()
    evs.filter($"ts" > lit(mid)).write.mode("append").parquet(dir)
    q.processAllAvailable()
    Seq(PitEv(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, false, 0.0))
      .toDS().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("pit_real").as[PitRow]
      .filter($"user_id" =!= -1L)
      .select($"event_id", $"user_id", $"label_cents",
        $"feat_n_events", $"feat_value_cents", $"staleness_us")
    val batch = Registry.byName("q59_pit_features").run(spark, sfDir)
      .select($"event_id", $"user_id", $"label_cents",
        $"feat_n_events", $"feat_value_cents", $"staleness_us")
    assert(got.count() > 0 && got.count() == batch.count(),
      s"row counts: stream ${got.count()} vs batch ${batch.count()}")
    assert(got.exceptAll(batch).count() == 0, "streamed rows not in batch")
    assert(batch.exceptAll(got).count() == 0, "batch rows missing from stream")
  }
}
