package graft.queries

import java.sql.Timestamp

import graft.SparkSpec

/** q44 funnel: causal-order semantics on planted event sequences. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("stages count only when strictly after the previous stage's first hit") {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    Seq(
      // u1: full ordered funnel
      (1L, ts(1), 1L, "view", 1.0, "{}"),
      (2L, ts(2), 1L, "click", 1.0, "{}"),
      (3L, ts(3), 1L, "purchase", 1.0, "{}"),
      // u2: click BEFORE view -> not clicked; purchase after view but
      // with no qualifying click -> not purchased
      (4L, ts(1), 2L, "click", 1.0, "{}"),
      (5L, ts(2), 2L, "view", 1.0, "{}"),
      (6L, ts(3), 2L, "purchase", 1.0, "{}"),
      // u3: view then click, purchase BEFORE the click -> clicked only
      (7L, ts(1), 3L, "view", 1.0, "{}"),
      (8L, ts(2), 3L, "purchase", 1.0, "{}"),
      (9L, ts(3), 3L, "click", 1.0, "{}"),
      // u4: never views -> not in the funnel at all
      (10L, ts(1), 4L, "click", 1.0, "{}"),
      (11L, ts(2), 4L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventQueries.q44Funnel.run(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_entered") == 3)   // u1, u2, u3
    assert(r.getAs[Long]("n_clicked") == 2)   // u1, u3
    assert(r.getAs[Long]("n_purchased") == 1) // u1
    assert(r.getAs[Double]("click_rate") == 0.6667)
    assert(r.getAs[Double]("purchase_rate") == 0.3333)
  }
}
