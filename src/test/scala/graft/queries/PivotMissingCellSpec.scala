package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** q22 regression: a user missing one of the pivoted event types must
  * get 0.0 (the oracle's CASE semantics), not the NULL PivotFirst
  * emits. The harness corpus happens to have every (user, type) cell
  * populated, so this spec builds one that doesn't.
  */
class PivotMissingCellSpec extends SparkSpec {
  import spark.implicits._

  test("pivot fills absent (user, event_type) cells with 0.0") {
    val dir = Files.createTempDirectory("graft-pivot").toString
    // user 1 has only clicks; user 2 has click+error
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "click", 5.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "click", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 2L, "error", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val rows = Registry.byName("q22_pivot").run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val u1 = rows(1L)
    // schema: user_id, click, error, purchase, signup, view
    assert(u1.getDouble(1) == 5.0)
    (2 to 5).foreach(i => assert(u1.getDouble(i) == 0.0,
      s"absent cell must be 0.0, got ${u1.get(i)} at $i"))
    val u2 = rows(2L)
    assert(u2.getDouble(1) == 1.0 && u2.getDouble(2) == 2.0 && u2.getDouble(3) == 0.0)
  }
}
