package graft.pipeline

import graft.SparkSpec

/** K-family extension: MERGE INTO (upsert) semantics on the parquet
  * sink — matched keys replaced, unmatched target rows survive,
  * unmatched updates insert; idempotent under re-delivery (the CDC
  * replay property).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(table: String): Set[(Long, String)] =
    spark.table(table).collect()
      .map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v"))))
      .toSet

  test("merge creates the table when absent, then upserts: replace, survive, insert") {
    val t = "graft_merge_test"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    TableSink.merge(Seq(1L -> "a", 2L -> "b").toDF("k", "v"), t, Seq("k"))
    assert(rows(t) == Set(1L -> "a", 2L -> "b"))

    TableSink.merge(Seq(2L -> "B", 3L -> "C").toDF("k", "v"), t, Seq("k"))
    assert(rows(t) == Set(1L -> "a", 2L -> "B", 3L -> "C"),
      "matched key must be replaced, unmatched target row must survive, new key must insert")
  }

  test("merge is idempotent under update re-delivery") {
    val t = "graft_merge_idem"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    TableSink.merge(Seq(1L -> "a", 2L -> "b").toDF("k", "v"), t, Seq("k"))
    val updates = Seq(2L -> "B", 3L -> "C").toDF("k", "v")
    TableSink.merge(updates, t, Seq("k"))
    val once = rows(t)
    TableSink.merge(updates, t, Seq("k"))
    assert(rows(t) == once, "replaying the same update batch must be a no-op")
  }

  test("merge rejects a duplicate-keyed update batch before touching the table") {
    val t = "graft_merge_dupkey"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    TableSink.merge(Seq(1L -> "a").toDF("k", "v"), t, Seq("k"))
    val dup = Seq(2L -> "first", 2L -> "second").toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      TableSink.merge(dup, t, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate key"),
      s"expected the unique-key contract failure, got: ${e.getMessage}")
    assert(rows(t) == Set(1L -> "a"),
      "a rejected batch must leave the table untouched")
  }

  test("merge works with a key column literally named 'count'") {
    val t = "graft_merge_countkey"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    TableSink.merge(Seq(1L -> "a").toDF("count", "v"), t, Seq("count"))
    TableSink.merge(Seq(1L -> "A", 2L -> "b").toDF("count", "v"), t, Seq("count"))
    val got = spark.table(t).collect()
      .map(r => (r.getLong(r.fieldIndex("count")), r.getString(r.fieldIndex("v")))).toSet
    assert(got == Set(1L -> "A", 2L -> "b"),
      "the dup-key guard must not clash with a key named 'count'")
  }

  test("merge with a composite key matches on ALL key columns") {
    val t = "graft_merge_composite"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val init = Seq((1L, "x", "old"), (1L, "y", "keep")).toDF("k", "k2", "v")
    TableSink.merge(init, t, Seq("k", "k2"))
    TableSink.merge(Seq((1L, "x", "new")).toDF("k", "k2", "v"), t, Seq("k", "k2"))
    val got = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "x", "new"), (1L, "y", "keep")),
      "only the fully-matching composite key row is replaced")
  }
}
