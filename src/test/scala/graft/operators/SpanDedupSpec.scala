package graft.operators

import graft.SparkSpec

/** Semantics of cross-document span dedup on a planted corpus: docs 1
  * and 2 share the verbatim 6-token passage "the quick brown fox jumps
  * high" (two 5-token spans); doc 3 shares nothing. A span is
  * duplicated iff it occurs in ≥ 2 distinct documents — repetition
  * INSIDE one doc must not count.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    1L -> "the quick brown fox jumps high over every lazy dog nearby",
    2L -> "intro words first then soon the quick brown fox jumps high afterwards",
    3L -> "completely different tokens nothing shared with any other document here").toDF("doc_id", "text")

  test("spanStats marks exactly the shared spans, per distinct doc") {
    val stats = SpanDedup.spanStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 11/12/10-token docs → 7/8/6 distinct 5-grams; the shared 6-token
    // passage contributes 2 duplicated spans to each sharer
    assert(stats(1L) == ((7L, 2L)), s"doc 1: ${stats(1L)}")
    assert(stats(2L) == ((8L, 2L)), s"doc 2: ${stats(2L)}")
    assert(stats(3L) == ((6L, 0L)), s"doc 3 shares nothing: ${stats(3L)}")
  }

  test("intra-document repetition alone is not a duplicated span") {
    val selfRep = Seq(
      10L -> "alpha beta gamma delta eps alpha beta gamma delta eps",
      11L -> "zeta eta theta iota kappa lambda mu nu xi omicron").toDF("doc_id", "text")
    val dup = SpanDedup.spanStats(selfRep, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dup == Map(10L -> 0L, 11L -> 0L),
      s"a span repeated within one doc occurs in 1 distinct doc: $dup")
  }

  test("dropSpanDuplicated enforces the dup_frac budget") {
    // budget 0.25: doc 1 at 2/7 ≈ 0.2857 and doc 2 at 2/8 = 0.25 —
    // strictly-over is dropped, exactly-at survives
    val kept = SpanDedup.dropSpanDuplicated(docs, "doc_id", "text", maxDupFrac = 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"expected 2/7 > 0.25 to drop only doc 1, got $kept")
  }
}
