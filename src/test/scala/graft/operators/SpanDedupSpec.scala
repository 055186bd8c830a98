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

  test("scrubSpans removes every occurrence of the shared passage, keeps unique text") {
    val out = SpanDedup.scrubSpans(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1: spans at pos 0,1 cover tokens 0..5 (the 6-token passage)
    assert(out(1L) == ((11L, 6L, "over every lazy dog nearby")), s"doc 1: ${out(1L)}")
    // doc 2: spans at pos 5,6 cover tokens 5..10
    assert(out(2L) == ((12L, 6L, "intro words first then soon afterwards")), s"doc 2: ${out(2L)}")
    // doc 3: untouched, canonical whitespace == original
    assert(out(3L) == ((10L, 0L,
      "completely different tokens nothing shared with any other document here")), s"doc 3: ${out(3L)}")
  }

  test("scrubSpans: intra-doc repetition is not scrubbed; irregular whitespace canonicalizes") {
    val selfRep = Seq(
      10L -> "alpha beta gamma delta eps alpha beta gamma delta eps",
      11L -> "  zeta   eta\ttheta iota kappa lambda mu nu xi omicron ").toDF("doc_id", "text")
    val out = SpanDedup.scrubSpans(selfRep, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(10L) == ((0L, "alpha beta gamma delta eps alpha beta gamma delta eps")))
    // untouched docs still come back whitespace-canonicalized (rebuilt
    // from the token stream, the operator's documented contract)
    assert(out(11L) == ((0L, "zeta eta theta iota kappa lambda mu nu xi omicron")))
  }

  test("scrubSpans: a short doc's whole-text span claims n slots but removes only real tokens") {
    val shorts = Seq(
      20L -> "tiny shared doc",
      21L -> "tiny shared doc",
      22L -> "some other words").toDF("doc_id", "text")
    val out = SpanDedup.scrubSpans(shorts, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the single span at pos 0 covers positions 0..4, but only 3 exist:
    // n_removed must be 3 (phantom slots ignored), kept_text empty
    assert(out(20L) == ((3L, 3L, "")), s"doc 20: ${out(20L)}")
    assert(out(21L) == ((3L, 3L, "")), s"doc 21: ${out(21L)}")
    assert(out(22L) == ((3L, 0L, "some other words")), s"doc 22: ${out(22L)}")
  }

  test("scrub_tokens kernel == declarative filter/join composition") {
    import org.apache.spark.sql.functions._
    val frame = Seq(
      ("a b c d e f g", Seq(0L, 2L, 6L, 99L)),
      ("  x   y  z ", Seq(1L)),
      ("solo", Seq.empty[Long]),
      ("", Seq(0L))).toDF("text", "cps")
    val kernel = frame.select(
      graft.functions.exprs.scrub_tokens(col("text"), col("cps")).as("sc"))
      .select(col("sc.n_tok"), col("sc.n_removed"), col("sc.kept_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val decl = frame.select(
      graft.functions.TextFunctions.wsTokens(col("text")).as("toks"), col("cps"))
      .select(
        size(col("toks")).cast("long").as("n_tok"),
        size(filter(col("cps"), p => p >= 0 && p < size(col("toks")))).cast("long").as("n_removed"),
        array_join(zip_with(col("toks"),
          sequence(lit(0L), greatest(size(col("toks")).cast("long") - 1, lit(0L))),
          (t, i) => when(array_contains(col("cps"), i), lit(null)).otherwise(t)), " ").as("kept_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(kernel.toSeq == decl.toSeq, s"kernel $kernel vs declarative $decl")
  }

  test("dropSpanDuplicated enforces the dup_frac budget") {
    // budget 0.25: doc 1 at 2/7 ≈ 0.2857 and doc 2 at 2/8 = 0.25 —
    // strictly-over is dropped, exactly-at survives
    val kept = SpanDedup.dropSpanDuplicated(docs, "doc_id", "text", maxDupFrac = 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"expected 2/7 > 0.25 to drop only doc 1, got $kept")
  }
}
