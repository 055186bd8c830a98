package graft.operators

import graft.SparkSpec

/** Planted-corpus semantics for the repetition filter: a looping doc
  * ("spam" × 6) has top-2-gram coverage 2·5/6 and EVERY 5-gram
  * position duplicated; a varied doc has no repeated 5-gram and its
  * best 2-gram covers 2 of n tokens.
  */
class RepetitionFilterSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    1L -> "spam spam spam spam spam spam",
    2L -> "one two three four five six seven eight nine ten").toDF("doc_id", "text")

  test("repetitionStats: looping doc saturates both fractions, varied doc stays low") {
    val stats = RepetitionFilter.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // doc 1: "spam spam" occurs 5×, 6 tokens -> 2*5/6 = 1.6667; both
    // 5-gram positions hold the same 5-gram -> dup frac 1.0
    assert(stats(1L) == (1.6667, 1.0), s"looping doc: ${stats(1L)}")
    // doc 2: all tokens distinct -> best 2-gram covers 2/10; 6 distinct
    // 5-grams -> dup frac 0.0
    assert(stats(2L) == (0.2, 0.0), s"varied doc: ${stats(2L)}")
  }

  test("dropRepetitive removes the looping doc at the published thresholds") {
    val kept = RepetitionFilter.dropRepetitive(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), s"expected only the varied doc to survive, got $kept")
  }

  test("ngram_rep_stats kernel == explode-groupBy reference on a real corpus") {
    val corpus = graft.core.Tables.documents(spark, sfDir)
      .unionByName(docs.selectExpr("doc_id + 100000 AS doc_id", "text",
        "NULL AS lang", "NULL AS source", "length(text) AS n_chars"))
      // NULL text must be DROPPED by both paths (the explode reference
      // and the DuckDB oracle produce no gram rows for it)
      .unionByName(spark.range(1).selectExpr("200000 AS doc_id",
        "CAST(NULL AS STRING) AS text", "NULL AS lang", "NULL AS source",
        "0 AS n_chars"))
    def collectStats(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val kernel = collectStats(
      RepetitionFilter.repetitionStats(corpus, "doc_id", "text"))
    val ref = collectStats(
      RepetitionFilter.repetitionStatsViaAggregation(corpus, "doc_id", "text"))
    assert(!kernel.contains(200000L), "NULL-text doc must be dropped")
    assert(kernel == ref,
      s"kernel and reference disagree on ${kernel.keySet.union(ref.keySet).count(k => kernel.get(k) != ref.get(k))} docs")
  }
}
