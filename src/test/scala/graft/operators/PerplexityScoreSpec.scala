package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PerplexityScoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // Corpus-typical docs repeat the "a b" pattern; doc 9 is token soup
  // that shares the vocabulary but never the corpus's dominant bigrams.
  private val corpus = docs(
    1L -> "a b a b a b a b",
    2L -> "a b a b a b c d",
    3L -> "a b a b c d a b",
    9L -> "b c d a d c b a")

  test("corpus-typical text scores lower perplexity than token soup") {
    val lm = PerplexityScore.bigramLm(corpus, "doc_id", "text")
    val ppl = PerplexityScore.scorePerplexity(corpus, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(1L) < ppl(9L) && ppl(2L) < ppl(9L) && ppl(3L) < ppl(9L),
      s"the fluent-noise doc must score highest: $ppl")
  }

  test("conditional probabilities per context sum to ~1") {
    val lm = PerplexityScore.bigramLm(corpus, "doc_id", "text")
      .select(split($"bigram", " ").getItem(0).as("w1"), $"cond_p")
      .groupBy($"w1").agg(sum($"cond_p").as("tot"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    lm.foreach { case (w1, tot) =>
      assert(math.abs(tot - 1.0) < 1e-4, s"P(.|$w1) sums to $tot")
    }
  }

  test("documents without a bigram are absent; unseen bigrams take the floor") {
    val short = docs(5L -> "solo", 6L -> "x y")
    val lm = PerplexityScore.bigramLm(corpus, "doc_id", "text")
    val out = PerplexityScore
      .scorePerplexity(short, "doc_id", "text", lm, unseenFloor = 1e-6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.map(_._1) == Seq(6L), s"1-token doc must be absent, got $out")
    // every bigram of doc 6 is unseen -> ppl = 1 / floor
    assert(out.head._3 == 1e6, s"fully-unseen doc must score 1/floor, got $out")
  }
}
