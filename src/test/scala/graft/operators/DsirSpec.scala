package graft.operators

import graft.SparkSpec

/** DSIR importance weights on a planted corpus: documents sharing the
  * target domain's vocabulary must outscore documents that don't,
  * regardless of their own target flag — the property that makes the
  * weight a SELECTION signal rather than a label echo.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val targetish = "stir the sauce then bake the bread in the oven"
  private val corpus = Seq(
    (1L, "stir the sauce and bake the bread slowly", true),
    (2L, "whisk the sauce then bake fresh bread daily", true),
    (3L, targetish, false), // corpus doc, target vocabulary
    (4L, "compile the kernel and link the object files", false),
    (5L, "tax forms are due before the spring deadline", false),
    (6L, "word", false) // single token: no bigram, no evidence
  ).toDF("doc_id", "text", "is_tgt")

  private lazy val weights = Dsir
    .importanceWeights(corpus, "doc_id", "text", "is_tgt", buckets = 1024)
    .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("target-vocabulary docs outscore off-domain docs") {
    val lr = weights.view.mapValues(_._2).toMap
    assert(lr(3L) > lr(4L) && lr(3L) > lr(5L),
      s"doc 3 shares the target vocabulary and must outscore 4/5: $lr")
    assert(lr(1L) > lr(4L) && lr(2L) > lr(5L),
      s"actual target docs must outscore off-domain docs: $lr")
  }

  test("n_feats counts bigram occurrences; no-bigram docs emit nothing") {
    // doc 3: 10 tokens -> 9 bigrams
    assert(weights(3L)._1 == 9L, s"doc 3 bigram count: ${weights(3L)}")
    assert(!weights.contains(6L), "a single-token doc carries no evidence")
  }

  test("weights are deterministic across recomputation") {
    val again = Dsir
      .importanceWeights(corpus, "doc_id", "text", "is_tgt", buckets = 1024)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(again == weights)
  }
}
