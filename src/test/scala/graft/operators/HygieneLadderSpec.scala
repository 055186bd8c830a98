package graft.operators

import graft.SparkSpec

/** Capstone composition test: the full data-hygiene ladder a
  * pretraining pipeline runs, chained through the operator APIs on a
  * planted corpus where every stage has exactly one victim —
  *
  *   normalize (t19, FIRST — so every later gate sees canonical text)
  *     → exactDedup → dropNearDuplicates → dropSpanDuplicated
  *     → removeContaminatedBloom → dropRepetitive
  *     → QualityClassifier train/score gate → packDocuments
  *
  * proving the operators compose (column contracts line up, full rows
  * survive each anti-join) and each stage drops only its own victim.
  * The span victim copies a 10-token run from a survivor but is short,
  * so ITS duplicated fraction blows the budget while the survivor's
  * stays under it; their Jaccard (~0.15) is far below the near-dedup
  * threshold, so only the span stage can see the overlap.
  */
class HygieneLadderSpec extends SparkSpec {
  import spark.implicits._

  // survivors carry 10 in-domain function words (DIFFERENT orderings,
  // so no 5-token run is shared across docs and the span stage stays
  // blind to them) — the classifier stage needs real vocabulary to
  // judge; a purely synthetic w*/z* doc is out-of-vocabulary noise to
  // any trained model, which is a property of classifiers, not a bug
  private val tailA = "the of and a to is in it that an"
  private val tailC = "it is that the an a in to and of"
  private val baseA = ((1 to 30).map(i => s"w$i") :+ tailA).mkString(" ")
  private val nearA = (((1 to 29).map(i => s"w$i") :+ "wX") :+ tailA).mkString(" ")
  private val benchText = "the secret eval answer is forty two"
  private val clean = ((1 to 30).map(i => s"z$i") :+ tailC).mkString(" ")
  // 10 tokens copied from `clean` + 5 unique: 11 spans, 6 duplicated
  // (0.545 > budget); `clean` itself: 6 of 36 (0.167 ≤ budget)
  private val spanLeech =
    ((1 to 10).map(i => s"z$i") ++ (1 to 5).map(i => s"y$i")).mkString(" ")

  // 11 unique tokens: short docs trip the top-2gram bound at < 10
  // tokens (2/n > 0.2), and this stage must NOT be the one to drop it
  private val boiler =
    "click here subscribe now buy discount offer banner deal newsletter register"

  private val corpus = Seq(
    1L -> baseA, // survives: cluster representative
    // exact duplicate of 1 — but ONLY once normalized: a BOM, a BEL
    // control and a trailing space hide the duplication from raw dedup
    2L -> s"\uFEFF$baseA\u0007 ",
    3L -> nearA, // near-duplicate of 1
    4L -> s"intro words then $benchText and trailing context here now", // contaminated
    5L -> "spam spam spam spam spam spam", // repetitive (intra-doc only)
    6L -> clean, // survives
    7L -> spanLeech, // mostly text seen elsewhere in the corpus
    8L -> boiler // boilerplate: only the trained classifier can see it
  ).toDF("doc_id", "text")

  private val bench = Seq(100L -> benchText).toDF("doc_id", "text")

  // curated reference set for the classifier stage (the
  // distant-supervision shape: train on labeled reference, score the
  // pipeline corpus) — junk shares doc 8's vocabulary, clean does not
  private val reference = Seq(
    (1000L, "the quick fox ran over the quiet hill and it was gone", 1),
    (1001L, "a long winter is coming to the valley and the river froze", 1),
    (1002L, "it is a truth that the garden grows in the warm light", 1),
    (1003L, "click here subscribe now buy buy discount offer click banner", 0),
    (1004L, "cookie policy accept decline cookie settings privacy banner", 0),
    (1005L, "sign up login register newsletter subscribe click here deal", 0)
  ).toDF("doc_id", "text", "label")

  test("each ladder stage drops exactly its victim; survivors pack losslessly") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    // stage 0 — normalization runs FIRST: doc 2 is doc 1 plus a BOM, a
    // bell control and a trailing space; no dedup stage could see the
    // duplication through the mojibake, every stage sees it after
    val s0 = corpus.withColumn("text",
      graft.functions.exprs.normalize_text($"text"))
    assert(s0.filter($"doc_id" === 2L).head().getString(1) == baseA,
      "normalization must make doc 2 byte-identical to doc 1")

    val s1 = TextDedup.exactDedup(s0, "doc_id", "text")
    assert(ids(s1) == Set(1L, 3L, 4L, 5L, 6L, 7L, 8L), "exactDedup drops only the exact copy")

    val s2 = TextDedup.dropNearDuplicates(s1, "doc_id", "text")
    assert(ids(s2) == Set(1L, 4L, 5L, 6L, 7L, 8L), "near-dedup drops only the near copy")

    val s3 = SpanDedup.dropSpanDuplicated(s2, "doc_id", "text", maxDupFrac = 0.3)
    assert(ids(s3) == Set(1L, 4L, 5L, 6L, 8L),
      "span budget drops only the leech; the lender stays under budget")

    val s4 = Decontaminate.removeContaminatedBloom(s3, bench, "doc_id", "text")
    assert(ids(s4) == Set(1L, 5L, 6L, 8L), "decontamination drops only the benchmark overlap")

    val s5 = RepetitionFilter.dropRepetitive(s4, "doc_id", "text")
    assert(ids(s5) == Set(1L, 6L, 8L), "repetition filter drops only the looping doc")

    // model-based gate: train on the labeled reference, score the
    // pipeline survivors, keep prob_pos >= 0.5 — only the boilerplate
    // doc (vocabulary shared with the reference's junk class) falls
    val model = QualityClassifier.train(reference, "doc_id", "text", "label")
    val scored = s5.join(
      QualityClassifier.score(s5, "doc_id", "text", model), Seq("doc_id"))
    val s6 = scored.filter($"prob_pos" >= 0.5).drop("logit", "prob_pos")
    assert(ids(s6) == Set(1L, 6L),
      "classifier gate drops only the boilerplate doc: " +
        scored.select($"doc_id", $"prob_pos").collect().mkString(", "))

    val packed = SeqPacking.packDocuments(s6, capacity = 64L, nBuckets = 2)
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // pmod buckets: doc 1 -> bucket 1, doc 6 -> bucket 0; 40 tokens each,
    // first bin of its bucket
    assert(rows == Set((1L, 1L, 1L, 40L), (6L, 0L, 1L, 40L)),
      s"every survivor packs exactly once with its token count, got $rows")
  }
}
