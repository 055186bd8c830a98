package graft.operators

import graft.SparkSpec

/** Capstone composition test: the full data-hygiene ladder a
  * pretraining pipeline runs, chained through the operator APIs on a
  * planted corpus where every stage has exactly one victim —
  *
  *   exactDedup → dropNearDuplicates → dropSpanDuplicated
  *     → removeContaminatedBloom → dropRepetitive → packDocuments
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

  private val baseA = (1 to 40).map(i => s"w$i").mkString(" ")
  private val nearA = ((1 to 39).map(i => s"w$i") :+ "wX").mkString(" ")
  private val benchText = "the secret eval answer is forty two"
  private val clean = (1 to 40).map(i => s"z$i").mkString(" ")
  // 10 tokens copied from `clean` + 5 unique: 11 spans, 6 duplicated
  // (0.545 > budget); `clean` itself: 6 of 36 (0.167 ≤ budget)
  private val spanLeech =
    ((1 to 10).map(i => s"z$i") ++ (1 to 5).map(i => s"y$i")).mkString(" ")

  private val corpus = Seq(
    1L -> baseA, // survives: cluster representative
    2L -> baseA, // exact duplicate of 1
    3L -> nearA, // near-duplicate of 1
    4L -> s"intro words then $benchText and trailing context here now", // contaminated
    5L -> "spam spam spam spam spam spam", // repetitive (intra-doc only)
    6L -> clean, // survives
    7L -> spanLeech // mostly text seen elsewhere in the corpus
  ).toDF("doc_id", "text")

  private val bench = Seq(100L -> benchText).toDF("doc_id", "text")

  test("each ladder stage drops exactly its victim; survivors pack losslessly") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    val s1 = TextDedup.exactDedup(corpus, "doc_id", "text")
    assert(ids(s1) == Set(1L, 3L, 4L, 5L, 6L, 7L), "exactDedup drops only the exact copy")

    val s2 = TextDedup.dropNearDuplicates(s1, "doc_id", "text")
    assert(ids(s2) == Set(1L, 4L, 5L, 6L, 7L), "near-dedup drops only the near copy")

    val s3 = SpanDedup.dropSpanDuplicated(s2, "doc_id", "text", maxDupFrac = 0.3)
    assert(ids(s3) == Set(1L, 4L, 5L, 6L),
      "span budget drops only the leech; the lender stays under budget")

    val s4 = Decontaminate.removeContaminatedBloom(s3, bench, "doc_id", "text")
    assert(ids(s4) == Set(1L, 5L, 6L), "decontamination drops only the benchmark overlap")

    val s5 = RepetitionFilter.dropRepetitive(s4, "doc_id", "text")
    assert(ids(s5) == Set(1L, 6L), "repetition filter drops only the looping doc")

    val packed = SeqPacking.packDocuments(s5, capacity = 64L, nBuckets = 2)
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // pmod buckets: doc 1 -> bucket 1, doc 6 -> bucket 0; 40 tokens each,
    // first bin of its bucket
    assert(rows == Set((1L, 1L, 1L, 40L), (6L, 0L, 1L, 40L)),
      s"every survivor packs exactly once with its token count, got $rows")
  }
}
