package graft.operators

import graft.SparkSpec

/** Capstone composition test: the full data-hygiene ladder a
  * pretraining pipeline runs, chained through the operator APIs on a
  * planted corpus where every stage has exactly one victim —
  *
  *   exactDedup → dropNearDuplicates → removeContaminated
  *     → dropRepetitive → packDocuments
  *
  * proving the operators compose (column contracts line up, full rows
  * survive each anti-join) and each stage drops only its own victim.
  */
class HygieneLadderSpec extends SparkSpec {
  import spark.implicits._

  private val baseA = (1 to 40).map(i => s"w$i").mkString(" ")
  private val nearA = ((1 to 39).map(i => s"w$i") :+ "wX").mkString(" ")
  private val benchText = "the secret eval answer is forty two"
  private val clean = (1 to 40).map(i => s"z$i").mkString(" ")

  private val corpus = Seq(
    1L -> baseA, // survives: cluster representative
    2L -> baseA, // exact duplicate of 1
    3L -> nearA, // near-duplicate of 1
    4L -> s"intro words then $benchText and trailing context here now", // contaminated
    5L -> "spam spam spam spam spam spam", // repetitive
    6L -> clean // survives
  ).toDF("doc_id", "text")

  private val bench = Seq(100L -> benchText).toDF("doc_id", "text")

  test("each ladder stage drops exactly its victim; survivors pack losslessly") {
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    val s1 = TextDedup.exactDedup(corpus, "doc_id", "text")
    assert(ids(s1) == Set(1L, 3L, 4L, 5L, 6L), "exactDedup drops only the exact copy")

    val s2 = TextDedup.dropNearDuplicates(s1, "doc_id", "text")
    assert(ids(s2) == Set(1L, 4L, 5L, 6L), "near-dedup drops only the near copy")

    val s3 = Decontaminate.removeContaminated(s2, bench, "doc_id", "text")
    assert(ids(s3) == Set(1L, 5L, 6L), "decontamination drops only the benchmark overlap")

    val s4 = RepetitionFilter.dropRepetitive(s3, "doc_id", "text")
    assert(ids(s4) == Set(1L, 6L), "repetition filter drops only the looping doc")

    val packed = SeqPacking.packDocuments(s4, capacity = 64L, nBuckets = 2)
    val rows = packed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // pmod buckets: doc 1 -> bucket 1, doc 6 -> bucket 0; 40 tokens each,
    // first bin of its bucket
    assert(rows == Set((1L, 1L, 1L, 40L), (6L, 0L, 1L, 40L)),
      s"every survivor packs exactly once with its token count, got $rows")
  }
}
