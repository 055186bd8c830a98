package graft.operators

import graft.SparkSpec

/** Semantics of the decontamination operator on a planted corpus: the
  * benchmark sentence "the secret eval answer is forty two" yields
  * three 5-gram shingles; train docs overlap it by 3, 1 and 0
  * shingles respectively.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench =
    Seq(100L -> "the secret eval answer is forty two").toDF("doc_id", "text")
  private val train = Seq(
    1L -> "the secret eval answer is forty two plus trailing context",
    2L -> "completely unrelated words nothing shared here at all",
    3L -> "prefix text then the secret eval answer is hidden").toDF("doc_id", "text")

  test("contaminationHits counts distinct shared shingles per doc") {
    val hits = Decontaminate.contaminationHits(train, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 3L, 3L -> 1L),
      s"expected doc 1 to share all 3 benchmark shingles and doc 3 one, got $hits")
  }

  test("removeContaminated drops overlapping docs; minHits raises the bar") {
    val clean = Decontaminate.removeContaminated(train, bench, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L), s"any overlap must contaminate, got $clean")
    val lenient = Decontaminate
      .removeContaminated(train, bench, "doc_id", "text", minHits = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(lenient == Set(2L, 3L),
      s"minHits=2 must keep the single-shingle doc, got $lenient")
  }

  test("Bloom prefilter changes the plan, never the result") {
    // fpp 0.5: every other non-matching shingle sneaks past the Bloom
    // probe, and the exact join must still discard all of them
    val bloomHits = Decontaminate
      .contaminationHitsBloom(train, bench, "doc_id", "text", fpp = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloomHits == Map(1L -> 3L, 3L -> 1L),
      s"sketch-then-verify must equal the exact path, got $bloomHits")
    val clean = Decontaminate
      .removeContaminatedBloom(train, bench, "doc_id", "text", fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L), s"bloom path must drop the same docs, got $clean")
  }
}
