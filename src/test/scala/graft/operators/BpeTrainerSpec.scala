package graft.operators

import graft.SparkSpec

/** BPE training on the classic Sennrich corpus {low×5, lower×2,
  * newest×6, widest×3}, merge table hand-computed under the engine's
  * deterministic tie-break (pf desc, then (left, right) lexicographic):
  *
  *   1. (e,s)  9   (ties s-t 9; 'e' < 's')
  *   2. (es,t) 9
  *   3. (l,o)  7   (ties o-w 7; 'l' < 'o')
  *   4. (lo,w) 7
  *   5. (e,w)  6   (ties n-e, w-est; 'e' first)
  *   6. (ew,est) 6 (ties n-ew; 'ew' < 'n')
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    .toDF("text")

  test("learnMerges reproduces the hand-computed merge table") {
    val merges = BpeTrainer.learnMerges(corpus, "text", 6)
      .map(m => (m.step, m.left_sym, m.right_sym, m.pair_freq))
    val expected = Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L), (5L, "e", "w", 6L), (6L, "ew", "est", 6L))
    assert(merges == expected, s"got $merges")
  }

  test("segment applies merges in training order: lowest -> [low, est]") {
    val merges = BpeTrainer.learnMerges(corpus, "text", 6)
    val seg = BpeTrainer.segment(Seq("lowest", "newest", "wider").toDF("w"), "w", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(seg("lowest") == Seq("low", "est"), s"""lowest: ${seg("lowest")}""")
    // merge 6 (ew,est) came FROM "newest" — applying it re-fuses the word
    assert(seg("newest") == Seq("n", "ewest"), s"""newest: ${seg("newest")}""")
    // unseen word with no applicable merges beyond chars stays fine-grained
    assert(seg("wider") == Seq("w", "i", "d", "e", "r"), s"""wider: ${seg("wider")}""")
  }

  test("training stops early when the vocabulary runs out of pairs") {
    val tiny = Seq("ab ab cd").toDF("text")
    val merges = BpeTrainer.learnMerges(tiny, "text", 10)
    // round 1 merges (a,b) 2; round 2 merges (c,d) 1; then every word
    // is a single symbol and training must stop at 2 merges, not 10
    assert(merges.map(m => (m.left_sym, m.right_sym, m.pair_freq)) ==
      Seq(("a", "b", 2L), ("c", "d", 1L)), s"got $merges")
  }
}
