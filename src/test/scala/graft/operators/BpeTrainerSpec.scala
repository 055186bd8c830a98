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

  test("batched == sequential on the Sennrich fixture") {
    val seq = BpeTrainer.learnMerges(corpus, "text", 6)
    val bat = BpeTrainer.learnMerges(corpus, "text", 6, batched = true)
    assert(bat == seq, s"batched $bat != sequential $seq")
  }

  test("selectBatch stops at the first unprovable candidate") {
    // (a,b) then (b,c): shares 'b' -> batch is just the top pair, and
    // (x,y) after the break must NOT be picked up even though disjoint
    val cand = Seq(("a", "b", 10L, 0L), ("b", "c", 9L, 0L), ("x", "y", 8L, 0L))
    assert(BpeTrainer.selectBatch(cand, maxN = 10) == cand.take(1))
    // disjoint pairs with safe bounds batch together
    val ok = Seq(("a", "b", 10L, 0L), ("c", "d", 9L, 0L), ("e", "f", 8L, 0L))
    assert(BpeTrainer.selectBatch(ok, maxN = 10) == ok)
    // a candidate naming an earlier merge's OUTPUT symbol breaks the
    // batch: its census count may understate its sequential count
    val out = Seq(("a", "b", 10L, 0L), ("ab", "d", 9L, 0L))
    assert(BpeTrainer.selectBatch(out, maxN = 10) == out.take(1))
    // an accepted merge's new-pair bound gates later candidates: a pair
    // (a,b) could create can reach count 9, so pf 8 can't be proven to
    // come next (9 > 8), but pf 9 could not be beaten (strictly)
    // either -> stop
    val gated = Seq(("a", "b", 10L, 9L), ("c", "d", 8L, 0L))
    assert(BpeTrainer.selectBatch(gated, maxN = 10) == gated.take(1))
    val tied = Seq(("a", "b", 10L, 9L), ("c", "d", 9L, 0L))
    assert(BpeTrainer.selectBatch(tied, maxN = 10) == tied.take(1))
    val clear = Seq(("a", "b", 10L, 7L), ("c", "d", 8L, 0L))
    assert(BpeTrainer.selectBatch(clear, maxN = 10) == clear)
  }

  test("batched == sequential on the real corpus, at fewer jobs per merge") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val n = 60
    val seq = BpeTrainer.learnMerges(docs, "text", n)

    val sc = spark.sparkContext
    // measure the operator's scheduling economy, not AQE's accounting:
    // adaptive execution splits one census query into a job per stage,
    // which would triple the count without changing the actual work
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("bpe-batched", "batched BPE job count", false)
    val bat =
      try BpeTrainer.learnMerges(docs, "text", n, batched = true)
      finally {
        sc.clearJobGroup()
        spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      }
    val jobs = sc.statusTracker.getJobIdsForGroup("bpe-batched").length

    assert(bat == seq,
      s"batched merge table diverged from sequential:\n$bat\nvs\n$seq")
    assert(bat.size == n, s"expected $n merges, got ${bat.size}")
    assert(jobs < n,
      s"batched path must cost fewer than 1 job per merge: $jobs jobs for $n merges")
    info(s"batched BPE: $n merges in $jobs jobs")
  }
}
