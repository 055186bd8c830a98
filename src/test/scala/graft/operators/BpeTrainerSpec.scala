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
    // collectVocabMax = 0 forces the DISTRIBUTED paths — this pin is
    // about the two cluster loops agreeing, not the driver fast path
    val seq = BpeTrainer.learnMerges(corpus, "text", 6, collectVocabMax = 0)
    val bat = BpeTrainer.learnMerges(corpus, "text", 6, batched = true,
      collectVocabMax = 0)
    assert(bat == seq, s"batched $bat != sequential $seq")
  }

  test("in-memory fast path == distributed loop, fixture and fallback") {
    val fast = BpeTrainer.learnMerges(corpus, "text", 6)
    val dist = BpeTrainer.learnMerges(corpus, "text", 6, collectVocabMax = 0)
    assert(fast == dist, s"in-memory $fast != distributed $dist")
    // a census LARGER than the budget must fall back to the
    // distributed loop and still produce the same table
    val fallback = BpeTrainer.learnMerges(corpus, "text", 6, collectVocabMax = 1)
    assert(fallback == dist, s"fallback $fallback != distributed $dist")
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

  test("selectBatch closes when an accepted output collides with a census symbol") {
    // accepted (a,bc) -> output "abc"; the census ALSO holds (q,abc):
    // "abc" is already a symbol via a different split (e.g. 'ab'+'c'),
    // so (q,abc) gets AUGMENTED by the merge — its sequential count
    // can reach 5 + bound 4 = 9, and the next candidate's pf 8 cannot
    // be proven to precede it (the r8 order-equivalence hole)
    val coll = Seq(
      ("a", "bc", 10L, 4L), ("x", "y", 8L, 0L), ("q", "abc", 5L, 0L))
    assert(BpeTrainer.selectBatch(coll, maxN = 10) == coll.take(1))
    // same shape, but the next candidate clears the augmented cap:
    // its pf 10 strictly exceeds maxAug 5 + sumBounds 4 = 9, so it batches
    val clears = Seq(
      ("a", "bc", 20L, 4L), ("x", "y", 10L, 0L), ("q", "abc", 5L, 0L))
    assert(BpeTrainer.selectBatch(clears, maxN = 10) == clears.take(2))
    // no colliding pair anywhere and the pool is the whole census:
    // provably no augmentation, the creation bound alone gates
    val free = Seq(("a", "bc", 10L, 4L), ("x", "y", 8L, 0L))
    assert(BpeTrainer.selectBatch(free, maxN = 10) == free)
  }

  test("selectBatch assumes a hidden colliding pair when the pool is truncated") {
    // pool cut at pf 8: an unseen (q,ab) with pf <= 8 may exist, so
    // after accepting (a,b) (bound 3) the cap is 8 + 3 = 11 — pf 9
    // cannot be proven next even though no visible pair collides
    val cand = Seq(("a", "b", 20L, 3L), ("c", "d", 9L, 0L), ("e", "f", 8L, 0L))
    assert(BpeTrainer.selectBatch(cand, maxN = 10, poolExhaustive = false) ==
      cand.take(1))
    // with the pool exhaustive the same candidates all batch
    assert(BpeTrainer.selectBatch(cand, maxN = 10, poolExhaustive = true) ==
      cand)
    // far enough above the floor, truncated pools still batch
    val high = Seq(("a", "b", 200L, 3L), ("c", "d", 100L, 0L), ("e", "f", 8L, 0L))
    assert(BpeTrainer.selectBatch(high, maxN = 10, poolExhaustive = false) ==
      high.take(2))
  }

  test("segment kernel == chained-replace reference, fixture and real corpus") {
    val merges = BpeTrainer.learnMerges(corpus, "text", 6)
    val words = Seq("lowest", "newest", "wider", "", "low<est", "a>b",
      "widestest", "lowlow").toDF("w")
    val kern = BpeTrainer.segment(words, "w", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val ref = BpeTrainer.segmentChained(words, "w", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(kern == ref, s"kernel $kern != chained $ref")

    // real corpus: every distinct document word, under 60 real merges
    val docs = graft.core.Tables.documents(spark, sfDir)
    val realMerges = BpeTrainer.learnMerges(docs, "text", 60, batched = true)
    val realWords = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.wsTokens(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .distinct()
    val k2 = BpeTrainer.segment(realWords, "w", realMerges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val r2 = BpeTrainer.segmentChained(realWords, "w", realMerges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(k2 == r2, "kernel and chained segmentation diverge on the real corpus")
  }

  test("kernel == chained only holds collision-free; the colliding vocab diverges as documented") {
    // r9 ADVICE: if an EARLIER merge's operand equals a LATER merge's
    // output string, the later merge re-creates the earlier pair; the
    // greedy kernel re-applies the earlier rank on its next scan while
    // the chained form (one pass per merge, in training order) cannot
    // revisit it. Adversarial table: rank 0 consumes "abc", which only
    // becomes producible via ranks 1+2.
    val colliding = Seq(
      BpeTrainer.Merge(0, "abc", "d", 0),
      BpeTrainer.Merge(1, "a", "b", 0),
      BpeTrainer.Merge(2, "ab", "c", 0))
    val mergeArr = colliding.map(m => Array(m.left_sym, m.right_sym)).toArray
    assert(graft.functions.BpeExprImpl.operandOutputCollisions(mergeArr) == Seq((0, 2)),
      "the detector must flag rank 0's operand as rank 2's output")

    val word = Seq("abcd").toDF("w")
    val kern = BpeTrainer.segment(word, "w", colliding)
      .collect().map(r => r.getSeq[String](1)).head
    val chained = BpeTrainer.segmentChained(word, "w", colliding)
      .collect().map(r => r.getSeq[String](1)).head
    assert(kern == Seq("abcd"),
      s"kernel is canonical greedy-rank BPE: rank 0 fires once ranks 1+2 build 'abc', got $kern")
    assert(chained == Seq("abc", "d"),
      s"chained passed rank 0 before 'abc' existed and cannot revisit it, got $chained")

    // ...and tables a sequential trainer emits are collision-free, so
    // the kernel == chained pin on trained tables is justified, not lucky
    val trained = BpeTrainer.learnMerges(corpus, "text", 6)
      .map(m => Array(m.left_sym, m.right_sym)).toArray
    assert(graft.functions.BpeExprImpl.operandOutputCollisions(trained).isEmpty)
  }

  test("segment plan stays O(1) nodes at a 1000-merge vocabulary") {
    // synthetic 1000-merge table (the chained form would build a
    // ~1000-deep replace tree here — optimizer O(tree), Janino at risk)
    val merges = (1 to 1000).map { i =>
      BpeTrainer.Merge(i.toLong, "a" * i, "b", i.toLong)
    } :+ BpeTrainer.Merge(1001L, "l", "o", 1L)
    // a parquet-backed frame, so the projection cannot constant-fold
    // into a LocalTableScan and the codegen claim is actually tested
    val docWords = graft.core.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.wsTokens(
          org.apache.spark.sql.functions.col("text"))).as("w"))
    val planSeg = BpeTrainer.segment(docWords, "w", merges)
    val exprNodes = planSeg.queryExecution.optimizedPlan.expressions
      .map(e => e.collect { case x => x }.size).sum
    assert(exprNodes < 50,
      s"segment plan must not scale with the merge table: $exprNodes expression nodes")
    // the '*(n)' prefix is the WholeStageCodegen marker in the
    // executed plan's simple string
    assert(planSeg.queryExecution.executedPlan.toString
      .matches("(?s).*\\*\\(\\d+\\) Project \\[w#\\d+, bpe_segment_word.*"),
      "segment projection fell out of whole-stage codegen:\n" +
        planSeg.queryExecution.executedPlan.toString)
    assert(planSeg.limit(5).collect().nonEmpty, "1000-merge segment plan must execute")

    val words = Seq("lo", "alob", "ab").toDF("w")
    val seg = BpeTrainer.segment(words, "w", merges)
    val out = seg.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("lo") == Seq("lo"))
    assert(out("ab") == Seq("ab"))
    assert(out("alob") == Seq("a", "lo", "b"))
  }

  test("learnMergesWithCounts: merges and final counts == kernel, real corpus") {
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    val docs = graft.core.Tables.documents(spark, sfDir)
    val census = BpeTrainer.wordCensus(
      docs.select(explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("w"))
        .filter(col("w").rlike("^[A-Za-z0-9]+$"))
        .groupBy("w").agg(count(lit(1)).as("freq")))
    val (merges, counts) = BpeTrainer.learnMergesWithCounts(census, 6).get
    assert(merges == BpeTrainer.learnMerges(docs, "text", 6),
      "census-seam training diverged from learnMerges")
    val seg = BpeTrainer.segment(counts.map(_._1).toDF("w"), "w", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).length).toMap
    counts.foreach { case (w, n) =>
      assert(seg(w) == n, s"final-count $n != kernel ${seg(w)} for '$w'")
    }
    // over-budget census routes to the fallback (None), never truncates
    assert(BpeTrainer.learnMergesWithCounts(census, 6, collectVocabMax = 1).isEmpty)
  }

  test("batched == sequential on the real corpus, at fewer jobs per merge") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val n = 60
    val seq = BpeTrainer.learnMerges(docs, "text", n, collectVocabMax = 0)
    // ...and the driver fast path agrees with both on the real corpus
    assert(BpeTrainer.learnMerges(docs, "text", n) == seq,
      "in-memory fast path diverged from the distributed loop on the real corpus")

    val sc = spark.sparkContext
    // measure the operator's scheduling economy, not AQE's accounting:
    // adaptive execution splits one census query into a job per stage,
    // which would triple the count without changing the actual work
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("bpe-batched", "batched BPE job count", false)
    val bat =
      try BpeTrainer.learnMerges(docs, "text", n, batched = true,
        collectVocabMax = 0)
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
