package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** BPE tokenizer training — the textbook byte-pair-encoding merge
  * loop (Sennrich et al.): count adjacent symbol pairs over the
  * word-frequency table, merge the most frequent pair everywhere,
  * repeat. Deterministic throughout: ties break lexicographically on
  * (left, right), so the learned merge table is a pure function of
  * the corpus.
  *
  * Symbol sequences are carried in TWO synchronized forms — a list
  * (for pair counting) and a self-delimited string `<l><o><w>` (for
  * merge application): `replace(s, '<l><o>', '<lo>')` is a literal
  * left-to-right non-overlapping scan in BOTH Spark and DuckDB, which
  * is exactly BPE's greedy merge order, and the `<>` delimiters make
  * multi-char symbols unambiguous. That equivalence is what lets the
  * DuckDB oracle (t16) replay the whole training loop.
  *
  * Scale shape: the corpus-sized work is ONE census (explode tokens →
  * groupBy word), after which every merge round runs on the distinct-
  * word table — vocab-sized (≤ ~10⁸ rows at 100 TB), never the
  * corpus. Each round is one partial-aggregated pair census + a
  * map-only merge apply, checkpointed to keep lineage flat. A
  * production tokenizer run (30–50k merges) would batch merges per
  * pass or train on a sample; the loop here is the exact algorithm.
  */
object BpeTrainer {

  /** Cap on numMerges × census-words for the in-memory training fast
    * path (~seconds of driver recounts at word-visit cost); past it
    * the distributed batched loop is faster than driver recounting.
    */
  val InMemoryWorkBudget: Long = 1L << 28

  final case class Merge(step: Long, left_sym: String, right_sym: String, pair_freq: Long)

  /** Words as (freq, s, syms): alphanumeric whitespace tokens only
    * (the `<>` delimiters must not occur inside symbols).
    */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      // spread the corpus first (CLAUDE.md s01/s12 pattern): the
      // explode + regex + census below are map-side on the scan's
      // partitioning, and a single-file corpus scans 1-2 wide — at
      // sf0.1 this stage ran ~2 cores wide and was most of t24's
      // training wall-clock
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(explode(wsTokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[A-Za-z0-9]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        concat(lit("<"), array_join(split(col("w"), ""), "><"), lit(">")).as("s"),
        split(col("w"), "").as("syms"))

  /** Adjacent-pair census of a word table: (l, r, pf) weighted by word
    * frequency — partial aggregation collapses the explode map-side.
    */
  private def pairCensus(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
             i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))""")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("pf"))

  /** [[pairCensus]] plus each pair's new-pair bound, in one plan: a
    * merge of (l, r) can only create pairs AT its application sites,
    * so any post-merge pair (x, lr) occurs at most count-of-triple
    * (x, l, r) times and (lr, y) at most (l, r, y) times — the symbol
    * 3-gram census upper-bounds every pair a merge could create
    * (greedy non-overlapping application only lowers the true count).
    * `bound` = max over both triple forms, 0 when no triple surrounds
    * the pair (its merge can create nothing).
    */
  private def pairCensusWithBounds(words: DataFrame): DataFrame = {
    val triples = words.filter(size(col("syms")) >= 3)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 2),
             i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b,
                         element_at(syms, i + 2) AS c))""")).as("t"))
      .groupBy(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      .agg(sum(col("freq")).as("tf"))
    // bounds merge into the pair census by UNION + re-aggregate rather
    // than a join: a join's broadcast exchange costs a separate Spark
    // job per pass, while the union keeps the whole census ONE job.
    // Both triple forms are themselves adjacent pairs, so every union
    // key exists on the pair side and sum/max compose cleanly.
    val boundRows = triples
      .select(col("b").as("l"), col("c").as("r"), lit(0L).as("pf"), col("tf").as("bnd"))
      .union(triples
        .select(col("a").as("l"), col("b").as("r"), lit(0L).as("pf"), col("tf").as("bnd")))
    pairCensus(words)
      .select(col("l"), col("r"), col("pf"), lit(0L).as("bnd"))
      .union(boundRows)
      .groupBy(col("l"), col("r"))
      .agg(sum(col("pf")).as("pf"), max(col("bnd")).as("bound"))
      .filter(col("pf") > 0)
  }

  /** Apply `ms` merges to the word table in one map-only projection
    * (chained literal replaces — call_function, not SQL-text
    * interpolation, so symbols cannot break the parser), re-derive the
    * symbol list, and checkpoint to keep lineage flat. `eager = false`
    * defers materialization into the NEXT job that reads the frame
    * (the following pass's census), so a batched pass costs ONE job
    * instead of census + checkpoint — lineage still truncates when the
    * lazy checkpoint materializes.
    */
  private def applyMerges(
      words: DataFrame,
      ms: Seq[(String, String)],
      eager: Boolean = true): DataFrame =
    words
      .select(col("freq"),
        ms.foldLeft(col("s")) { case (s, (l, r)) =>
          call_function("replace", s, lit(s"<$l><$r>"), lit(s"<$l$r>"))
        }.as("s"))
      .select(col("freq"), col("s"),
        expr("regexp_extract_all(s, '<([^>]*)>', 1)").as("syms"))
      .localCheckpoint(eager)

  /** Learn `numMerges` merges from the corpus. Stops early if the
    * vocabulary runs out of adjacent pairs.
    *
    * Fast path first: BPE training is a pure function of the
    * word-frequency census, and the census is VOCAB-sized, not
    * corpus-sized — so when it fits on the driver (guarded by
    * `take(collectVocabMax + 1)`, never an unbounded collect) the
    * whole merge loop runs in driver memory off ONE cluster job
    * (census + collect). This is how production tokenizer trainers
    * work (word-count dict, then in-memory merges); the result is
    * bit-identical to the distributed loop (BpeTrainerSpec pins
    * in-memory ≡ sequential ≡ batched on the Sennrich fixture and the
    * real corpus). A census too large to collect falls back to the
    * distributed loop below — the shape that holds at 100 TB.
    *
    * `batched = true` is the distributed production shape for
    * 30–50k-merge runs: per pass, ONE pair census feeds a driver-side
    * selection of a PROVABLY order-equivalent run of merges (see
    * [[selectBatch]]), all applied in one map pass — so a pass costs
    * 2 jobs however many merges it lands, instead of 2 jobs per
    * merge. The learned merge table is identical to the sequential
    * path's by construction.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      batched: Boolean = false,
      candPool: Int = 256,
      collectVocabMax: Int = 1 << 20): Seq[Merge] = {
    if (collectVocabMax > 0) {
      val census = wordTable(docs, textCol)
        .select(col("syms"), col("freq"))
        .take(collectVocabMax + 1)
      // The in-memory loop recounts ALL pairs per merge — O(numMerges
      // × census) — so fitting on the driver is not enough: a
      // production 30-50k-merge run over a near-cap census would spend
      // minutes in driver recounts while the batched distributed path
      // lands many merges per 2-job pass. Gate on the loop's actual
      // work product, not just on fit (ADVICE r12).
      val inMemoryWork = numMerges.toLong * math.max(1, census.length)
      if (census.length <= collectVocabMax && inMemoryWork <= InMemoryWorkBudget)
        return trainInMemory(
          census.map(r => (r.getSeq[String](0).toArray, r.getLong(1))), numMerges)
      // else: census exceeds the driver budget (or the merge loop
      // would) — fall through to the distributed loop (the extra
      // census job is the fallback's cost)
    }
    // LAZY checkpoint when batched: the word census then materializes
    // inside round 1's pair-census job instead of paying its own
    // barrier action first — a one-batch training run (small-merge
    // queries like t16/t24) costs ONE job for census+selection, and
    // multi-round runs still get flat lineage when the lazy
    // checkpoint lands. Sequential mode keeps the eager checkpoint
    // (its per-merge loop re-reads `cur` numMerges times).
    var cur = wordTable(docs, textCol).localCheckpoint(!batched)
    val merges = Seq.newBuilder[Merge]
    var step = 1L
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val batch: Seq[(String, String, Long)] =
        if (batched) {
          val top = pairCensusWithBounds(cur)
            .orderBy(col("pf").desc, col("l").asc, col("r").asc)
            .limit(candPool).collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
          // a full pool means pairs below the cut exist unseen — the
          // collision probe must then assume a hidden pair at pfMin
          selectBatch(top, (numMerges - step + 1).toInt,
            poolExhaustive = top.length < candPool)
            .map { case (l, r, pf, _) => (l, r, pf) }
        } else {
          pairCensus(cur)
            .orderBy(col("pf").desc, col("l").asc, col("r").asc)
            .limit(1).collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        }
      if (batch.isEmpty) exhausted = true
      else {
        batch.foreach { case (l, r, pf) =>
          merges += Merge(step, l, r, pf)
          step += 1
        }
        cur = applyMerges(cur, batch.map { case (l, r, _) => (l, r) },
          eager = !batched)
      }
    }
    merges.result()
  }

  /** The exact sequential merge loop on a collected (syms, freq)
    * census: count every adjacent symbol pair weighted by word freq,
    * take the max by (pf desc, l asc, r asc) — all symbols are
    * alphanumeric ASCII, so Scala String ordering equals both
    * engines' binary string order — apply it left-to-right
    * non-overlapping (replace()'s scan semantics), repeat. The pair
    * recount per merge is O(vocab × word length) — fine for the
    * collectVocabMax × numMerges regimes routed here; a 30–50k-merge
    * production run at the vocab cap would maintain pair counts
    * incrementally (or take the distributed batched path).
    */
  private[operators] def trainInMemory(
      words: Seq[(Array[String], Long)],
      numMerges: Int): Seq[Merge] =
    trainInMemoryFull(words, numMerges)._1

  /** [[trainInMemory]] plus each input word's FINAL symbol list — the
    * trained vocabulary applied to itself, which training computes
    * anyway. For a sequentially-trained (collision-free) table this
    * equals the greedy-rank kernel's segmentation (BpeTrainerSpec pins
    * kernel ≡ chained ≡ training chain), so per-word token counts
    * come out of training for free.
    */
  private[operators] def trainInMemoryFull(
      words: Seq[(Array[String], Long)],
      numMerges: Int): (Seq[Merge], Array[Array[String]]) = {
    val merges = Seq.newBuilder[Merge]
    var cur: Array[(Array[String], Long)] = words.toArray
    var step = 1L
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      cur.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), pf) =
          counts.minBy { case ((cl, cr), cpf) => (-cpf, cl, cr) }
        merges += Merge(step, l, r, pf)
        cur = cur.map { case (syms, f) => (mergePair(syms, l, r), f) }
        step += 1
      }
    }
    (merges.result(), cur.map(_._1))
  }

  /** Driver fast-path training that ALSO returns each census word's
    * final token count under the learned merges — the t24 shape: the
    * caller broadcast-joins the vocab-sized (word → n_tokens) map
    * back onto the corpus instead of re-segmenting every occurrence.
    * Returns None when the census exceeds `collectVocabMax` (the
    * caller then takes its distributed path). `census` must carry
    * (w, freq, syms) — pass [[wordCensus]] output, possibly derived
    * from a reusable per-(doc, word) count frame so the corpus is
    * exploded only once.
    */
  def learnMergesWithCounts(
      census: DataFrame,
      numMerges: Int,
      collectVocabMax: Int = 1 << 20): Option[(Seq[Merge], Seq[(String, Int)])] = {
    val rows = census.select(col("w"), col("freq"), col("syms"))
      .take(collectVocabMax + 1)
    if (rows.length > collectVocabMax) None
    else {
      val ws = rows.map(_.getString(0))
      val (merges, finalSyms) = trainInMemoryFull(
        rows.map(r => (r.getSeq[String](2).toArray, r.getLong(1))), numMerges)
      Some((merges, ws.toSeq.zip(finalSyms.map(_.length).toSeq)))
    }
  }

  /** The (w, freq, syms) census from any (w, freq) word-count frame —
    * the seam that lets a caller build word counts once (e.g. from a
    * per-(doc, word) frame it goes on to reuse) and train off them.
    */
  def wordCensus(wordCounts: DataFrame): DataFrame =
    wordCounts.select(col("w"), col("freq"), split(col("w"), "").as("syms"))

  /** One merge applied to a symbol list, left-to-right non-overlapping
    * — after a match the scan resumes AFTER the merged token, exactly
    * `replace(s, '<l><r>', '<lr>')` on the self-delimited string.
    */
  private[operators] def mergePair(
      syms: Array[String], l: String, r: String): Array[String] =
    if (syms.length < 2) syms
    else {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }

  /** The longest prefix of this pass's census that sequential training
    * would PROVABLY pick in the same order. Candidates — sorted by the
    * sequential key (pf desc, l asc, r asc), each carrying its
    * triple-census new-pair `bound` ([[pairCensusWithBounds]]) — are
    * accepted while
    *
    *  1. the pair's symbols (and its output symbol l+r) are disjoint
    *     from every already-accepted merge's symbols and output —
    *     merging only destroys/creates adjacencies AT its application
    *     sites, so a fully disjoint pair's count and occurrences are
    *     untouched by the earlier merges in the batch, and
    *  2. its count strictly beats the cap on any pair an earlier
    *     accepted merge could CREATE or AUGMENT (below), so sequential
    *     training provably still picks this pair next.
    *
    * The cap has two regimes. A pair a merge CREATES always involves
    * the merge's output symbol, and every creation site is an
    * application site of that merge, so any single created pair counts
    * at most the merge's `bound` — the creation cap is max over
    * accepted bounds. But when an accepted merge's output string l+r
    * ALREADY occurs as a symbol (reachable via a different split, e.g.
    * 'a'+'bc' vs 'ab'+'c'), a PRE-EXISTING census pair (x, l+r) is
    * AUGMENTED to its census pf plus created occurrences — which can
    * overtake a later candidate whose pf only beats the bound (the r8
    * order-equivalence hole). A collision is visible as a census pair
    * involving the output symbol: its pf is read from the candidate
    * pool, and when the pool is TRUNCATED (didn't cover the census) an
    * unseen colliding pair may exist with pf up to the pool's minimum,
    * so the floor `pfMin` stands in. Once any accepted output
    * collides, the cap becomes (max colliding pf) + (SUM of accepted
    * bounds): an augmented pair involving several outputs can absorb
    * each of their creations, so bounds add in the worst case.
    *
    * The first candidate that fails either test ends the batch (a later
    * acceptance could not be proven to precede it; candidates past the
    * collected pool sort after it by construction). Worst case the
    * batch is the single top pair — exactly the sequential step.
    */
  private[operators] def selectBatch(
      cand: Seq[(String, String, Long, Long)],
      maxN: Int,
      poolExhaustive: Boolean = true): Seq[(String, String, Long, Long)] = {
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
    val used = scala.collection.mutable.Set.empty[String]
    val pfMin = if (cand.isEmpty) 0L else cand.iterator.map(_._3).min
    var maxBound = Long.MinValue // cap on any single CREATED pair
    var sumBounds = 0L // worst-case creations absorbed by one AUGMENTED pair
    var maxAug = -1L // max census pf of a pair involving an accepted output; -1 = none
    val it = cand.iterator
    var open = true
    while (open && it.hasNext && accepted.size < maxN) {
      val c @ (l, r, pf, bound) = it.next()
      // the OUTPUT symbol counts as used: a later candidate naming an
      // existing symbol equal to l+r would gain new occurrences from
      // this merge, so its census count understates its sequential one
      val disjoint = !used(l) && !used(r) && !used(l + r)
      val cap = if (maxAug >= 0) maxAug + sumBounds else maxBound
      val safe = accepted.isEmpty || (disjoint && pf > cap)
      if (safe) {
        accepted += c
        used += l
        used += r
        val out = l + r
        used += out
        maxBound = math.max(maxBound, bound)
        sumBounds += bound
        // collision probe: does any census pair involve the output?
        val seen = cand.iterator.filter(p => p._1 == out || p._2 == out)
          .map(_._3).foldLeft(-1L)(math.max)
        val aug =
          if (seen >= 0) seen // colliding pair visible in the pool
          else if (!poolExhaustive) pfMin // may hide below the pool cut
          else -1L // pool IS the census: provably no collision
        maxAug = math.max(maxAug, aug)
      } else open = false
    }
    accepted.toSeq
  }

  /** The learned merge table as a DataFrame (the t16 query surface). */
  def learnMergesDF(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, numMerges).toDF()
  }

  /** Segment a word column into the learned subword units: the
    * standard rank-based BPE encode, as ONE native kernel call
    * carrying the merge table as driver-side state
    * ([[graft.functions.BpeSegmentWord]], the `PqEncodeCode` pattern).
    * The r8 shape chained one `replace` expression per merge, sizing
    * the Catalyst tree by the MODEL — a 30–50k-merge production vocab
    * meant a 50k-deep tree, optimizer time O(tree) and a guaranteed
    * Janino overflow into interpreted eval; the kernel keeps the plan
    * O(1) nodes at any vocab size. Words containing the `<`/`>`
    * delimiter characters are emitted unsegmented (single-element
    * array) — the same contract as training, which only learns over
    * alphanumeric tokens. Pinned ≡ [[segmentChained]] in
    * BpeTrainerSpec (fixture, real corpus, and a 1000-merge table).
    */
  def segment(df: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame =
    df.withColumn("subwords",
      graft.functions.exprs.bpe_segment_word(col(wordCol),
        merges.map(m => Array(m.left_sym, m.right_sym)).toArray))

  /** Declarative reference implementation of [[segment]] — the merge
    * list applied in training order as chained literal replaces on
    * the self-delimited string (exactly the training-side `replace`
    * semantics the t16 oracle replays). Kept for cross-checking the
    * kernel; unusable at production vocab size (see [[segment]]).
    */
  private[operators] def segmentChained(
      df: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    val enc0: Column =
      concat(lit("<"), array_join(split(col(wordCol), ""), "><"), lit(">"))
    val encoded = merges.foldLeft(enc0) { (s, m) =>
      call_function("replace", s,
        lit(s"<${m.left_sym}><${m.right_sym}>"), lit(s"<${m.left_sym}${m.right_sym}>"))
    }
    df.withColumn("subwords",
      when(col(wordCol).rlike("[<>]"), array(col(wordCol)))
        .otherwise(regexp_extract_all(encoded, lit("<([^>]*)>"), lit(1))))
  }
}
