package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity scoring — the model-based quality-filter rung
  * of the hygiene ladder (CCNet, Wenzek et al. 2020, trains a wiki LM
  * and drops high-perplexity crawl text; same shape here with the
  * corpus's own bigram statistics as the model). Heuristic filters
  * (t03 quality score, t13 repetition) catch structural junk; a
  * perplexity gate catches fluent-looking noise — shuffled tokens,
  * wrong-language fragments, template soup — that heuristics pass.
  *
  * Two stages, both plain DataFrame algebra:
  *  - [[bigramLm]]: conditional bigram probabilities
  *    P(w2 | w1) = n(w1 w2) / n(w1 ·) over the training corpus
  *    (maximum likelihood; every probability is rounded to 6 dp so
  *    scoring replays bit-for-bit across engines);
  *  - [[scorePerplexity]]: each document's
  *    ppl = exp(−mean ln P(w_i | w_{i−1})) over its bigram stream.
  *    Lower = more typical of the corpus; boilerplate scores LOW,
  *    token soup scores HIGH (SemDedupSpec-style planted cases in
  *    PerplexityScoreSpec).
  *
  * Scale shape: the LM is two hash aggregations over the bigram
  * stream (map-side partial, shuffle carries distinct bigrams only);
  * scoring is ONE shuffle join of the doc bigram stream against the
  * LM on the bigram key, then a per-doc aggregate. Nothing driver-side.
  * At 100 TB the LM comes from a SAMPLE (score against a fixed
  * reference model, not the full corpus): the LM table shrinks to
  * top-M bigrams + an unseen-bigram floor and BROADCASTS, turning
  * scoring into a single linear scan — the `unseenFloor` parameter
  * exists for exactly that deployment; at test SFs the corpus is its
  * own model and every doc bigram is present (floor unused).
  *
  * Degenerate docs (< 2 tokens ⇒ no bigram) have no perplexity and are
  * absent from the output — callers keeping them route around the gate.
  */
object PerplexityScore {

  /** (doc_id-ready) bigram stream of `textCol`: one row per bigram
    * occurrence, with its first token. Documents shorter than 2 tokens
    * emit nothing (WordShingles' degenerate whole-text shingle is
    * filtered by the 2-token split check).
    */
  private def bigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(TextDedup.shingles(col(textCol), 2)).as("bigram"))
      .filter(size(split(col("bigram"), " ")) === 2)
      .select(col(idCol), col("bigram"),
        split(col("bigram"), " ").getItem(0).as("w1"))

  /** Maximum-likelihood conditional bigram model of the corpus:
    * (bigram, cond_p) with cond_p = n(bigram) / n(w1 ·), rounded 6 dp.
    */
  def bigramLm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = bigramStream(docs, idCol, textCol)
    val counts = bg.groupBy(col("w1"), col("bigram"))
      .agg(count(lit(1)).as("n_bigram"))
    val w1tot = counts.groupBy(col("w1")).agg(sum(col("n_bigram")).as("n_w1"))
    counts.join(w1tot, "w1")
      .select(col("bigram"), round(col("n_bigram") / col("n_w1"), 6).as("cond_p"))
  }

  /** Per-document perplexity under `lm` (a (bigram, cond_p) frame from
    * [[bigramLm]], possibly trained on a different corpus/sample):
    * (id, n_bigrams, ppl). Bigrams absent from the LM score
    * `unseenFloor` (the smoothing mass a sampled model must assign);
    * with the corpus as its own model nothing is unseen.
    */
  def scorePerplexity(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lm: DataFrame,
      unseenFloor: Double = 1e-6): DataFrame =
    bigramStream(docs, idCol, textCol)
      .join(lm, Seq("bigram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        avg(log(coalesce(col("cond_p"), lit(unseenFloor)))).as("__avg_lp"))
      .select(col(idCol), col("n_bigrams"),
        round(exp(-col("__avg_lp")), 4).as("ppl"))

  /** Bigram stream with BOTH tokens split out — the Kneser–Ney paths
    * need the second token for continuation counts.
    */
  private def bigramStreamW2(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramStream(docs, idCol, textCol)
      .withColumn("w2", split(col("bigram"), " ").getItem(1))

  /** Interpolated Kneser–Ney perplexity (Kneser & Chen/Goodman's
    * formulation; the smoothing CCNet's KenLM models actually use)
    * of `docs` under a model trained on `train`:
    *
    *   P(w2|w1) = (max(c(w1w2) − D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1·)
    *   Pcont(w2) = (max(N1+(·w2) − D, 0) + D·W2·(1/V)) / T
    *
    * with absolute discount D (0.75, the textbook default), T the
    * number of distinct bigram types, W2 the number of distinct
    * continuation words, V the train vocabulary size — i.e. the
    * continuation distribution is ITSELF interpolated down to the
    * uniform 1/V, so a word never seen in train still receives
    * genuine discounted mass (D·W2/(T·V)) instead of an arbitrary
    * floor (floor-only smoothing made unseen-heavy held-out docs
    * score better under add-one — the measured failure this level of
    * interpolation exists to fix). Unseen CONTEXTS (w1 not in train)
    * back off to Pcont(w2) alone. Every probability is rounded to
    * 6 dp before the log (t14's determinism contract), final ppl to
    * 4 dp; `unseenFloor` only guards the post-round zero.
    *
    * Why KN over maximum-likelihood (t14) for a held-out gate: ML
    * assigns unseen bigrams probability 0 (here: the floor), so any
    * novel-but-fluent phrasing scores as noise; KN redistributes
    * discounted mass by how promiscuous each word's CONTEXTS are —
    * "how likely is w2 to start a new continuation" — which is what
    * separates novel fluent text from token soup
    * (PerplexityScoreSpec pins KN beating add-one on held-out docs).
    *
    * Scale shape: the model is three censuses over the train bigram
    * stream (bigram counts; per-w1 totals + fan-out, which reuses the
    * bigram-count shuffle's partitioning; per-w2 continuation counts)
    * plus a 1-row type-count frame attached by broadcast cross-join
    * (the X10 pattern — no eager driver scalar); scoring is three
    * left equi-joins on bigram/w1/w2 and one per-doc aggregate.
    * At 100 TB: train on a sample, truncate, broadcast — exactly
    * [[scorePerplexity]]'s deployment note.
    */
  def scorePerplexityKN(
      docs: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75,
      unseenFloor: Double = 1e-6): DataFrame = {
    val tb = bigramStreamW2(train, idCol, textCol)
    val counts = tb.groupBy(col("w1"), col("w2"), col("bigram"))
      .agg(count(lit(1)).as("n12"))
    val ctx = counts.groupBy(col("w1"))
      .agg(sum(col("n12")).as("c1"), count(lit(1)).as("n1p_fw"))
    val cont = counts.groupBy(col("w2")).agg(count(lit(1)).as("n1p_bw"))
    val types = counts.agg(count(lit(1)).as("t_types"),
      countDistinct(col("w2")).as("w2_types"))
    val vocab = tb.select(col("w1")).union(tb.select(col("w2")))
      .agg(countDistinct(col("w1")).as("v_sz"))
    val pcont = round(
      (greatest(coalesce(col("n1p_bw"), lit(0L)) - lit(discount), lit(0.0)) +
        lit(discount) * col("w2_types") / col("v_sz")) / col("t_types"), 6)
    val pKn = (greatest(coalesce(col("n12"), lit(0L)) - lit(discount), lit(0.0)) +
      lit(discount) * col("n1p_fw") * pcont) / col("c1")
    // clamp AFTER the 6-dp round: a sub-5e-7 KN probability (unseen
    // bigram in a heavy context) rounds to 0.0 and ln(0) would blow
    // the whole doc to Inf — the floor is the smoothing mass, so it
    // wins on both engines identically
    val p = greatest(round(when(col("c1").isNotNull, pKn).otherwise(pcont), 6),
      lit(unseenFloor))
    bigramStreamW2(docs, idCol, textCol)
      .join(counts.select(col("bigram"), col("n12")), Seq("bigram"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(log(p)).as("__avg_lp"))
      .select(col(idCol), col("n_bigrams"),
        round(exp(-col("__avg_lp")), 4).as("ppl"))
  }

  /** Add-one (Laplace) smoothed bigram perplexity on the same
    * train/score split — the baseline KN is judged against in
    * PerplexityScoreSpec: P(w2|w1) = (c(w1w2)+1) / (c(w1·)+V) with V
    * the train vocabulary size. Spec-only baseline, not an oracle
    * query: add-one famously over-taxes seen bigrams (every context
    * pays V extra counts), which is exactly what the spec shows KN
    * avoiding on held-out text.
    */
  def scorePerplexityAddOne(
      docs: DataFrame,
      train: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val tb = bigramStreamW2(train, idCol, textCol)
    val counts = tb.groupBy(col("w1"), col("bigram"))
      .agg(count(lit(1)).as("n12"))
    val ctx = counts.groupBy(col("w1")).agg(sum(col("n12")).as("c1"))
    val vocab = tb.select(col("w1")).union(tb.select(col("w2")))
      .agg(countDistinct(col("w1")).as("v"))
    val p = greatest(round((coalesce(col("n12"), lit(0L)) + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)) + col("v")), 6), lit(1e-6))
    bigramStreamW2(docs, idCol, textCol)
      .join(counts.select(col("bigram"), col("n12")), Seq("bigram"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(log(p)).as("__avg_lp"))
      .select(col(idCol), col("n_bigrams"),
        round(exp(-col("__avg_lp")), 4).as("ppl"))
  }
}
