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
}
