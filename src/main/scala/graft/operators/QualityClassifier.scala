package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** Trained document-quality classifier — the third rung of the hygiene
  * ladder after the heuristic gate (t03) and the LM-perplexity gate
  * (t14): a LINEAR classifier over hashed token counts, the
  * fastText-style model-based filter used on pretraining corpora
  * (GPT-3 / CCNet style: train on weakly-labeled data, score the whole
  * corpus). Weights are the closed-form Naive Bayes log-odds with
  * Laplace smoothing (the NB(-SVM) baseline of Wang & Manning 2012) —
  * deterministic, so training AND scoring replay exactly in an
  * external SQL oracle, unlike SGD.
  *
  * Model: feature b = engine-portable `token_hash60(token) % buckets`;
  * weight w_b = ln((pos_b + 1)/(POS + B)) − ln((neg_b + 1)/(NEG + B));
  * bias = ln((n_pos_docs + 1)/(n_neg_docs + 1));
  * score(doc) = σ(bias + Σ_b count_{doc,b} · w_b).
  *
  * Scale shape: two linear token censuses (per-class-bucket and
  * per-doc-bucket) with map-side partial aggregation; the learned
  * model is B + 1 doubles — broadcast back for scoring, so the corpus
  * is never shuffled wider than its (doc, bucket) counts and the
  * driver never sees data. Everything is lazy: train + score is ONE
  * composed plan.
  */
object QualityClassifier {

  val DefaultBuckets = 64

  /** Hashed-bucket column for a token column. */
  private def bucketOf(tok: org.apache.spark.sql.Column, buckets: Int) =
    pmod(graft.functions.exprs.token_hash60(tok), lit(buckets.toLong))

  /** Train NB log-odds weights on `docs`' weak labels and score every
    * doc: → (idCol, weak_label, logit, prob_pos). `labelCol` must hold
    * 1 (keep) / 0 (drop) weak labels — e.g. the t03 heuristic gate
    * thresholded, the distant-supervision setup quality classifiers
    * are actually trained with. The logit is rounded to 6 dp BEFORE
    * the sigmoid and the probability to 4 dp, the repo's
    * compare-on-rounded convention.
    */
  def trainAndScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val b = buckets
    // token → bucket census, keyed by (doc, label)
    val tb = docs
      .select(col(idCol), col(labelCol).as("__lbl"),
        explode(wsTokens(col(textCol))).as("__tok"))
      .select(col(idCol), col("__lbl"), bucketOf(col("__tok"), b).as("__b"))
    // per-class-per-bucket token counts (B × 2 rows)
    val cls = tb.groupBy(col("__lbl"), col("__b")).agg(count(lit(1)).as("__cc"))
    // class token totals as a 1-row frame (broadcast via crossJoin)
    val tot = cls.agg(
      sum(when(col("__lbl") === 1, col("__cc")).otherwise(0L)).as("__pos_tot"),
      sum(when(col("__lbl") === 0, col("__cc")).otherwise(0L)).as("__neg_tot"))
    // full bucket spine: buckets unseen in one class still get their
    // smoothing mass (a bucket seen only in pos must pull positive)
    val spine = docs.sparkSession.range(0, b).select(col("id").as("__b"))
    val weights = spine
      .join(cls.filter(col("__lbl") === 1).select(col("__b"), col("__cc").as("__pc")),
        Seq("__b"), "left")
      .join(cls.filter(col("__lbl") === 0).select(col("__b"), col("__cc").as("__nc")),
        Seq("__b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("__b"),
        round(
          log((coalesce(col("__pc"), lit(0L)) + lit(1.0)) / (col("__pos_tot") + lit(b.toDouble))) -
            log((coalesce(col("__nc"), lit(0L)) + lit(1.0)) / (col("__neg_tot") + lit(b.toDouble))),
          6).as("__w"))
    // doc-prior bias as a 1-row frame
    val bias = docs.agg(
      round(log(
        (sum(when(col(labelCol) === 1, 1L).otherwise(0L)) + lit(1.0)) /
          (sum(when(col(labelCol) === 0, 1L).otherwise(0L)) + lit(1.0))), 6).as("__bias"))
    // score: per-doc bucket counts · broadcast weights
    val dots = tb.groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__cnt"))
      .join(broadcast(weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt") * col("__w")).as("__dot"))
    docs.select(col(idCol), col(labelCol).cast("long").as("weak_label"))
      .join(dots, Seq(idCol), "left") // token-less docs score at the prior
      .crossJoin(broadcast(bias))
      .withColumn("logit", round(col("__bias") + coalesce(col("__dot"), lit(0.0)), 6))
      .select(col(idCol), col("weak_label"), col("logit"),
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4).as("prob_pos"))
  }
}
