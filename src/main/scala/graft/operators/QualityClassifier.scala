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

  /** The learned model: B bucket weights + a 1-row bias frame — both
    * lazy DataFrames, broadcast at scoring time.
    */
  final case class Model(weights: DataFrame, bias: DataFrame, buckets: Int)

  /** Hashed-bucket column for a token column. */
  private def bucketOf(tok: org.apache.spark.sql.Column, buckets: Int) =
    pmod(graft.functions.exprs.token_hash60(tok), lit(buckets.toLong))

  /** (doc, bucket) token census of `docs`, with the label carried when
    * `labelCol` is set.
    */
  private def bucketCensus(
      docs: DataFrame, idCol: String, textCol: String,
      labelCol: Option[String], buckets: Int): DataFrame = {
    val lbl = labelCol.map(c => col(c).as("__lbl")).toSeq
    docs
      .select(col(idCol) +: lbl :+ explode(wsTokens(col(textCol))).as("__tok"): _*)
      .select(col(idCol) +: lbl.map(_ => col("__lbl")) :+
        bucketOf(col("__tok"), buckets).as("__b"): _*)
  }

  /** Fit NB log-odds weights with Laplace smoothing from `docs`' weak
    * labels (1 = keep, 0 = drop). The labeled set can be a curated
    * reference distinct from the corpus being scored — the standard
    * distant-supervision deployment (train on labeled reference,
    * score the crawl).
    */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      buckets: Int = DefaultBuckets): Model = {
    val b = buckets
    val tb = bucketCensus(docs, idCol, textCol, Some(labelCol), b)
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
    Model(weights, bias, b)
  }

  /** Score `docs` with a trained [[Model]] → (idCol, logit, prob_pos):
    * per-doc bucket counts dotted with the broadcast weights, logit
    * rounded to 6 dp BEFORE the sigmoid and the probability to 4 dp
    * (the repo's compare-on-rounded convention). Token-less docs score
    * at the class prior.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model): DataFrame = {
    val dots = bucketCensus(docs, idCol, textCol, None, model.buckets)
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__cnt"))
      .join(broadcast(model.weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt") * col("__w")).as("__dot"))
    docs.select(col(idCol))
      .join(dots, Seq(idCol), "left")
      .crossJoin(broadcast(model.bias))
      .withColumn("logit", round(col("__bias") + coalesce(col("__dot"), lit(0.0)), 6))
      .select(col(idCol), col("logit"),
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4).as("prob_pos"))
  }

  /** [[train]] + [[score]] over the same weakly-labeled corpus — the
    * t17 query surface: → (idCol, weak_label, logit, prob_pos).
    *
    * r21 (guide §2.4 + the r12 duplicate-subtree lesson, measured):
    * composing [[train]] and [[score]] lazily planned the weak-label
    * expression (token folds + a full-text regexp_replace per doc)
    * THREE times (train census, bias, output join) and the token
    * census TWICE — 1.3 s honest at sf0.1 where count() had shown
    * 0.33 s. This path computes each ONCE into narrow doc-scale lazy
    * checkpoints (labels: 2 columns; per-doc bucket counts: ≤ buckets
    * rows per doc — bounded, never the corpus text), both
    * id-partitioned up front so the label join, the per-doc dot, and
    * the output join all ride one exchange each side. Identical
    * arithmetic to train-then-score (same censuses, same smoothing,
    * same rounding order); [[train]]/[[score]] stay the deployment
    * faces for a labeled reference distinct from the scored corpus.
    */
  def trainAndScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val b = buckets
    val labels = docs
      .select(col(idCol), col(labelCol).cast("long").as("weak_label"))
      .repartition(col(idCol))
      .localCheckpoint(false)
    val perdoc = bucketCensus(docs, idCol, textCol, None, b)
      .repartition(col(idCol))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(false)
    // per-class-per-bucket token counts off the SAME census (≤ B × 2
    // rows): label attaches by the co-partitioned doc-scale equi-join
    val cls = perdoc.join(labels, Seq(idCol))
      .groupBy(col("weak_label"), col("__b"))
      .agg(sum(col("__cnt")).as("__cc"))
    val tot = cls.agg(
      sum(when(col("weak_label") === 1, col("__cc")).otherwise(0L)).as("__pos_tot"),
      sum(when(col("weak_label") === 0, col("__cc")).otherwise(0L)).as("__neg_tot"))
    val spine = docs.sparkSession.range(0, b).select(col("id").as("__b"))
    val weights = spine
      .join(cls.filter(col("weak_label") === 1)
        .select(col("__b"), col("__cc").as("__pc")), Seq("__b"), "left")
      .join(cls.filter(col("weak_label") === 0)
        .select(col("__b"), col("__cc").as("__nc")), Seq("__b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("__b"),
        round(
          log((coalesce(col("__pc"), lit(0L)) + lit(1.0)) / (col("__pos_tot") + lit(b.toDouble))) -
            log((coalesce(col("__nc"), lit(0L)) + lit(1.0)) / (col("__neg_tot") + lit(b.toDouble))),
          6).as("__w"))
    val bias = labels.agg(
      round(log(
        (sum(when(col("weak_label") === 1, 1L).otherwise(0L)) + lit(1.0)) /
          (sum(when(col("weak_label") === 0, 1L).otherwise(0L)) + lit(1.0))), 6).as("__bias"))
    val dots = perdoc
      .join(broadcast(weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt") * col("__w")).as("__dot"))
    labels
      .join(dots, Seq(idCol), "left")
      .crossJoin(broadcast(bias))
      .withColumn("logit", round(col("__bias") + coalesce(col("__dot"), lit(0.0)), 6))
      .select(col(idCol), col("weak_label"), col("logit"),
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 4).as("prob_pos"))
  }
}
