package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling, the hashed-n-gram form
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): fit two smoothed unigram-over-features
  * models — the TARGET domain p̂ and the RAW corpus q̂ — over hashed
  * bigram buckets, and weight every document by its log importance
  * ratio Σ_f n_f,d · (log p̂_f − log q̂_f). Documents that look like
  * the target domain score high; selection is then top-k by weight
  * (the deterministic DSIR ablation) or [[WeightedSample]] resampling.
  *
  * Scale shape: the feature space is CLOSED at `buckets` ids (hashing
  * trick), so both censuses and the log-ratio table are model-sized
  * (≤ buckets rows, broadcast) however large the corpus — one corpus
  * pass for features, partial-aggregated censuses, one broadcast join
  * back, one per-doc aggregate. Nothing driver-side is corpus-sized.
  *
  * Determinism (the t14 pattern): each bucket's log ratio is computed
  * from exact integer counts in ONE double op per term and rounded to
  * 6 dp; the per-doc sum of ≤ hundreds of 6 dp terms rounds to 4 dp,
  * far above double non-associativity — so an external SQL oracle
  * replays the weights exactly (t20).
  */
object Dsir {

  val DefaultBuckets = 4096

  /** One row per bigram occurrence: (id, target flag `__tgt`, bucket
    * id `__f`) — shared with [[IncrementalDsir]] so the two faces can
    * never disagree on featurization.
    */
  private[operators] def featureRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTargetCol: String,
      buckets: Int): DataFrame =
    docs
      .select(col(idCol), col(isTargetCol).cast("boolean").as("__tgt"),
        explode(TextDedup.shingles(col(textCol), 2)).as("__sh"))
      // WordShingles' degenerate whole-text shingle (docs under 2
      // tokens) is not a bigram — drop it, as PerplexityScore does
      .filter(size(split(col("__sh"), " ")) === 2)
      .select(col(idCol), col("__tgt"),
        pmod(graft.functions.exprs.token_hash60(col("__sh")), lit(buckets.toLong))
          .as("__f"))

  /** Per-document importance weights: (idCol, n_feats, log_ratio),
    * log_ratio rounded 4 dp. `isTargetCol` marks the rows whose
    * feature distribution defines the target domain p̂; q̂ is the whole
    * frame (the corpus being selected FROM, target included — the
    * DSIR convention). Laplace add-one smoothing over the closed
    * bucket space keeps every log finite. Documents without a single
    * bigram emit no row (they carry no evidence either way).
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTargetCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val feats = featureRows(docs, idCol, textCol, isTargetCol, buckets)
    // BOTH censuses in one corpus pass; the totals then derive from
    // the model-sized census itself, so model fitting costs exactly
    // one scan (scoring below is the second and last)
    // lazy checkpoint: totals AND the LR table read the census — a
    // model-sized frame (≤ buckets rows) — so materialize the census
    // pass once instead of re-scanning the corpus per consumer (the
    // SemDedup many-readers pattern)
    val census = feats.groupBy(col("__f")).agg(
      count(lit(1)).as("__nr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__nt"))
      .localCheckpoint(false)
    val totals = census.agg(sum(col("__nr")).as("__R"), sum(col("__nt")).as("__T"))
    // every bucket the corpus uses, with its 6 dp log ratio — bounded
    // by `buckets` rows, so the join back is a broadcast
    val lr = census
      .crossJoin(broadcast(totals))
      .select(col("__f"),
        round(
          log((col("__nt") + lit(1L)) / (col("__T") + lit(buckets.toLong))) -
            log((col("__nr") + lit(1L)) / (col("__R") + lit(buckets.toLong))),
          6).as("__lr"))
    feats
      .join(broadcast(lr), Seq("__f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        round(sum(col("__lr")), 4).as("log_ratio"))
  }
}
