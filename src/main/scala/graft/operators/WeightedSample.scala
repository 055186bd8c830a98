package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement
  * (Efraimidis–Spirakis 2006, "Weighted random sampling with a
  * reservoir"): each item draws u ∈ (0, 1] from the engine-portable
  * md5 hash of its id and takes key = ln(u)/w; the k LARGEST keys per
  * group are a weight-proportional sample without replacement. The
  * mixture-building primitive beside t12's rate gates: t12 meets a
  * per-domain token BUDGET, this draws a fixed-size per-domain sample
  * BIASED by a weight (length, quality score, dedup cluster size…).
  *
  * Why this shape at 100 TB:
  *  - deterministic: the "randomness" is the portable hash, so the
  *    sample is reproducible run-to-run, auditable, and EXACTLY
  *    replayable by an external SQL oracle (t18) — no RNG state;
  *  - mergeable: top-k-by-key is a monoid (take the union's top k),
  *    so per-partition reservoirs combine map-side exactly like any
  *    partial aggregate (WeightedSampleSpec pins the algebra);
  *  - one projection + one per-group top-k — the q05/q12 window-limit
  *    shape, no corpus-wide sort.
  *
  * The key is rounded to 6 dp BEFORE ranking (rank-on-rounded, ties
  * on id) so the selection cannot drift between engines: u is
  * (hash+1)/2^60 — both engines round the same long to double the
  * same way, and ln plus one division are single IEEE ops each.
  */
object WeightedSample {

  /** The A-ES sort key for an id column and positive weight column. */
  def sampleKey(idCol: Column, weightCol: Column): Column = {
    val u = (graft.functions.exprs.token_hash60(idCol.cast("string")) + lit(1L))
      .cast("double") / lit(math.pow(2, 60))
    round(log(u) / weightCol, 6)
  }

  /** k-per-group weighted sample → original rows + (rank, samp_key).
    * Rows with NULL or non-positive weight are excluded (a zero-weight
    * item has zero inclusion probability; a negative weight is
    * meaningless here).
    */
  def samplePerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("samp_key").desc, col(idCol).asc)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("samp_key", sampleKey(col(idCol), col(weightCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
