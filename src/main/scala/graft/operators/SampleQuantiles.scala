package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable per-group quantile estimation from a DETERMINISTIC
  * bottom-k-by-hash sample — the quantile member of the portable
  * sketch family (CMS q41, KMV q42/q43, HLL q53). Production quantile
  * sketches (GK, KLL, t-digest) have engine-specific internals that
  * an external oracle cannot replay (the q13 Scaladoc's point about
  * approxQuantile); hashing row keys through the engine-portable
  * md5-prefix and keeping the k SMALLEST hashes instead gives a
  * uniform fixed-size sample that any engine reproduces bit-for-bit,
  * and order statistics of a uniform sample are the textbook quantile
  * estimator (±O(1/√k)).
  *
  * Two sketch properties carry over from KMV (same hash, same
  * bottom-k state): the sample MERGES by union + re-bottom-k
  * (SampleQuantilesSpec pins the algebra), and sampling is CONSISTENT
  * — rows sharing a key value hash together, so the same keys are
  * sampled in any table sharing the key column (coordinated sampling
  * across fact tables for join-preserving samples).
  *
  * Scale shape: the `row_number ≤ k` rank filter plans as a
  * WindowGroupLimit, and Spark inserts the PARTIAL limit pass before
  * the exchange — each map partition forwards at most k rows per
  * group, so the shuffle carries O(partitions × groups × k), not the
  * column. The interpolation grid then runs on groups × |ps| rows.
  * The exact audit in [[withExactAudit]] is the expensive full-sort
  * baseline (the d07/s09 audit pattern) — the sample path is the
  * product.
  */
object SampleQuantiles {

  val DefaultK = 256

  /** The k rows with smallest (hash(key), key, value) per group:
    * (g, v, h, uk). The v tie-break makes the selected VALUE multiset
    * deterministic even when distinct rows share a key (they then
    * share h and uk); value ties beyond that are interchangeable.
    */
  def bottomKSample(
      df: DataFrame, gCol: Column, vCol: Column, keyCol: Column,
      k: Int = DefaultK): DataFrame = {
    val keyed = df
      .select(gCol.as("g"), vCol.cast("double").as("v"), keyCol.as("uk"))
      .filter(col("v").isNotNull)
      .select(col("g"), col("v"), col("uk"),
        graft.functions.exprs.token_hash60(col("uk")).as("h"))
    keyed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"), col("uk"), col("v"))))
      .filter(col("rn") <= k)
      .select(col("g"), col("v"), col("h"), col("uk"))
  }

  /** Exact linear-interpolation quantiles of `frame`'s (g, v) rows at
    * each p in `ps` — the quantile_cont definition, spelled out as
    * explicit rank joins so BOTH engines execute the identical
    * arithmetic (pos = p·(n−1); v_lo + (v_hi − v_lo)·frac, rounded
    * 4 dp) instead of trusting engine-internal percentile kernels.
    * Output: (g, p, <outCol>).
    */
  def interpolated(frame: DataFrame, ps: Seq[Double], outCol: String): DataFrame = {
    val spark = frame.sparkSession
    import spark.implicits._
    val byVal = frame.select(col("g"), col("v"))
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
    val sizes = frame.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val grid = sizes.crossJoin(broadcast(ps.toDF("p")))
      .select(col("g"), col("p"),
        floor(col("p") * (col("n") - 1).cast("double")).cast("long").as("klo"),
        (col("p") * (col("n") - 1).cast("double") -
          floor(col("p") * (col("n") - 1).cast("double"))).as("frac"),
        least(
          floor(col("p") * (col("n") - 1).cast("double")).cast("long") + 1,
          col("n") - 1).as("khi"))
    grid
      .join(byVal.select(col("g"), col("v").as("vlo"),
        (col("vr") - 1).cast("long").as("klo")), Seq("g", "klo"))
      .join(byVal.select(col("g"), col("v").as("vhi"),
        (col("vr") - 1).cast("long").as("khi")), Seq("g", "khi"))
      .select(col("g"), col("p"),
        round(col("vlo") + (col("vhi") - col("vlo")) * col("frac"), 4)
          .as(outCol))
  }

  /** Sample-estimated quantiles with the exact full-data audit riding
    * along: (g, p, est_q, exact_q, abs_err).
    */
  def withExactAudit(
      df: DataFrame, gCol: Column, vCol: Column, keyCol: Column,
      ps: Seq[Double], k: Int = DefaultK): DataFrame = {
    val samp = bottomKSample(df, gCol, vCol, keyCol, k).localCheckpoint(true)
    val full = df
      .select(gCol.as("g"), vCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
    interpolated(samp, ps, "est_q")
      .join(interpolated(full, ps, "exact_q"), Seq("g", "p"))
      .select(col("g"), col("p"), col("est_q"), col("exact_q"),
        round(abs(col("est_q") - col("exact_q")), 4).as("abs_err"))
  }
}
