package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** Distributed Lloyd's k-means over an `array<float>` embedding column
  * — the production centroid source for IVF (SimilarityQueries s02
  * keeps deterministic first-K centroids so its DuckDB oracle can
  * replay the assignment; a real index build fits centroids here
  * first, then uses the identical assignment plumbing).
  *
  * Scale shape per iteration:
  *  - centroids (K × dim doubles, a few KB) broadcast as literals —
  *    the corpus never leaves the executors;
  *  - assignment is a single projection computing K codegen'd dot
  *    products per row (argmin over squared L2 via the
  *    |x|² − 2x·c + |c|² expansion — |x|² is constant per row, so only
  *    |c|² − 2x·c is compared);
  *  - the refit is posexplode → partial aggregate: the shuffle carries
  *    O(K × dim) partial sums per map partition, independent of corpus
  *    size (same shape as s05 label centroids).
  *
  * Deterministic throughout: init = the K lowest-id vectors, argmin
  * tie-break on centroid index, fixed iteration count (no RNG).
  */
object KMeans {

  final case class Model(centroids: Array[Array[Double]], wcss: Seq[Double])

  /** Squared-distance rank expression: index of the nearest centroid.
    * Builds `array(|c0|²-2x·c0, |c1|²-2x·c1, ...)` then argmin — all
    * inside one whole-stage-codegen projection. Scores are rounded to
    * 6 dp before the argmin (the repo-wide rank-on-rounded-values
    * convention) so the assignment is invariant to FP summation order
    * and replays bit-for-bit in the DuckDB oracle (s06_kmeans).
    */
  private def nearestCentroid(vecCol: Column, centroids: Array[Array[Double]]): Column = {
    val scores = centroids.map { c =>
      val cf = c.map(_.toFloat)
      val c2 = cf.map(x => x.toDouble * x.toDouble).sum
      round(lit(c2) - lit(2.0) * dot(vecCol, typedLit(cf)), 6)
    }
    // array_position returns the FIRST index of the min -> ties break
    // on the lowest centroid id, deterministically
    (array_position(array(scores: _*), array_min(array(scores: _*))) - 1).cast("int")
  }

  /** Assign every row its nearest-centroid index (column `cluster`). */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("cluster", nearestCentroid(col(vecCol), centroids))

  /** Fit k centroids with `iters` Lloyd iterations. `idCol` orders the
    * deterministic initialization (first K rows by ascending id).
    * `computeWcss = false` skips the per-iteration WCSS diagnostic pass
    * (one extra corpus job per iteration) for callers that only need
    * the centroids — e.g. SemDedup's blocking step; `Model.wcss` is
    * then empty.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int,
      computeWcss: Boolean = true): Model = {
    var centroids: Array[Array[Double]] =
      df.orderBy(col(idCol).asc).limit(k)
        .select(col(vecCol))
        .collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val wcss = Seq.newBuilder[Double]

    for (_ <- 0 until iters) {
      val assigned = assign(df, vecCol, centroids)
      // refit + per-cluster WCSS in one pass: explode to (cluster, j, x)
      val byDim = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("j", "x")))
        .groupBy(col("cluster"), col("j"))
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("j"), col("m")))),
          e => e.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      // an emptied cluster keeps its previous centroid
      centroids = centroids.indices.map(i => byDim.getOrElse(i, centroids(i))).toArray
      if (computeWcss) {
        wcss += assigned.select(
          sum(squaredDistance(col(vecCol), centroids)).as("wcss"))
          .head().getDouble(0)
      }
    }
    Model(centroids, wcss.result())
  }

  /** Σ per-row squared distance to the row's nearest centroid. */
  private def squaredDistance(vecCol: Column, centroids: Array[Array[Double]]): Column = {
    val x2 = dot(vecCol, vecCol)
    val scores = centroids.map { c =>
      val cf = c.map(_.toFloat)
      val c2 = cf.map(v => v.toDouble * v.toDouble).sum
      lit(c2) - lit(2.0) * dot(vecCol, typedLit(cf))
    }
    x2 + array_min(array(scores: _*))
  }
}
