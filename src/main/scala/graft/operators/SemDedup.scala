package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, l2Norm}

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): k-means cluster the embedding space, then drop
  * near-duplicate members WITHIN each cluster — pairs whose cosine
  * similarity meets the threshold — keeping the lowest-id member of
  * every near-dup group. This is the embedding-space rung of the dedup
  * ladder: exact (d01) → lexical near-dup (d03 MinHash) → semantic
  * near-dup (here), which catches paraphrases and re-renderings that
  * share no shingles at all.
  *
  * The cluster is the blocking key — the quadratic pair stage runs per
  * cluster, never corpus-wide. Same greedy one-pass policy as
  * [[TextDedup.dropNearDuplicates]]: a doc is dropped iff ANY lower-id
  * doc in its cluster (kept or itself dropped) is ≥ threshold, so
  * among survivors of one cluster no pair reaches the threshold
  * (SemDedupSpec asserts this).
  *
  * Scale shape (the SemDeDup paper runs this exact plan over LAION-5B):
  *  - k-means is [[KMeans]] — broadcast centroids, one codegen'd
  *    projection per iteration, O(K × dim) driver traffic;
  *  - assignment adds a `cluster` column in the same scan that computes
  *    the vector norm (one linear pass, no shuffle);
  *  - the pair stage is a self-equi-join on `cluster`: one shuffle of
  *    (id, norm, vector) keyed by cluster, quadratic only in CLUSTER
  *    size. At 100 TB, K is sized so clusters hold ~√N vectors (the
  *    paper uses 11k clusters for 100M docs); a pathologically hot
  *    cluster takes the same salting treatment as a hot LSH band —
  *    the pair stage runs through `Salting.skewSelfJoinPairs` with
  *    vectors and norms carried, so clusters above
  *    `hotClusterThreshold` members spread their pair work across
  *    `saltBuckets` reducers with identical output.
  */
object SemDedup {

  /** L2-normalized copy of the embedding column — SemDeDup clusters
    * DIRECTIONS (the paper normalizes before k-means, making L2 Lloyd
    * iterations equivalent to cosine clustering), so near-identical
    * texts embedded at different magnitudes still co-cluster. Division
    * runs in double and rounds once to float32: both engines correctly
    * round double→float, so the oracle's `(x::DOUBLE / nrm)::FLOAT`
    * replays bit-for-bit (norms already hash-match — d05). A zero
    * vector normalizes to NULLs via try_divide (= DuckDB x/0) and
    * never co-clusters.
    */
  private[operators] def unitVectors(vectors: DataFrame, idCol: String, embCol: String): DataFrame = {
    val nrm = l2Norm(col(embCol))
    vectors.select(col(idCol),
      transform(col(embCol),
        x => try_divide(x.cast("double"), nrm).cast("float")).as(embCol))
  }

  /** Survivors of `vectors` after cluster-blocked cosine dedup, with
    * their cluster assignment (`cluster` column). Cosine is rounded to
    * 4 dp before the threshold gate — the repo-wide compare-on-rounded
    * convention, so the drop set replays identically in the DuckDB
    * oracle (s07_semdedup). Blocking recall on true high-cosine pairs
    * is audited independently of the oracle replay in SemDedupSpec
    * (exact all-pairs baseline, the d07 pattern).
    */
  def semanticDedup(
      vectors: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iters: Int,
      threshold: Double,
      saltBuckets: Int = 8,
      hotClusterThreshold: Long = 65536): DataFrame = {
    val spark = vectors.sparkSession
    // LAZY localCheckpoint: the normalize projection materializes once
    // (inside the first job that touches it) and the remaining Lloyd
    // jobs + the final assignment read the stored blocks instead of
    // re-scanning the source per job barrier. Lazy (not eager) so no
    // extra job is spent; localCheckpoint (not persist) so the blocks
    // are reclaimed by the ContextCleaner when the frame is dropped,
    // with no CacheManager entry to leak across calls.
    val unit = unitVectors(vectors, idCol, embCol).localCheckpoint(false)
    val model = KMeans.fit(unit, embCol, idCol, k, iters, computeWcss = false)
    val assigned = KMeans.assign(unit, embCol, model.centroids)
      .select(col(idCol), col("cluster"))
    // norm computed in the same projection as the pair input: the pair
    // stage then does ONE dot product per pair instead of three.
    // lazy checkpoint: the salted self-join reads this frame in three
    // branches (the hot-key census plus the probe and build sides of
    // the conditional-salt join) — the same many-readers shape
    // TextDedup solves for LSH signatures; materialize once instead of
    // re-running the join + repartition subtree per branch
    val e = vectors
      .join(assigned, Seq(idCol))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol), col("cluster"), col(embCol),
        l2Norm(col(embCol)).as("__nrm"))
      .localCheckpoint(false)
    // the cluster-keyed self-join goes through the same skew guard as
    // a hot LSH band: clusters above `hotClusterThreshold` members
    // spread their quadratic pair work over `saltBuckets` reducers,
    // with vectors and norms CARRIED through the salted join so the
    // cosine verify needs no corpus re-join. Output is identical to
    // the plain join (SemDedupSpec pins it at threshold 0).
    val drops = Salting
      .skewSelfJoinPairs(e, Seq("cluster"), idCol,
        buckets = saltBuckets, hotThreshold = hotClusterThreshold,
        carry = Seq(embCol, "__nrm"))
      .filter(
        round(try_divide(dot(col(s"${embCol}_a"), col(s"${embCol}_b")),
          col("__nrm_a") * col("__nrm_b")), 4) >= threshold)
      .select(col("id_b").as(idCol))
      .distinct()
    vectors.join(assigned, Seq(idCol)).join(drops, Seq(idCol), "left_anti")
  }
}
