package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
  * 2002; Beyer et al. 2007 "On synopses for distinct-value estimation
  * under multiset operations"): keep the k smallest hash values per
  * group; if the k-th smallest is h_k out of a 2^60 hash space, the
  * group holds ≈ (k−1)·2^60/h_k distinct values. Two properties make
  * it the sketch of choice here over HLL:
  *
  *  - it is MERGEABLE by set-union of the min-k lists (union two
  *    sketches, re-take the k smallest — KmvSketchSpec pins the
  *    algebra), so partial sketches combine across partitions, shards,
  *    or days exactly like any partial aggregate; and
  *  - with the engine-portable md5-prefix hash the whole estimator is
  *    DETERMINISTIC, so an external SQL oracle replays the estimate
  *    EXACTLY (q42) — unlike STOCK HLL, whose register layouts differ
  *    per engine and force tolerance-gate oracles (q24). (The same
  *    portable-hash treatment applied to HLL's register algebra —
  *    integer harmonic sums, embedded ln table — yields an
  *    oracle-exact HLL too: [[HllSketch]] / q53.)
  *
  * Scale shape: one (group, hash) distinct pass, then a per-group
  * bottom-k — O(groups × k) state, the same partial-window-limit shape
  * as q05/q12. The estimate's arithmetic is single-IEEE-op per stage
  * ((k−1)·2^60 is exactly representable in double) so rounding once at
  * 4 dp is cross-engine stable.
  */
object KmvSketch {

  val DefaultK = 32

  /** The sketch state: the k smallest DISTINCT hash values per group,
    * ranked (group, h, rn). Hash = md5-prefix token_hash60 of the
    * value rendered as a string — engine-portable and uniform over
    * [0, 2^60).
    *
    * Computed through the [[graft.functions.MinKAgg]] partial
    * aggregate (the streaming sketch's UDAF): the shuffle carries
    * O(groups × k) longs instead of the full distinct hash stream —
    * the r9 quiet-load anchor had the distinct + window shape at
    * 1.39 s / 3.6× DuckDB on sf0.1, with the whole cost in shuffling
    * 600k hashes that a map-side combine collapses to 32 per group.
    * Dedup lives inside the aggregator (sorted distinct insert), so
    * no separate `.distinct()` pass is needed.
    */
  def minKHashes(df: DataFrame, groupCol: String, valueCol: String, k: Int = DefaultK): DataFrame = {
    val mk = udaf(new graft.functions.MinKAgg(k))
    df.select(col(groupCol),
      graft.functions.exprs.token_hash60(col(valueCol).cast("string")).as("h"))
      // a NULL value hashes to NULL — without this guard NULL rows
      // would squat the smallest min-k slots and corrupt h_k while
      // countDistinct (and the sketch contract) exclude NULLs
      // (windowedDistinctSketch already guards the same way)
      .filter(col("h").isNotNull)
      .groupBy(col(groupCol))
      .agg(mk(col("h")).as("__mins"))
      .select(col(groupCol), posexplode(col("__mins")).as(Seq("__pos", "h")))
      .select(col(groupCol), col("h"), (col("__pos") + 1).cast("int").as("rn"))
  }

  /** Distinct-count estimates for the UNION and INTERSECTION of two
    * sub-multisets from their min-k sketches alone (Beyer et al. 2007,
    * "On synopses for distinct-value estimation under multiset
    * operations") — the property that makes KMV the sketch for corpus
    * OVERLAP questions ("how much vocabulary do two crawls share")
    * without ever co-locating the corpora:
    *
    *  - the k smallest of sketchA ∪ sketchB IS the union's sketch
    *    (the monoid merge KmvSketchSpec pins), so est_union follows
    *    from the standard estimator; and
    *  - for every hash h in the union sketch, membership in side X is
    *    decidable from X's SKETCH alone (h ≤ the union's k-th min ≤
    *    X's k-th min, so h ∈ X ⟺ h ∈ sketchX): ρ = |union-sketch ∩
    *    sketchA ∩ sketchB| / |union-sketch| estimates Jaccard, and
    *    est_inter = ρ · est_union.
    *
    * `sideCol` must be 0 (side A) or 1 (side B). One corpus pass →
    * one shuffle on the hash (dedup + side flags) → a single global
    * aggregate carrying both side sketches at once (the MinKAgg −1
    * skip sentinel), O(k) state. Unsaturated sketches degrade to the
    * EXACT set algebra (the sketches are the value sets), so small
    * inputs return exact answers — same fallback as
    * [[distinctEstimate]]. All arithmetic is deterministic and
    * replayed exactly by the q43 oracle.
    */
  def setOpsEstimate(
      df: DataFrame,
      sideCol: String,
      valueCol: String,
      k: Int = DefaultK): DataFrame = {
    val mk = udaf(new graft.functions.MinKAgg(k))
    val perHash = df.select(col(sideCol).cast("long").as("__side"),
        graft.functions.exprs.token_hash60(col(valueCol).cast("string")).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("h"))
      .agg(max(when(col("__side") === 0, 1).otherwise(0)).as("inA"),
        max(when(col("__side") === 1, 1).otherwise(0)).as("inB"))
    val row = perHash.agg(
      count(lit(1)).as("exact_union"),
      sum((col("inA") * col("inB")).cast("long")).as("exact_inter"),
      mk(when(col("inA") === 1, col("h")).otherwise(lit(-1L))).as("__sk_a"),
      mk(when(col("inB") === 1, col("h")).otherwise(lit(-1L))).as("__sk_b"))
    row
      .withColumn("__sku",
        slice(array_sort(array_distinct(concat(col("__sk_a"), col("__sk_b")))), 1, k))
      .withColumn("__szu", size(col("__sku")))
      .withColumn("est_union",
        when(col("__szu") < k, col("__szu").cast("double"))
          .otherwise(round(coalesce(
            try_divide(lit((k - 1).toDouble) * lit(1L << 60), element_at(col("__sku"), k)),
            col("__szu").cast("double")), 4)))
      .withColumn("__rho",
        size(array_intersect(array_intersect(col("__sku"), col("__sk_a")), col("__sk_b"))))
      .withColumn("est_inter",
        round(try_divide(col("__rho").cast("double") * col("est_union"),
          col("__szu").cast("double")), 4))
      .withColumn("est_jaccard",
        round(try_divide(col("__rho").cast("double"), col("__szu").cast("double")), 4))
      .select(col("exact_union"), col("est_union"), col("exact_inter"),
        col("est_inter"), col("est_jaccard"))
  }

  /** Per-group distinct-count estimate, self-audited against the exact
    * count: → (groupCol, exact_distinct, est_distinct, rel_err).
    * Groups with fewer than k distinct values fall back to the exact
    * count (their sketch IS the value set); a zero k-th hash
    * (vanishing probability) likewise falls back via try_divide.
    */
  def distinctEstimate(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = DefaultK): DataFrame = {
    val kth = minKHashes(df, groupCol, valueCol, k)
      .filter(col("rn") === k)
      .select(col(groupCol), col("h").as("__hk"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
    exact.join(kth, Seq(groupCol), "left")
      .select(col(groupCol), col("exact_distinct"),
        round(coalesce(
          try_divide(lit((k - 1).toDouble) * lit(1L << 60), col("__hk")),
          col("exact_distinct").cast("double")), 4).as("est_distinct"))
      .withColumn("rel_err",
        round(abs(col("est_distinct") - col("exact_distinct")) / col("exact_distinct"), 4))
  }
}
