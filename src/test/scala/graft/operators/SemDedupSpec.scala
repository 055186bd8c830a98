package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated directions in R^4 with planted near-duplicates:
  // scaled copies (cosine exactly 1.0) and a slightly rotated copy.
  // Vectors 90/91 seed two far-apart k-means centroids (k = 2,
  // first-K-by-id init picks the LOWEST ids — keep seeds low).
  private val vecs: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(1f, 0f, 0f, 0f), // seed A
    2L -> Array(0f, 0f, 1f, 1f), // seed B
    10L -> Array(2f, 0f, 0f, 0f), // dup of 1 (cos 1.0)
    11L -> Array(1f, 0.05f, 0f, 0f), // near-dup of 1
    12L -> Array(0f, 1f, 0f, 0f), // same cluster as A-ish, orthogonal to 1
    20L -> Array(0f, 0f, 2f, 2f), // dup of 2
    21L -> Array(0f, 0f, 1f, 0.9f) // near-dup of 2
  )

  private def df = vecs.toDF("vec_id", "embedding")

  test("planted duplicates drop, lowest id survives per group") {
    val out = SemDedup.semanticDedup(df, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.95)
    val survivors = out.select($"vec_id").collect().map(_.getLong(0)).sorted
    assert(survivors.contains(1L) && survivors.contains(2L),
      "lowest-id member of each near-dup group must survive")
    assert(!survivors.contains(10L) && !survivors.contains(11L) &&
      !survivors.contains(20L) && !survivors.contains(21L),
      s"planted near-duplicates must drop, got survivors ${survivors.toSeq}")
    assert(survivors.contains(12L), "orthogonal vector is not a near-dup")
  }

  test("salted pair stage == plain pair stage on the real embeddings") {
    // hotClusterThreshold = 0 forces EVERY cluster through the salted
    // path (carried vectors + norms, spread over 4 reducers); output
    // must be identical to the default (all-cold, plain cluster join)
    val e = graft.core.Tables.embeddings(spark, sfDir)
    def ids(hot: Long): Seq[Long] = SemDedup
      .semanticDedup(e, "vec_id", "embedding", k = 8, iters = 2,
        threshold = 0.35, saltBuckets = 4, hotClusterThreshold = hot)
      .select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val salted = ids(hot = 0)
    val plain = ids(hot = Long.MaxValue)
    assert(salted == plain, "salted cluster pair stage changed the drop set")
    assert(salted.nonEmpty && salted.size < e.count(),
      "the threshold must actually drop something for this test to bite")
  }

  test("no surviving same-cluster pair reaches the threshold (greedy invariant)") {
    val thr = 0.95
    val out = SemDedup.semanticDedup(df, "vec_id", "embedding",
      k = 2, iters = 2, threshold = thr)
      .select($"vec_id", $"cluster", $"embedding")
    val viol = out.as("a")
      .join(out.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(
        round(try_divide(
          graft.functions.VectorFunctions.dot(col("a.embedding"), col("b.embedding")),
          graft.functions.VectorFunctions.l2Norm(col("a.embedding")) *
            graft.functions.VectorFunctions.l2Norm(col("b.embedding"))), 4) >= thr)
      .count()
    assert(viol == 0L,
      "two survivors of one cluster at/above the threshold violate the greedy policy")
  }

  test("related-pair blocking recall is measured against the exact all-pairs baseline") {
    // Exact ALL-PAIRS cosine over the sf0.001 embeddings (125k pairs —
    // the deliberate expensive baseline, like s01 for ANN), joined to
    // the k-means assignment to measure how many cos ≥ 0.35 pairs the
    // blocking co-clusters.
    import graft.functions.VectorFunctions.{dot, l2Norm}
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding", l2Norm($"embedding").as("nrm"))
    val allPairs = e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(try_divide(dot(col("a.embedding"), col("b.embedding")),
          col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .localCheckpoint(true)

    val unit = SemDedup.unitVectors(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding")
    val model = KMeans.fit(unit, "embedding", "vec_id",
      k = 8, iters = 2, computeWcss = false)
    val asg = KMeans.assign(unit, "embedding", model.centroids)
      .select($"vec_id", $"cluster")
    val joined = allPairs
      .join(asg.select($"vec_id".as("va"), $"cluster".as("ca")), "va")
      .join(asg.select($"vec_id".as("vb"), $"cluster".as("cb")), "vb")
      .localCheckpoint(true)

    // Context, recorded not asserted: the synthetic corpus holds NO
    // true near-duplicates (max natural cosine ≈ 0.47), so its
    // cos ≥ 0.35 pairs are merely "related" and k-means legitimately
    // splits many across clusters — the SemDeDup tradeoff the paper
    // accepts. The asserted audit below plants REAL near-dups instead.
    val loose = joined.filter($"cos" >= 0.35)
    val (n35, co35) = (loose.count(), loose.filter($"ca" === $"cb").count())
    assert(n35 > 0, "corpus lost its related-pair structure")
    info(f"related-pair (cos≥0.35) blocking recall: $co35/$n35 = ${co35.toDouble / n35}%.3f")
  }

  test("planted near-duplicates co-cluster and are dropped end-to-end (recall audit)") {
    // The s07 oracle REPLAYS the same clustering in DuckDB — a shared
    // algorithmic bug would pass both sides (the d02/d03 blind spot
    // d07 closes for lexical dedup). Independent audit on the real
    // corpus: plant a ±2%-perturbed copy (cosine ≈ 0.9998) of every
    // 25th vector, then require (a) every planted pair lands in ONE
    // cluster — blocking recall 1.0 on actual near-dups — and (b) the
    // full operator at threshold 0.99 drops EXACTLY the planted copies
    // (the corpus's own pairs top out at cosine ≈ 0.47, so nothing
    // else may reach the gate).
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val planted = base.filter($"vec_id" % 25 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding",
          (x, i) => x * when(i % 2 === 0, lit(1.02f)).otherwise(lit(0.98f)))
          .as("embedding"))
    val nPlanted = planted.count()
    assert(nPlanted >= 10, s"expected ≥ 10 planted copies, got $nPlanted")
    val corpus = base.unionByName(planted)

    val out = SemDedup.semanticDedup(corpus, "vec_id", "embedding",
      k = 8, iters = 2, threshold = 0.99)
    val survivors = out.select($"vec_id").collect().map(_.getLong(0)).toSet
    val plantedIds = planted.select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(plantedIds.forall(!survivors.contains(_)),
      s"planted near-duplicates survived: ${plantedIds.intersect(survivors)}")
    assert(survivors == base.select($"vec_id").collect().map(_.getLong(0)).toSet,
      "only the planted copies may drop at threshold 0.99")
  }

  test("survivors plus drops partition the corpus") {
    val out = SemDedup.semanticDedup(df, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.95)
    val survivors = out.select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(vecs.map(_._1).toSet))
    // threshold above every pairwise cosine -> nothing drops
    val none = SemDedup.semanticDedup(df, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 1.01)
    assert(none.count() == vecs.size.toLong, "threshold > 1 must drop nothing")
  }
}
