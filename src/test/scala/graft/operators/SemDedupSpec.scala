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
