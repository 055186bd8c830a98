package graft.operators

import graft.SparkSpec
import graft.core.Tables

class KMeansSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("WCSS is non-increasing across Lloyd iterations") {
    val m = KMeans.fit(emb, "embedding", "vec_id", k = 8, iters = 4)
    assert(m.wcss.size == 4)
    m.wcss.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"WCSS rose: ${m.wcss}")
    }
  }

  test("fit is deterministic and assignment covers every row exactly once") {
    val m1 = KMeans.fit(emb, "embedding", "vec_id", k = 4, iters = 2)
    val m2 = KMeans.fit(emb, "embedding", "vec_id", k = 4, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    val assigned = KMeans.assign(emb, "embedding", m1.centroids)
    assert(assigned.count() == emb.count())
    val clusters = assigned.select("cluster").distinct().collect().map(_.getInt(0))
    assert(clusters.forall(c => c >= 0 && c < 4))
  }

  test("a k close to the corpus size survives emptied clusters") {
    val n = emb.count().toInt
    val k = math.max(2, n / 2)
    val m = KMeans.fit(emb, "embedding", "vec_id", k = k, iters = 2)
    assert(m.centroids.length == k)
    assert(m.centroids.forall(_.length == 64))
  }
}
