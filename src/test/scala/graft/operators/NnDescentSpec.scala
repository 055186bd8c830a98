package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** NN-descent audit: the refined graph must be structurally valid,
  * deterministic, and measurably CONVERGING toward the exact kNN
  * graph — the property the oracle's bit-replay cannot see (a
  * wrong-but-deterministic refinement would still hash-match). Two
  * data regimes: the real near-uniform embeddings (the structure-free
  * hard case — convergence is pure coverage growth) and a clustered
  * synthetic where the neighbors-of-neighbors mechanism actually
  * lives and recall must go ~1.
  */
class NnDescentSpec extends SparkSpec {
  import spark.implicits._

  private val K = 10

  private def exactOf(vecs: Map[Long, Array[Float]]): Map[Long, Set[Long]] = {
    def cos(a: Array[Float], b: Array[Float]): Option[Double] =
      graft.functions.VectorFunctions.roundedCosine(a, b)
    vecs.keys.map { i =>
      i -> vecs.keys.filter(_ != i)
        .flatMap(j => cos(vecs(i), vecs(j)).map(c => (j, c)))
        .toSeq.sortBy { case (j, c) => (-c, j) }
        .take(K).map(_._1).toSet
    }.toMap
  }

  private def graphAt(emb: DataFrame, rounds: Int): Map[Long, Seq[Long]] =
    NnDescent.knnGraph(emb, "vec_id", "embedding", K, rounds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1)
      .map { case (id, rows) => id -> rows.sortBy(_._3).map(_._2).toSeq }

  private def recall(g: Map[Long, Seq[Long]], exact: Map[Long, Set[Long]]): Double = {
    val per = g.map { case (id, nbrs) =>
      exact(id).intersect(nbrs.toSet).size.toDouble / exact(id).size
    }
    per.sum / per.size
  }

  private lazy val realEmb = Tables.embeddings(spark, sfDir)
  private lazy val realExact = exactOf(
    realEmb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap)

  test("neighbor lists are valid: no self edges, <= K per node, ranks dense, sims sorted") {
    val rows = NnDescent.knnGraph(realEmb, "vec_id", "embedding", K, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.forall { case (id, nbr, _, _) => id != nbr })
    rows.groupBy(_._1).foreach { case (id, g) =>
      assert(g.length <= K, s"node $id has ${g.length} neighbors")
      assert(g.map(_._4).sorted.toSeq == (1 to g.length), s"node $id ranks not dense")
      val bySim = g.sortBy(_._4).map(_._3)
      assert(bySim.zip(bySim.tail).forall { case (a, b) => a >= b },
        s"node $id neighbor sims not descending")
    }
  }

  test("recall vs the exact kNN graph strictly climbs every round on the real embeddings") {
    // near-uniform random vectors are the STRUCTURE-FREE hard case:
    // neighbors-of-neighbors carry no metric signal, so the climb is
    // coverage growth off the random-circulant init — measured 0.143 →
    // 0.412 → 0.697 over three rounds on the sf0.001 fixture (the
    // cyclic-init lattice this replaced measured 0.06 → 0.11; the
    // operator Scaladoc records the comparison). Floors carry slack
    // for testdata regeneration but would catch broken candidate
    // generation or a silently shrunk candidate set.
    val r1 = recall(graphAt(realEmb, 1), realExact)
    val r2 = recall(graphAt(realEmb, 2), realExact)
    val r3 = recall(graphAt(realEmb, 3), realExact)
    assert(r1 < r2 && r2 < r3, s"recall not strictly climbing: $r1, $r2, $r3")
    assert(r1 >= 0.07 && r2 >= 0.25 && r3 >= 0.50,
      s"recall trajectory below floors: $r1, $r2, $r3")
  }

  test("on clustered vectors the mechanism converges: recall ~1 by round 3") {
    // 10 tight clusters of 50 (md5-seeded centers + small offsets,
    // dim 8): each node's true neighbors are cluster-mates, and once
    // one is found its neighbor list pulls in the rest — the actual
    // NN-descent argument, demonstrable only on clustered data.
    def h(s2: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s2.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8), 16)
    val dim = 8
    val centers = Array.tabulate(10)(c =>
      Array.tabulate(dim)(d => ((h(s"c$c:$d") % 2000) - 1000) / 1000.0f))
    val pts = (0L until 500L).map { i =>
      val c = (i % 10).toInt
      i -> Array.tabulate(dim)(d =>
        centers(c)(d) + ((h(s"p$i:$d") % 200) - 100) / 2000.0f)
    }
    val emb = pts.toDF("vec_id", "embedding")
    val r3 = recall(graphAt(emb, 3), exactOf(pts.toMap))
    assert(r3 >= 0.90, s"clustered recall at round 3 only $r3")
  }

  test("the build is deterministic: two runs produce identical graphs") {
    assert(graphAt(realEmb, 2) == graphAt(realEmb, 2))
  }

  test("a sparse id space fails the build LOUDLY (dense-id contract), not silently") {
    // the vacuumed-store shape: every 20th id missing — (id + stride)
    // mod n would seed edges to nonexistent nodes, so the in-plan
    // assert must fire instead of converging on a crippled init
    val sparse = realEmb.filter($"vec_id" % 20 =!= 0)
    val ex = intercept[Exception] {
      NnDescent.knnGraph(sparse, "vec_id", "embedding", K, 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("DENSE ids")), s"wrong failure: $ex")
  }

  test("a duplicate id masking an interior gap fails the build LOUDLY too") {
    // min/max/count alone wave this through (mn = 0, mx = n-1, |rows| =
    // n): id 1 replaced by a second copy of id 2 — the {0,2,2} shape
    // from the r15 advice. The distinct-count leg of the census must
    // catch it.
    val dup = realEmb.withColumn("vec_id",
      when($"vec_id" === 1L, 2L).otherwise($"vec_id"))
    val ex = intercept[Exception] {
      NnDescent.knnGraph(dup, "vec_id", "embedding", K, 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("DENSE ids")), s"wrong failure: $ex")
  }

  test("bottom-k id payloads round-trip ids above 2^53 bit-exactly") {
    // the r15 hazard: ids through the DOUBLE payload slot flatten above
    // 2^53 (both big ids below collapse to the same double). The long
    // variant every id call site now uses must keep them distinct.
    val big = (1L << 53) + 1L
    val rows = Seq((1L, 10L, big), (1L, 20L, big + 1), (1L, 30L, 7L))
      .toDF("g", "h", "id")
    val got = rows.groupBy($"g")
      .agg(graft.functions.BottomKPairsAgg.bottomKIdPairs($"h", $"id", 3).as("top"))
      .select(explode($"top").as("p"))
      .select($"p.h", $"p.v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, big), (20L, big + 1), (30L, 7L)))
    // and the double slot genuinely cannot tell 2^53 from 2^53 + 1
    assert((1L << 53).toDouble == big.toDouble)
  }
}
