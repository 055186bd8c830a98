package graft.operators

import graft.SparkSpec

class NearDupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains, stars, singleton pairs, min-id labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (star on 10), {20,21}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val comps = NearDupClusters.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (diameter > 1 iteration)") {
    val chain = (1L to 12L).sliding(2).map(s => (s(1), s.head)).toSeq.toDF("doc_a", "doc_b")
    val comps = NearDupClusters.connectedComponents(chain)
      .collect().map(r => r.getLong(1)).distinct
    assert(comps.toSeq == Seq(1L), s"all nodes must collapse to 1, got ${comps.toSeq}")
  }

  test("deep chain: adaptive pointer jump converges in far fewer rounds than the diameter") {
    // an 80-hop chain needs ~79 hop-only rounds — with maxIterations 20
    // this converges ONLY because the Shiloach-Vishkin jump engages
    // after round 3 and label distance then halves per round
    val chain = (1L to 80L).sliding(2).map(s => (s(1), s.head)).toSeq.toDF("doc_a", "doc_b")
    val comps = NearDupClusters.connectedComponents(chain, maxIterations = 20)
      .collect().map(r => r.getLong(1)).distinct
    assert(comps.toSeq == Seq(1L))
    // and with the jump disabled the same chain exhausts the budget —
    // proving the convergence above came from the jump, not the hops
    assertThrows[IllegalStateException] {
      NearDupClusters.connectedComponents(chain, maxIterations = 20,
        jumpFromIteration = Int.MaxValue).collect()
    }
  }

  test("keepRepresentatives drops non-representative cluster members only") {
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = NearDupClusters.keepRepresentatives(docs, pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L)) // 4 untouched (no pairs), reps 1 and 5 kept
  }

  test("empty pair set yields empty components and keeps all docs") {
    val docs = (1L to 3L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(NearDupClusters.connectedComponents(empty).count() == 0)
    assert(NearDupClusters.keepRepresentatives(docs, empty).count() == 3)
  }

  test("keepBest keeps the highest-scored member per cluster; singletons survive") {
    // clusters {1,2,3} (best = 2), {5,6} (best = 6); 4 is a singleton
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5),
      (4L, 0.1),
      (5L, 0.3), (6L, 0.7)).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = NearDupClusters.keepBest(docs, pairs, scoreCol = "score")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // (doc_id, comp, cluster_size): winners carry their cluster's min-id
    // label and true size; the singleton labels itself with size 1
    assert(kept == Seq((2L, 1L, 3L), (4L, 4L, 1L), (6L, 5L, 2L)))
  }

  test("keepBest with a constant score degrades to keepRepresentatives (min-id tie-break)") {
    val docs = (1L to 6L).map(i => (i, 1.0)).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val best = NearDupClusters.keepBest(docs, pairs, scoreCol = "score")
      .collect().map(_.getLong(0)).sorted.toSeq
    val reps = NearDupClusters
      .keepRepresentatives((1L to 6L).map(i => (i, 1.0)).toDF("doc_id", "score"), pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(best == reps && best == Seq(1L, 4L, 5L))
  }

  test("keepBest ranks NULL scores last") {
    val docs = Seq(
      (1L, Some(0.2)), (2L, None), (3L, Some(0.4))).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val kept = NearDupClusters.keepBest(docs, pairs, scoreCol = "score")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L)) // 0.4 beats 0.2 beats NULL
  }
}
