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
}
