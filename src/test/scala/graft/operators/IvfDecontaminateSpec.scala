package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The IVF-blocked semantic screen (d16) against the exact screen
  * (d15) on the real sf0.001 embeddings: blocking may only LOSE
  * pairs, never invent them, and its measured recall floor is pinned
  * so a regression in cell assignment or probe selection (which would
  * silently shrink the flagged set) fails loudly.
  */
class IvfDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 0.30
  private val DCells = 16
  private val DProbe = 8

  private lazy val e = Tables.embeddings(spark, sfDir)
  private lazy val bench = e.filter($"vec_id" % 20 === 0)
  private lazy val corpus = e.filter($"vec_id" % 20 =!= 0)

  private lazy val exact = Decontaminate
    .semanticHits(corpus, bench, "vec_id", "embedding", Tau)
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
  private lazy val ivf = {
    val cents = AnnIndex.firstVectors(e, "embedding", "vec_id", DCells).map(_._2)
    Decontaminate
      .semanticHitsIvf(corpus, bench, "vec_id", "embedding", Tau, cents, DProbe)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
  }

  test("IVF flagged set is a subset of the exact screen's") {
    assert(exact.nonEmpty, "exact screen flagged nothing — spec is vacuous")
    val extra = ivf.keySet.diff(exact.keySet)
    assert(extra.isEmpty,
      s"blocking invented flagged vectors the exact screen never saw: $extra")
  }

  test("per-vector evidence never exceeds the exact screen's") {
    // inside a probed cell the screen is the exact 4-dp cosine, so a
    // flagged vector's hit count is bounded by (and best_cos bounded
    // by) the exact row; best_cos EQUAL means the argmax pair was in
    // a probed cell
    ivf.foreach { case (v, (nHits, bestCos, _)) =>
      val (en, ec, _) = exact(v)
      assert(nHits <= en, s"vec $v: ivf n_hits $nHits > exact $en")
      assert(bestCos <= ec + 1e-12, s"vec $v: ivf best_cos $bestCos > exact $ec")
    }
  }

  test("recall floor: nprobe 8/16 keeps >= 70% of exact flags on the adversarial corpus") {
    // the synthetic embeddings are near-random (no cluster structure)
    // — the worst case for IVF; measured recall at nprobe 4/8/12 is
    // 0.56/0.76/0.90 at sf0.01 (see the d16 Scaladoc). Pin a floor
    // just below the nprobe=8 measurement so assignment/probe
    // regressions trip it while run-to-run corpus variance does not.
    val recall = ivf.keySet.intersect(exact.keySet).size.toDouble / exact.size
    assert(recall >= 0.70, f"ivf recall $recall%.3f < 0.70 floor")
  }

  test("a benchmark vector outside every probed cell is the ONLY loss mode") {
    // replay probe selection driver-side and check that every exact
    // pair d16 lost has its corpus cell outside the bench item's
    // probe list — i.e. losses come from blocking, not from the
    // in-cell screen
    val cents = AnnIndex.firstVectors(e, "embedding", "vec_id", DCells).map(_._2)
    val assigned = corpus.select($"vec_id",
        graft.functions.exprs.coarse_assign_cell($"embedding", cents).as("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = bench.collect().map { r =>
      val bv = r.getSeq[Float](r.fieldIndex("embedding")).toArray
      val ranked = cents.indices
        .map(i => (i.toLong, graft.functions.VectorFunctions.roundedCosine(bv, cents(i))))
        .sortWith(graft.functions.VectorFunctions.probeBefore)
      r.getLong(r.fieldIndex("vec_id")) -> ranked.take(DProbe).map(_._1).toSet
    }.toMap
    val lost = exact.keySet.diff(ivf.keySet)
    lost.foreach { v =>
      // necessary condition for an honest loss: the exact screen's
      // argmax bench item did NOT probe v's cell — if it had, the
      // in-cell screen would have flagged v (it IS the exact cosine)
      val (_, _, bestBench) = exact(v)
      assert(!probes(bestBench).contains(assigned(v)),
        s"vec $v lost despite its argmax bench $bestBench probing cell ${assigned(v)}")
    }
  }

  test("the probe join is a broadcast hash equi-join on the cell id") {
    // the whole point of the IVF swap (d15 -> d16) is that the probe
    // frame joins the assigned corpus on c_id under a broadcast within
    // its documented budget (nprobe × |bench| × dim × 4B; Scaladoc) —
    // a nested-loop or shuffle join here means the blocking or the
    // hint regressed
    val cents = AnnIndex.firstVectors(e, "embedding", "vec_id", DCells).map(_._2)
    val p = Decontaminate
      .semanticHitsIvfFrame(corpus, bench, "vec_id", "embedding", Tau, cents, DProbe)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin \\[c_id".r.findFirstIn(p).isDefined,
      s"d16's probe join is not a c_id-keyed broadcast hash join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"d16's probe degraded to a nested-loop product:\n$p")
  }
}
