package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal

/** The m05/m06/m07 near-dup claims on a 10× synthetic blow-up
  * (600 media items vs the 60-item oracle fixture) — the m-family
  * analogue of the text ladder's ScaleData sf1 spot-check. What the
  * blow-up establishes, with every number below a measured r12 value:
  *
  *  - BANDING stays exact: banded pairs == brute-force all-pairs at
  *    the Hamming radius (the pigeonhole argument survives the 10×
  *    denser buckets — set equality, nothing lost, nothing invented).
  *  - The VARIANT RADII are payload-dependent and the blow-up probes
  *    payload shapes the fixture never had: the measured tails are
  *    pinned as recall floors (m05 box-resize 189/200 within
  *    Hamming ≤ 5 — the out-of-radius tail is the documented DCT
  *    pHash territory; m06 sparse-perturb 199/200 within ≤ 9).
  *  - m07's signature radii hold at 10× (uncapped planted recall
  *    199-200/200), while its df-cap SATURATES there: the synthetic
  *    frame-token space has only ~300 distinct shingles at 600 items,
  *    so every shingle crosses the df ≤ 32 boilerplate bar and the
  *    capped candidate set goes empty — d13's documented above-cap
  *    recall tradeoff in its degenerate extreme, driven by the
  *    generator's low entropy (real video fingerprints carry far more
  *    bits per frame). The spec pins BOTH facts: the cap (not the
  *    signature) owns every loss, and the saturation itself — so a
  *    generator or quantizer change that alters either is caught.
  */
class MultimodalScaleSpec extends SparkSpec {
  import spark.implicits._

  private val N10 = 600 // 10x the oracle fixture's 60 items

  private lazy val media10 = Multimodal.syntheticMedia(spark, N10).toDF().cache()

  private def bruteForce(
      hashes: org.apache.spark.sql.DataFrame, thresh: Int): Set[(Long, Long)] = {
    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= thresh
    } yield (ia, ib)).toSet
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(df.columns(0), df.columns(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def plantedRecall(
      found: Set[(Long, Long)], ids: Seq[Long], v: Int): Double =
    ids.count(m => found.contains((m * 4, m * 4 + v))).toDouble / ids.size

  private def kindIds(kind: String): Seq[Long] = {
    val ids = media10.filter($"kind" === kind)
      .select($"media_id").collect().map(_.getLong(0)).toSeq
    assert(ids.size == N10 / 3, "10x corpus must actually be 10x")
    ids
  }

  test("m05 at 10x: banding == brute force; variant radii hold at their measured floors") {
    val hashes = MultimodalQueries.m05Hashes(media10)
    val banded = pairSet(
      MultimodalQueries.bandedHammingPairs(hashes, 6, 10, MultimodalQueries.HamT))
    val brute = bruteForce(hashes, MultimodalQueries.HamT)
    assert(banded == brute, "banding lost or invented pairs at 10x")
    val images = kindIds("image")
    // measured at 10x: resize 189/200 within <= 5 (max 8 — pHash
    // territory), perturb 200/200
    assert(plantedRecall(banded, images, 1) >= 0.90,
      "2:1 box-resize recall fell below the measured 10x floor")
    assert(plantedRecall(banded, images, 2) >= 0.99,
      "re-encode perturbation recall fell below the measured 10x floor")
  }

  test("m06 at 10x: banding == brute force; variant radii hold at their measured floors") {
    val hashes = MultimodalQueries.m06Hashes(media10)
    val banded = pairSet(
      MultimodalQueries.bandedHammingPairs(hashes, 10, 6, MultimodalQueries.AudioHamT))
    val brute = bruteForce(hashes, MultimodalQueries.AudioHamT)
    assert(banded == brute, "banding lost or invented pairs at 10x")
    val audios = kindIds("audio")
    // measured at 10x: gain+DC shift 200/200 at Hamming 0 (the
    // provable invariance), sparse perturb 199/200 within <= 9
    assert(plantedRecall(banded, audios, 1) >= 0.99,
      "gain+DC-shift recall fell below the measured 10x floor")
    assert(plantedRecall(banded, audios, 2) >= 0.95,
      "sparse-perturbation recall fell below the measured 10x floor")
  }

  test("m07 at 10x: signature radii hold uncapped; every capped loss is the df-cap's") {
    val videos = kindIds("video")
    val uncapped = pairSet(MultimodalQueries.m07Pairs(media10, dfCap = Long.MaxValue))
    // measured at 10x: trim 200/200, perturb 199/200 at Jaccard >= 0.5
    assert(plantedRecall(uncapped, videos, 1) >= 0.99,
      "trimmed re-upload recall fell below the measured 10x floor (signature drift)")
    assert(plantedRecall(uncapped, videos, 2) >= 0.97,
      "perturbed re-encode recall fell below the measured 10x floor (signature drift)")
    val capped = pairSet(MultimodalQueries.m07Pairs(media10))
    assert(capped.subsetOf(uncapped),
      "the df-cap may only REMOVE candidates, never add")
    // the documented saturation: at 10x the ~300-shingle synthetic
    // token space pushes every shingle over the df <= 32 bar — if this
    // stops holding, the generator or quantizer changed and the
    // measured floors above need re-derivation
    assert(capped.isEmpty,
      s"df-cap no longer saturates at 10x (got ${capped.size} pairs) — " +
        "re-measure the m07 floors")
  }
}
