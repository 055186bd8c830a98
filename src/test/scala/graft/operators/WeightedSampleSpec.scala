package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("reservoir algebra: per-part top-k merge == whole-corpus top-k") {
    val all = (1L to 400L).map(i => ("g", i, 1L + i % 7))
    val (p1, p2) = all.splitAt(200)
    val k = 25
    def sample(rows: Seq[(String, Long, Long)]): Seq[Long] = WeightedSample
      .samplePerGroup(rows.toDF("g", "id", "w"), "g", "id", "w", k)
      .select($"id").collect().map(_.getLong(0)).toSeq
    def keys(rows: Seq[(String, Long, Long)]): Seq[(Double, Long)] = WeightedSample
      .samplePerGroup(rows.toDF("g", "id", "w"), "g", "id", "w", k)
      .select($"samp_key", $"id").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // merge two partial reservoirs: union, re-rank by (key desc, id)
    val merged = (keys(p1) ++ keys(p2))
      .sortBy { case (key, id) => (-key, id) }.take(k).map(_._2)
    assert(sample(all).sorted == merged.sorted,
      "merging per-part reservoirs must equal the whole-corpus sample")
  }

  test("weights bias inclusion: a dominant weight is always sampled") {
    // one item carries (almost) all the mass; 99 others are tiny.
    // P(heavy not in top-10) is astronomically small, and the draw is
    // deterministic anyway — this pins that weight actually matters
    val rows = (1L to 99L).map(i => ("g", i, 1L)) :+ (("g", 100L, 1000000L))
    val out = WeightedSample
      .samplePerGroup(rows.toDF("g", "id", "w"), "g", "id", "w", k = 10)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(out.contains(100L), s"the 10^6-weight item must be sampled, got $out")
    assert(out.size == 10)
  }

  test("uniform weights reduce to hash-order top-k; zero weights are excluded") {
    val rows = (1L to 50L).map(i => ("g", i, 10L)) ++ Seq(("g", 200L, 0L))
    val df = rows.toDF("g", "id", "w")
    val out = WeightedSample.samplePerGroup(df, "g", "id", "w", k = 5)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(!out.contains(200L), "zero-weight items must never be sampled")
    // with equal weights, ln(u)/w is monotone in u -> top-k = the k
    // LARGEST hashes (u closest to 1)
    val expect = (1L to 50L)
      .map(i => i -> graft.functions.TextExprImpl.tokenHash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(i.toString)))
      .sortBy { case (id, h) => (-h, id) }.take(5).map(_._1).toSet
    assert(out == expect, s"uniform-weight sample must be hash order: $out vs $expect")
  }
}
