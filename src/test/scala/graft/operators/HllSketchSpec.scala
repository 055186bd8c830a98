package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Portable-HLL semantics: the estimator against a driver-side replica
  * (same hash, same integer register algebra), both correction
  * branches, the max-merge (union) algebra that makes register frames
  * shardable, and the accuracy bound the p = 8 design promises.
  */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the full estimator over raw values. */
  private def replica(values: Seq[String]): (Long, Double, Double) = {
    val regs = scala.collection.mutable.Map.empty[Long, Int]
    values.distinct.foreach { v =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md5.take(15), 16)
      val j = h >>> 52
      val w = h & ((1L << 52) - 1)
      val rank = 53 - java.lang.Long.bitCount(
        Seq(1, 2, 4, 8, 16, 32).foldLeft(w)((a, k) => a | (a >>> k)))
      regs(j) = math.max(regs.getOrElse(j, 0), rank)
    }
    val sFilled = regs.values.map(m => 1L << (53 - m)).sum
    val nEmpty = HllSketch.M - regs.size
    val sTotal = sFilled + nEmpty.toLong * (1L << 53)
    val raw = java.math.BigDecimal.valueOf(HllSketch.RawNumerator / sTotal.toDouble)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val est =
      if (raw <= HllSketch.LcThreshold && nEmpty > 0) HllSketch.LcTable(nEmpty - 1)
      else raw
    (nEmpty.toLong, raw, est)
  }

  test("estimator equals the driver-side replica on both branches") {
    // small group -> linear counting; large group -> raw estimator
    val small = (1 to 40).map(i => "small" -> s"u$i")
    val large = (1 to 5000).map(i => "large" -> s"u$i")
    val out = HllSketch
      .distinctEstimate((small ++ large).toDF("g", "v"), "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val (seS, srS, eeS) = replica(small.map(_._2))
    val (seL, srL, eeL) = replica(large.map(_._2))
    assert(out("small") == ((seS, srS, eeS, 40L)), s"small: ${out("small")}")
    assert(out("large") == ((seL, srL, eeL, 5000L)), s"large: ${out("large")}")
    // branch sanity: small must have taken linear counting, large raw
    assert(eeS != srS, "small group must use the linear-counting branch")
    assert(eeL == srL, "large group must use the raw estimator")
  }

  test("register frames merge by max: registers(A ++ B) == max-merge") {
    val a = (1 to 300).map(i => "g" -> s"x$i").toDF("g", "v")
    val b = (200 to 500).map(i => "g" -> s"x$i").toDF("g", "v")
    val union = HllSketch.registers(a.union(b), "g", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val merged = HllSketch.registers(a, "g", "v")
      .union(HllSketch.registers(b, "g", "v"))
      .groupBy($"g", $"j").agg(max($"m").as("m"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(union == merged,
      "HLL union must be the register-wise max of the per-shard sketches")
  }

  test("duplicates and partitioning cannot move the estimate") {
    val base = (1 to 700).map(i => "g" -> s"val-$i")
    def est(rows: Seq[(String, String)], parts: Int) = HllSketch
      .distinctEstimate(rows.toDF("g", "v").repartition(parts), "g", "v")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val ref = est(base, 1)
    // distinct-count semantics: a triple-duplicated stream is the same set
    assert(est(base ++ base ++ base, 5) == ref,
      "duplicate rows must not move any register")
    // partial-aggregation layout must be invisible
    assert(est(scala.util.Random.shuffle(base), 13) == ref,
      "partitioning/order must not move the estimate")
  }

  test("estimate lands inside the 3-sigma error band of p = 8") {
    val n = 10000
    val df = (1 to n).map(i => "g" -> s"user-$i").toDF("g", "v")
    val est = HllSketch.distinctEstimate(df, "g", "v")
      .select($"est_distinct").as[Double].head()
    val sigma = 1.04 / math.sqrt(HllSketch.M) // ~6.5%
    assert(math.abs(est - n) / n <= 3 * sigma,
      s"estimate $est for $n distinct is outside 3 sigma (${3 * sigma})")
  }
}
