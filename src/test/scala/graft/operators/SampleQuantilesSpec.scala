package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bottom-k-by-hash sample quantiles: determinism, the KMV-style merge
  * algebra, the exact-interpolation contract, and the accuracy the
  * uniform sample promises.
  */
class SampleQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int) =
    (1 to n).map(i => ("g", i.toDouble, s"k$i")).toDF("grp", "value", "key")

  test("interpolated == the quantile_cont definition on a known frame") {
    // values 1..5: p=0.5 -> 3.0 exactly; p=0.25 -> pos 1.0 -> 2.0;
    // p=0.9 -> pos 3.6 -> 4 + 0.6*(5-4) = 4.6
    val frame = (1 to 5).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = SampleQuantiles.interpolated(frame, Seq(0.25, 0.5, 0.9), "q")
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(out == Map(0.25 -> 2.0, 0.5 -> 3.0, 0.9 -> 4.6), s"got $out")
  }

  test("sample is deterministic and merges by union + re-bottom-k") {
    val whole = df(2000)
    val k = 64
    def samp(d: org.apache.spark.sql.DataFrame) = SampleQuantiles
      .bottomKSample(d, col("grp"), col("value"), col("key"), k)
    val once = samp(whole).collect().map(r => (r.getDouble(1), r.getLong(2))).toSet
    assert(samp(whole).collect().map(r => (r.getDouble(1), r.getLong(2))).toSet == once,
      "re-running the sample must select identical rows")
    // shard, sample each shard, union, re-take bottom-k: same sample
    val a = samp(whole.filter($"value" <= 1000))
    val b = samp(whole.filter($"value" > 1000))
    val merged = a.union(b)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"g").orderBy($"h", $"uk", $"v")))
      .filter($"rn" <= k)
      .collect().map(r => (r.getDouble(1), r.getLong(2))).toSet
    assert(merged == once, "shard-sample-merge must equal the one-shot sample")
  }

  test("estimates track exact quantiles within the sample error band") {
    val out = SampleQuantiles.withExactAudit(
        df(10000), col("grp"), col("value"), col("key"),
        Seq(0.25, 0.5, 0.75), k = 256)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (p, est, exact) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // DKW-style bound: quantile rank error ~ 1.36/sqrt(k) at 95%;
      // allow 3x on a value range of 10000 (values are uniform ranks)
      val tol = 3 * 1.36 / math.sqrt(256) * 10000
      assert(math.abs(est - exact) <= tol,
        s"p=$p est=$est exact=$exact off by ${math.abs(est - exact)} > $tol")
    }
  }

  test("the sample-path plan carries a WindowGroupLimit, not a full sort-shuffle") {
    val plan = SampleQuantiles
      .bottomKSample(df(2000), col("grp"), col("value"), col("key"), 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must plan as WindowGroupLimit:\n$plan")
  }
}
