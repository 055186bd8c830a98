package graft.functions

import graft.SparkSpec
import graft.core.Tables

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** Local ground truth: SQL-standard interpolating quantile. */
  private def refQuantile(sorted: Array[Double], p: Double): Double = {
    val pos = (sorted.length - 1) * p
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
  }

  test("filter-and-refine quantiles are exact on a mostly-distinct column") {
    val li = Tables.lineitem(spark, sfDir)
    val sorted = li.select($"l_extendedprice").collect().map(_.getDouble(0)).sorted
    val ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
    val got = Quantiles.exact(li, "l_extendedprice", ps)
    ps.zip(got).foreach { case (p, v) =>
      assert(v == refQuantile(sorted, p), s"p=$p: $v != ${refQuantile(sorted, p)}")
    }
  }

  test("tie-heavy column still returns exact values") {
    // one giant tie run at the median: the bracket swallows the whole
    // run (correct, just bigger) — results must stay exact; the sort
    // fallback is the defensive path for when a bracket misses
    val df = (Seq.fill(5000)(42.0) ++ Seq(1.0, 2.0, 3.0, 100.0, 200.0))
      .toDF("x")
    val sorted = df.collect().map(_.getDouble(0)).sorted
    val got = Quantiles.exact(df, "x", Seq(0.0, 0.5, 1.0))
    assert(got == Seq(refQuantile(sorted, 0.0), refQuantile(sorted, 0.5), refQuantile(sorted, 1.0)))
  }

  test("single-row and two-row inputs interpolate correctly") {
    assert(Quantiles.exact(Seq(7.0).toDF("x"), "x", Seq(0.0, 0.5, 1.0)) == Seq(7.0, 7.0, 7.0))
    val two = Quantiles.exact(Seq(1.0, 3.0).toDF("x"), "x", Seq(0.5))
    assert(two == Seq(2.0))
  }
}
