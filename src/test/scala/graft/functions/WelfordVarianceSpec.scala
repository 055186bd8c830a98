package graft.functions

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

class WelfordVarianceSpec extends SparkSpec {

  private def naiveVarSamp(xs: Seq[Double]): Double = {
    val m = xs.sum / xs.size
    xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
  }

  private def check(prop: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("merge is associative and agrees with the sequential fold") {
    val gen = for {
      xs <- Gen.listOfN(30, Gen.choose(-1000.0, 1000.0))
      cut <- Gen.choose(1, 29)
    } yield (xs, cut)
    check(Prop.forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val seqState = xs.foldLeft(WelfordVariance.zero)(WelfordVariance.reduce)
      val merged = WelfordVariance.merge(
        l.foldLeft(WelfordVariance.zero)(WelfordVariance.reduce),
        r.foldLeft(WelfordVariance.zero)(WelfordVariance.reduce))
      val v = WelfordVariance.finish(seqState)
      math.abs(merged.mean - seqState.mean) < 1e-9 &&
        math.abs(merged.m2 - seqState.m2) / (seqState.m2 + 1e-12) < 1e-9 &&
        math.abs(v - naiveVarSamp(xs)) / (v + 1e-12) < 1e-6
    })
  }

  test("single-element and empty groups yield null (SQL var_samp semantics)") {
    assert(WelfordVariance.finish(WelfordVariance.zero) == null)
    assert(WelfordVariance.finish(
      WelfordVariance.reduce(WelfordVariance.zero, 5.0)) == null)
  }

  test("distributed UDAF matches builtin var_samp on real data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val welford = udaf(WelfordVariance)
    val r = graft.core.Tables.lineitem(spark, sfDir)
      .agg(welford($"l_extendedprice").as("w"), var_samp($"l_extendedprice").as("b"))
      .head()
    val (w, b) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(w - b) / b < 1e-10, s"$w vs $b")
  }
}
