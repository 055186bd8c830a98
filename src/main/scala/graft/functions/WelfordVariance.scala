package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sample variance as a typed `Aggregator` (the UDAF surface, SURVEY.md
  * §2.12 extension): Welford's streaming update per partition merged
  * with the Chan et al. pairwise-combine formula — the canonical shape
  * of a DISTRIBUTED custom aggregate: constant-size state, one-pass
  * update, associative merge. Numerically stable where the naive
  * E[x²]−E[x]² form cancels catastrophically.
  *
  * Registered per-session via `functions.udaf(WelfordVariance)`; the
  * result agrees with Spark's builtin `var_samp` and the DuckDB
  * oracle to well below the engine-wide rounding (q38).
  */
final case class WelfordState(n: Long, mean: Double, m2: Double)

object WelfordVariance extends Aggregator[Double, WelfordState, java.lang.Double] {
  type State = WelfordState

  override def zero: State = WelfordState(0L, 0.0, 0.0)

  override def reduce(s: State, x: Double): State = {
    val n = s.n + 1
    val delta = x - s.mean
    val mean = s.mean + delta / n
    WelfordState(n, mean, s.m2 + delta * (x - mean))
  }

  override def merge(a: State, b: State): State = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      WelfordState(
        n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n)
    }
  }

  override def finish(s: State): java.lang.Double =
    if (s.n < 2) null else s.m2 / (s.n - 1)

  override def bufferEncoder: Encoder[State] = Encoders.product[State]
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
