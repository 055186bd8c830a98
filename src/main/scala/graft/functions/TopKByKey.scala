package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k by (key desc, id asc) as a typed `Aggregator` — the
  * reservoir state of the Efraimidis–Spirakis weighted sample
  * (`operators.WeightedSample`) in UDAF form, for streaming windows:
  * state is ≤ k (key, id) pairs, `merge` is a sorted-union re-take —
  * commutative, associative, and idempotent on re-delivered items
  * (a re-delivered event carries the same deterministic hash key, so
  * it deduplicates instead of double-sampling). The same monoid shape
  * as [[MinKSketch]], ordered descending and carrying the sampled id.
  */
case class TopKByKey(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // sort key: larger sample key first, then smaller id — the exact
  // (samp_key desc, id asc) order WeightedSample ranks with
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.contains(x)) buf
    else if (buf.sizeIs >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      ((pre :+ x) ++ post).take(k)
    }

  override def merge(
      a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(s: Seq[(Double, Long)]): Seq[(Double, Long)] = s

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
