package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV distinct-count sketch as a typed `Aggregator` — the UDAF form
  * of `operators.KmvSketch` (q42), for streaming/incremental use: the
  * state is the SET of the K smallest distinct hash values seen
  * (≤ K longs), `merge` is union + re-take-min-K — commutative,
  * associative, and idempotent on re-delivered hashes, so partial
  * sketches fold across partitions and micro-batches in any order and
  * the result is independent of where batch boundaries fall
  * (EventStreamsSpec pins stream == batch). The input is the
  * engine-portable `token_hash60` of the key, so an external engine
  * can recompute the identical sketch and estimate.
  */
object MinKSketch extends Aggregator[Long, Array[Long], Seq[Long]] {
  val K = 32

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert `h` keeping the buffer a sorted distinct min-K set. */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else if (buf.length < K) {
      val ins = -pos - 1
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (h >= buf(K - 1)) buf // not among the K smallest
    else {
      val ins = -pos - 1
      val out = new Array[Long](K)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, K - ins - 1)
      out
    }
  }

  /** Sorted-merge union, capped at K distinct values. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0
    var j = 0
    var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else out.take(n)
  }

  override def finish(s: Array[Long]): Seq[Long] = s.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Distinct-count estimate from an emitted sketch: the exact size
    * while the sketch is unsaturated, (K−1)·2^60/h_K once full —
    * q42's arithmetic, rounded 4 dp.
    */
  def estimate(sketch: Column): Column =
    when(size(sketch) < K, size(sketch).cast("double"))
      .otherwise(round(
        try_divide(lit((K - 1).toDouble) * lit(1L << 60), element_at(sketch, K)), 4))
}
