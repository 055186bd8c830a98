package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV min-k state as a typed `Aggregator`, parameterized by k — the
  * partial-aggregate form of `operators.KmvSketch`: the state is the
  * SET of the k smallest distinct hash values seen (≤ k longs),
  * `merge` is union + re-take-min-k — commutative, associative, and
  * idempotent on re-delivered hashes, so partial sketches fold across
  * partitions and micro-batches in any order. Used by q42's batch
  * estimator (map-side combine: the shuffle carries O(groups × k)
  * longs instead of the distinct hash stream) and, as the fixed-K
  * [[MinKSketch]] instance, by the streaming windowed sketch.
  */
class MinKAgg(val k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k >= 1, s"min-k sketch needs k >= 1, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert `h` keeping the buffer a sorted distinct min-k set.
    * Negative inputs are ignored: every portable hash here is
    * non-negative (60-bit md5 prefixes), so −1 serves as the "skip
    * this row" sentinel that lets one aggregation pass carry several
    * conditionally-fed sketches (q43's side sketches).
    */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    if (h < 0) return buf
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else if (buf.length < k) {
      val ins = -pos - 1
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (h >= buf(k - 1)) buf // not among the k smallest
    else {
      val ins = -pos - 1
      val out = new Array[Long](k)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
      out
    }
  }

  /** Sorted-merge union, capped at k distinct values. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
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
}

/** The fixed-K (32) sketch instance for streaming/incremental use —
  * the input is the engine-portable `token_hash60` of the key, so an
  * external engine can recompute the identical sketch and estimate
  * (EventStreamsSpec pins stream == batch).
  */
object MinKSketch extends MinKAgg(32) {
  val K = 32

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
