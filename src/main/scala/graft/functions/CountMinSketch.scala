package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.reflect.runtime.universe._

/** Count-Min sketch as a typed `Aggregator` (SURVEY.md §2.12 extension,
  * the frequency-sketch sibling of q24's cardinality sketches): a
  * Depth×Width counter grid where each item increments one cell per
  * row, and a point estimate is the MIN of its cells — an upper bound
  * on the true count (ε ≈ e/Width overestimate with probability
  * 1 − e^−Depth, never an underestimate).
  *
  * The aggregator takes the item's Depth bucket indices already
  * computed (codegen'd md5 windows in the query — engine-portable, so
  * DuckDB can re-derive the identical grid); the UDAF itself is pure
  * arithmetic on a constant-size state. `merge` is elementwise add —
  * commutative and associative, so the final grid is independent of
  * row order and partitioning. That order-independence is what makes
  * an EXACT oracle replay possible where HLL (q24) only supports a
  * tolerance gate: every grid cell is a plain sum, and DuckDB computes
  * the same sums by group-by. At 100 TB the sketch is the point: a
  * 4×1024-long state (32 KiB) summarizes any number of rows, partial
  * aggregation collapses each partition map-side, and the shuffle
  * carries one grid per partition instead of a token census.
  */
object CountMinSketch extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
  val Depth = 4
  val Width = 1024

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(buf: Array[Long], buckets: Seq[Int]): Array[Long] = {
    var i = 0
    while (i < Depth) { buf(i * Width + buckets(i)) += 1L; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(s: Array[Long]): Seq[Long] = s.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** Weighted insert: (buckets, weight) adds `weight` to one cell per
    * depth row. Because every grid cell is a plain sum, inserting the
    * vocab-sized census (token → count) yields BIT-IDENTICAL grids to
    * inserting each occurrence — which lets q41/q55 build the sketch
    * from the exact census they aggregate anyway, deleting the second
    * full corpus pass (and its 4 md5s per OCCURRENCE; the weighted
    * build hashes each token once per TYPE). The per-occurrence
    * aggregator above stays the streaming face's insert path, where
    * no census exists.
    */
  object Weighted extends Aggregator[(Seq[Int], Long), Array[Long], Seq[Long]] {
    override def zero: Array[Long] = CountMinSketch.zero
    override def reduce(buf: Array[Long], in: (Seq[Int], Long)): Array[Long] = {
      val (buckets, w) = in
      var i = 0
      while (i < Depth) { buf(i * Width + buckets(i)) += w; i += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      CountMinSketch.merge(a, b)
    override def finish(s: Array[Long]): Seq[Long] = s.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Depth-row `i` bucket of a string key: an 8-hex-char md5 window
    * mod Width — engine-portable (DuckDB replays it), codegen'd.
    */
  def bucket(c: Column, i: Int): Column =
    (conv(substring(md5(c), 1 + 8 * i, 8), 16, 10).cast("long") % Width).cast("int")

  /** All Depth buckets of a key — the aggregator's input column. */
  def buckets(c: Column): Column = array((0 until Depth).map(bucket(c, _)): _*)

  /** Point estimate of `key` from a sketch column (the grid as a
    * 1-based Depth×Width array): min over rows of the key's cell.
    */
  def probe(sketch: Column, key: Column): Column =
    least((0 until Depth).map(i =>
      element_at(sketch, lit(i * Width + 1) + bucket(key, i))): _*)
}
