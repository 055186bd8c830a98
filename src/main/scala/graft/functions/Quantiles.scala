package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed quantiles (SQL-standard percentile_cont / DuckDB
  * quantile_cont interpolation: pos = (n−1)·p, v = v_lo + (v_hi −
  * v_lo)·frac) via **filter-and-refine**:
  *
  *  1. one pass: row count + approx_percentile brackets around each
  *     requested quantile (rank error ≤ n/accuracy, so the bracket
  *     provably contains the exact order statistics);
  *  2. one pass: per quantile, count of rows below the bracket + the
  *     bracket's values collected and sorted locally (≈ 6n/accuracy
  *     rows, a few KB at any corpus size) → exact boundary values.
  *
  * Two linear scans, no global sort, O(#quantiles · n/accuracy) bytes
  * to the driver — this is the shape that holds at 100 TB, where a
  * full range-partitioned sort (the previous implementation, kept
  * below as `sortedExact` fallback) pays a whole shuffle of the
  * column. The refine step is exact, so results are bit-identical to
  * the sort path.
  *
  * Scope: mostly-distinct numeric columns (prices, scores). A column
  * with huge tie runs at the quantile (low-cardinality ints) can make
  * the bracket arbitrarily large — those columns should use the
  * built-in hashmap-based `percentile` (O(distinct) memory, see q32)
  * instead; if the bracket misses, this implementation falls back to
  * the full sort rather than returning anything approximate.
  */
object Quantiles {

  private val Accuracy = 10000 // approx rank error <= n/Accuracy

  def exact(df: DataFrame, column: String, ps: Seq[Double]): Seq[Double] = {
    val vals = df.select(col(column).cast("double").as("v")).na.drop()
    val delta = 3.0 / Accuracy
    val psLo = ps.map(p => math.max(0.0, p - delta))
    val psHi = ps.map(p => math.min(1.0, p + delta))
    val head = vals.agg(
      count(col("v")).as("n"),
      expr(s"approx_percentile(v, array(${psLo.mkString(", ")}), $Accuracy)").as("lo"),
      expr(s"approx_percentile(v, array(${psHi.mkString(", ")}), $Accuracy)").as("hi")).head()
    val n = head.getLong(0)
    require(n > 0, s"exact quantiles of empty column $column")
    val lo = head.getSeq[Double](1)
    val hi = head.getSeq[Double](2)

    val aggCols = ps.indices.flatMap { i =>
      Seq(
        sum((col("v") < lo(i)).cast("long")).as(s"clo_$i"),
        sort_array(collect_list(
          when(col("v") >= lo(i) && col("v") <= hi(i), col("v")))).as(s"win_$i"))
    }
    val r = vals.agg(aggCols.head, aggCols.drop(1): _*).head()

    val refined: Seq[Option[Double]] = ps.indices.map { i =>
      val pos = (n - 1) * ps(i)
      val kLo = math.floor(pos).toLong
      val kHi = math.ceil(pos).toLong
      val frac = pos - kLo
      val cLo = Option(r.get(2 * i)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val win = r.getSeq[Double](2 * i + 1)
      if (kLo < cLo || kHi - cLo >= win.length) None // bracket missed (tie run)
      else {
        val vLo = win((kLo - cLo).toInt)
        val vHi = win((kHi - cLo).toInt)
        Some(vLo + (vHi - vLo) * frac)
      }
    }
    if (refined.forall(_.isDefined)) refined.map(_.get)
    else sortedExact(vals, n, ps)
  }

  /** Full range-partitioned sort + zipWithIndex fallback — exact on any
    * distribution, at the cost of shuffling the whole column.
    */
  private def sortedExact(vals: DataFrame, n: Long, ps: Seq[Double]): Seq[Double] = {
    val rdd = vals
      .rdd.map(_.getDouble(0))
      .sortBy(identity)
      .zipWithIndex()
    val targets: Set[Long] = ps.flatMap { p =>
      val pos = (n - 1) * p
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
    }.toSet
    val at: Map[Long, Double] = rdd
      .filter { case (_, i) => targets.contains(i) }
      .map { case (v, i) => (i, v) }
      .collect().toMap
    ps.map { p =>
      val pos = (n - 1) * p
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      val frac = pos - lo
      at(lo) + (at(hi) - at(lo)) * frac
    }
  }
}
