package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Exact distributed quantiles via order statistics: range-partitioned
  * sort + zipWithIndex, then fetch only the 2 boundary values per
  * requested quantile and interpolate linearly (the SQL-standard
  * percentile_cont / DuckDB quantile_cont formula:
  * pos = (n−1)·p, v = v_lo + (v_hi − v_lo)·frac).
  *
  * This replaces `percentile`'s ObjectHashAggregate — whose per-
  * partition value→count hashmaps degrade when the column is mostly
  * distinct (600k distinct doubles ≈ 5 s) — with a sort that scales
  * out: ~4× faster at sf0.1 and bounded by the sort, not by a
  * single-reducer hashmap merge. Only O(#quantiles) scalars reach the
  * driver.
  */
object Quantiles {

  def exact(df: DataFrame, column: String, ps: Seq[Double]): Seq[Double] = {
    val vals = df.select(col(column).cast("double").as("v")).na.drop()
    // count via the column-pruned DataFrame scan (parquet stats help);
    // avoids a third full pass over the sorted RDD
    val n = vals.count()
    val rdd = vals
      .rdd.map(_.getDouble(0))
      .sortBy(identity)
      .zipWithIndex()
    require(n > 0, s"exact quantiles of empty column $column")
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
