package graft.queries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Shared small-frame helpers for query definitions. */
object QueryUtil {

  /** Rank attached DRIVER-side to an already-ordered, already-limited
    * MODEL-sized frame (the q13/q54 driver-arithmetic pattern):
    * `orderBy(...).limit(k)` plans as TakeOrderedAndProject
    * (per-partition heaps, no global sort), `collect()` preserves its
    * order, and rank = position. The alternative — an unpartitioned
    * `row_number()` Window over the same k rows — costs a needless
    * single-partition exchange barrier and logs the scary
    * `WindowExec: No Partition Defined` WARN on every run (r11
    * verdict item 3). Only for frames already truncated to model
    * size; corpus-scale ranking keeps the distributed window path.
    */
  def withRank(ordered: DataFrame, rankCol: String = "rank"): DataFrame = {
    val spark = ordered.sparkSession
    val out = ordered.collect().zipWithIndex.map { case (r, i) =>
      Row.fromSeq((i + 1) +: r.toSeq)
    }
    spark.createDataFrame(
      new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(out.toSeq).asJava),
      StructType(
        StructField(rankCol, IntegerType, nullable = false) +:
          ordered.schema.fields))
  }
}
