package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations: when one group key carries a
  * disproportionate share of rows (the classic hot-key shuffle
  * straggler at 100 TB), aggregate in two phases — first on
  * (key, salt) so the hot key's rows spread over `buckets` reducers,
  * then combine the partials per key. The salt is a deterministic hash
  * of a high-cardinality spread column, so re-runs are stable.
  *
  * AQE's skew-join splitting handles *joins*; this handles aggregation
  * skew, which AQE does not repartition.
  */
object Salting {

  /** Sum/count aggregation with a salted first phase.
    *
    * @param spreadCol high-cardinality column used to derive the salt
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[String],
      spreadCol: Column,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(spreadCol), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        sums.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__cnt")).as("n_rows"),
        sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }
}
