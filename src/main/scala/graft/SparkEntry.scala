package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in `graft.queries.Registry`; this object is the
  * stable façade the driver calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Uses the Req-B-shaped window top-1 (scan → filter →
    * partial/final agg → single window shuffle → filter).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q05_window_top1").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
