package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory tuned for this environment: single-JVM `local[N]`
  * standing in for a multi-executor cluster. Shuffle partitions are
  * sized to cores (not the 200 default) so small-SF runs don't pay
  * scheduling overhead; AQE stays on so the same code re-plans
  * (coalesce post-shuffle partitions, skew-join split) at real scale.
  */
object GraftSession {

  /** @param hive enable the Hive (derby) metastore so `saveAsTable`
    *   publishes survive JVM restarts — required for the pipeline's
    *   idempotent latest-snapshot overwrite semantics; query-only
    *   sessions skip it (faster startup, no metastore lock).
    */
  def local(cores: Int = 32, appName: String = "graft", hive: Boolean = false): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (hive) b.enableHiveSupport() else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
