package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point (SURVEY.md §2.1 S6): register the synthetic tables
  * as temp views so the whole engine surface is reachable through
  * `spark.sql(...)` — same Catalyst pipeline, same plans as the
  * DataFrame API.
  */
object Sql {

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { name =>
      val df =
        if (name == "events") Tables.events(spark, sfDir)
        else Tables(spark, sfDir, name)
      df.createOrReplaceTempView(name)
    }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(query)
  }
}
