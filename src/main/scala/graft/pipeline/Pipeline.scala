package graft.pipeline

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Analytics
import graft.dq.DataQuality
import graft.ingest._
import graft.parse.PopulationParser

/** End-to-end orchestration of the reference's `rearc_quest_pipeline`
  * workflow (README.md:111-134): Task A (BLS mirror sync) ∥ Task B
  * (population API ingest) → Task C (analytics + DQ). The Databricks
  * Workflow dependency edge becomes two `Future`s awaited before the
  * analytics stage; each stage returns its typed run report.
  */
final case class PipelineConfig(
    blsSource: String,
    blsTargetDir: String,
    blsFileName: String = "pr.data.0.Current",
    populationUrl: String,
    populationTargetPath: String,
    populationMetaPath: String,
    database: String = "rearc_quest_lakehouse",
    enableDelete: Boolean = true)

final case class PipelineReport(
    blsSync: BlsRunMeta,
    populationIngest: PopulationRunMeta,
    publishedTables: Seq[String])

/** Publish sinks (K1/K2): parquet saveAsTable with the reference's
  * overwrite / append semantics (Delta jars are absent in this
  * environment; the format is the only difference — SURVEY.md §7.4.8).
  */
object TableSink {

  /** If the catalog lost track of `table` (e.g. a previous run used the
    * in-memory catalog) but its warehouse directory survived, drop the
    * orphaned location so the overwrite stays idempotent across JVMs.
    */
  private def healOrphanLocation(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val rel = table.split('.') match {
        case Array(db, t) => s"$db.db/$t"
        case Array(t) => t
      }
      val path = new org.apache.hadoop.fs.Path(s"$warehouse/$rel")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
  }

  def overwrite(df: DataFrame, table: String): Unit = {
    healOrphanLocation(df, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  def append(df: DataFrame, table: String): Unit = {
    healOrphanLocation(df, table)
    df.write.mode("append").format("parquet").saveAsTable(table)
  }

  /** MERGE INTO (upsert) semantics on the parquet sink — the last piece
    * of the reference's Delta publish surface re-expressed without the
    * Delta log: target rows whose key matches an update are replaced,
    * unmatched target rows survive, unmatched updates insert.
    * `updates` must be unique per key (same contract as Delta MERGE,
    * which errors on multiple matches) — enforced with a hard failure
    * before any write, so a duplicate-keyed CDC batch cannot corrupt
    * the table.
    *
    * Shape: one left-anti join (update keys vs target — Catalyst
    * broadcasts the DISTINCT key projection when it is small, the
    * common CDC case) + a union, then a copy-on-write of the table.
    * The merged frame is checkpointed BEFORE the overwrite because
    * Spark (correctly) refuses to overwrite a table still being
    * scanned by the writing plan. At production scale the rewrite
    * narrows to affected partitions (dynamic partition overwrite over
    * the same anti-join); a transactional log (Delta/Iceberg) would
    * replace the full-file copy — documented substitute, same
    * semantics.
    */
  def merge(updates: DataFrame, table: String, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val spark = updates.sparkSession
    // enforce the documented Delta contract instead of silently writing
    // duplicate-key rows; one aggregation over the (small, CDC-sized)
    // update batch. Aliased count — a key column literally named
    // "count" must not make the guard itself ambiguous.
    val dupKeys = updates
      .groupBy(keys.map(org.apache.spark.sql.functions.col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") > 1).count()
    require(dupKeys == 0,
      s"merge: updates contain $dupKeys duplicate key group(s) on (${keys.mkString(", ")}) — " +
        "MERGE requires unique update keys")
    healOrphanLocation(updates, table)
    if (!spark.catalog.tableExists(table)) { overwrite(updates, table); return }
    val target = spark.table(table)
    val survivors = target.join(
      updates.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(),
      keys, "left_anti")
    val snapshot = survivors.unionByName(updates).localCheckpoint(true)
    overwrite(snapshot, table)
  }
}

object Pipeline {

  /** Tasks A ∥ B: both ingests run concurrently, like the workflow's
    * parallel tasks.
    */
  def runIngest(
      fetcher: HttpFetcher,
      store: FileStore,
      config: PipelineConfig)(implicit ec: ExecutionContext): (BlsRunMeta, PopulationRunMeta) = {
    val fa = Future(BlsMirrorSync.run(fetcher, store,
      BlsSyncConfig(config.blsSource, config.blsTargetDir, config.enableDelete)))
    val fb = Future(PopulationIngest.run(fetcher, store,
      PopulationIngestConfig(
        url = config.populationUrl,
        targetPath = config.populationTargetPath,
        metaPath = config.populationMetaPath)))
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }

  /** Task C: parse the raw zone, publish the three curated tables,
    * append the DQ run log, validate (20_analytics.ipynb cell 14).
    */
  def runAnalytics(spark: SparkSession, config: PipelineConfig): Seq[String] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${config.database}")
    val db = config.database

    // the DSv2 source carries the same parse semantics as BlsParser
    // (header/blank/malformed/footnote handling) with in-reader pruning
    val bls = spark.read.format("bls")
      .load(s"${config.blsTargetDir}/${config.blsFileName}")
    val population = PopulationParser.parseFile(spark, config.populationTargetPath)

    val tables = Seq(
      s"$db.population_stats_2013_2018" -> Analytics.populationStats(population),
      s"$db.bls_best_year_by_series" -> Analytics.bestYearBySeries(bls),
      s"$db.report_prs30006032_q01" -> Analytics.reportSeriesQ01(bls, population))
    tables.foreach { case (name, df) => TableSink.overwrite(df, name) }

    TableSink.append(DataQuality.summary(spark, bls, population), s"$db.dq_summary_runlog")

    validate(spark, bls, population, tables.map(_._1))
    tables.map(_._1)
  }

  /** Inline validation (20_analytics.ipynb:3108-3172): non-empty
    * inputs, zero rows with null critical fields (hard failure), all
    * output tables resolvable.
    */
  def validate(
      spark: SparkSession,
      bls: DataFrame,
      population: DataFrame,
      outputTables: Seq[String]): Unit = {
    require(bls.count() > 0, "BLS parse produced 0 rows")
    require(population.count() > 0, "population parse produced 0 rows")
    val badBls = bls.where(
      col("series_id").isNull || col("year").isNull ||
        col("period").isNull || col("value").isNull).count()
    if (badBls != 0)
      throw new RuntimeException(s"$badBls BLS rows with null critical fields")
    outputTables.foreach(t => require(spark.table(t) != null, s"missing output table $t"))
  }

  def run(
      spark: SparkSession,
      fetcher: HttpFetcher,
      store: FileStore,
      config: PipelineConfig)(implicit ec: ExecutionContext): PipelineReport = {
    val (blsMeta, popMeta) = runIngest(fetcher, store, config)
    val tables = runAnalytics(spark, config)
    PipelineReport(blsMeta, popMeta, tables)
  }
}
