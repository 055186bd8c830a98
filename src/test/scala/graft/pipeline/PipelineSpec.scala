package graft.pipeline

import java.nio.file.{Files, Paths}

import scala.concurrent.ExecutionContext.Implicits.global
import scala.util.Success

import graft.SparkSpec
import graft.ingest._

/** Full A ∥ B → C run against canned HTTP: fixture BLS listing/file and
  * population payload land in a temp raw zone, analytics publishes the
  * three curated tables + DQ run log, validation passes, and the golden
  * values from the reference's executed outputs hold.
  */
class PipelineSpec extends SparkSpec {

  private val source = "https://example.test/pub/time.series/pr/"
  private val apiUrl = "https://api.test/data.jsonrecords"

  test("pipeline end-to-end: ingest concurrently, publish, validate") {
    val dir = Files.createTempDirectory("graft-pipeline").toString
    val blsBody = new String(
      Files.readAllBytes(Paths.get(fixturePath("pr.data.0.Current"))), "UTF-8")
    val popBody = new String(
      Files.readAllBytes(Paths.get(fixturePath("population.json"))), "UTF-8")

    val cfg = PipelineConfig(
      blsSource = source,
      blsTargetDir = s"$dir/raw_bls",
      populationUrl = apiUrl,
      populationTargetPath = s"$dir/raw_datausa/population.json",
      populationMetaPath = s"$dir/raw_datausa/_meta/population_ingest_run.json",
      database = "graft_test_db")

    val popCfg = PopulationIngestConfig(
      url = apiUrl,
      targetPath = cfg.populationTargetPath,
      metaPath = cfg.populationMetaPath)
    val fetcher = new FakeFetcher(Map(
      source -> Success("""<a href="pr.data.0.Current">x</a>"""),
      (source + "pr.data.0.Current") -> Success(blsBody),
      PopulationIngest.queryUrl(popCfg) -> Success(popBody)))

    val report = Pipeline.run(spark, fetcher, LocalFileStore, cfg)

    assert(report.blsSync.status.contains("success"))
    assert(report.blsSync.uploaded == 1)
    assert(report.populationIngest.mode.contains("api_success"))
    assert(report.populationIngest.rows.contains(10))
    assert(report.publishedTables.size == 3)

    // published tables are re-readable through the catalog (S5)
    val stats = spark.table("graft_test_db.population_stats_2013_2018").head()
    assert(math.abs(stats.getDouble(0) - 3.22069808e8) < 1.0)
    assert(math.abs(stats.getDouble(1) - 4158441.040908095) < 1e-6)

    val best = spark.table("graft_test_db.bls_best_year_by_series")
    assert(best.filter("series_id = 'PRS30006011'").head().getInt(1) == 1995)
    val bestCount = best.count()

    val rep = spark.table("graft_test_db.report_prs30006032_q01")
    assert(rep.count() == 4)
    assert(rep.filter("year = 2020").head().isNullAt(4))

    // DQ run log appends one row per run
    val n1 = spark.table("graft_test_db.dq_summary_runlog").count()
    Pipeline.runAnalytics(spark, cfg)
    val n2 = spark.table("graft_test_db.dq_summary_runlog").count()
    assert(n2 == n1 + 1, "dq_summary_runlog must be append-only")

    // overwrite publish is idempotent: re-run leaves the same row count
    assert(spark.table("graft_test_db.bls_best_year_by_series").count() == bestCount)
  }
}
