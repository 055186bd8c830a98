package graft.analytics

import graft.SparkSpec
import graft.parse.{BlsParser, PopulationParser}

/** Golden tests against the executed outputs embedded in the reference
  * notebooks (FIXTURES.md §3).
  */
class AnalyticsSpec extends SparkSpec {

  lazy val bls = BlsParser.parseFile(spark, fixturePath("pr.data.0.Current")).cache()
  lazy val population = PopulationParser.parseFile(spark, fixturePath("population.json")).cache()

  test("Req A: golden mean and SAMPLE stddev over 2013-2018") {
    val row = Analytics.populationStats(population).head()
    assert(math.abs(row.getDouble(0) - 3.22069808e8) < 1.0)
    // golden 4158441.040908095 distinguishes stddev_samp from stddev_pop
    assert(math.abs(row.getDouble(1) - 4158441.040908095) < 1e-6)
  }

  test("Req A: column names match the published table") {
    assert(Analytics.populationStats(population).columns.toSeq ==
      Seq("mean_population", "stddev_population"))
  }

  test("Req B: yearly sums include the Q05 annual-average pseudo-quarter") {
    val best = Analytics.bestYearBySeries(bls)
      .filter("series_id = 'PRS30006011'").head()
    // 1995 sum = 2.6+2.1+0.9+0.1+1.4 = 7.1 (Q05 included); 1996 sum = -0.5
    assert(best.getInt(1) == 1995)
    assert(math.abs(best.getDouble(2) - 7.1) < 1e-9)
  }

  test("Req B: ties break to the earliest year") {
    val best = Analytics.bestYearBySeries(bls)
      .filter("series_id = 'TIE0000001'").head()
    assert(best.getInt(1) == 2001)
    assert(best.getDouble(2) == 5.0)
  }

  test("Req B: exactly one row per series") {
    val out = Analytics.bestYearBySeries(bls)
    assert(out.count() == out.select("series_id").distinct().count())
    assert(out.columns.toSeq == Seq("series_id", "best_year", "summed_value"))
  }

  test("Req C: left join keeps BLS rows with missing population years") {
    val report = Analytics.reportSeriesQ01(bls, population).cache()
    // USING-join column order: year first, single copy
    assert(report.columns.toSeq == Seq("year", "series_id", "period", "value", "population"))
    val rows = report.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2013, 2014, 2015, 2020))
    val r2013 = rows.find(_.getInt(0) == 2013).get
    assert(r2013.getDouble(4) == 316128839.0)
    val r2020 = rows.find(_.getInt(0) == 2020).get
    assert(r2020.isNullAt(4), "2020 must have null population")
    assert(r2020.getDouble(3) == -7.0)
  }

  test("Req C: only the requested series/period appears") {
    val report = Analytics.reportSeriesQ01(bls, population)
    assert(report.select("series_id").distinct().count() == 1)
    assert(report.select("period").distinct().head().getString(0) == "Q01")
  }
}
