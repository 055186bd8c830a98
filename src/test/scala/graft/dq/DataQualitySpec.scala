package graft.dq

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.parse.{BlsParser, PopulationParser}

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  lazy val bls = BlsParser.parseFile(spark, fixturePath("pr.data.0.Current")).cache()
  lazy val population = PopulationParser.parseFile(spark, fixturePath("population.json")).cache()

  test("full-row duplicates: zero on clean data, counted when present") {
    assert(DataQuality.fullRowDuplicates(bls) == 0)
    val withDup = bls.union(bls.limit(3))
    assert(DataQuality.fullRowDuplicates(withDup) == 3)
  }

  test("business-key duplicate detector is empty on unique keys") {
    assert(DataQuality.businessKeyDuplicates(bls, Seq("series_id", "year", "period")).count() == 0)
    val dup = bls.union(bls.limit(1))
    assert(DataQuality.businessKeyDuplicates(dup, Seq("series_id", "year", "period")).count() == 1)
  }

  test("null profile counts per column in one pass") {
    val df = Seq((Some(1), Option.empty[String]), (None, Some("x")), (Some(3), Some("y")))
      .toDF("a", "b")
    val row = DataQuality.nullProfile(df, Seq("a", "b")).head()
    assert(row.getLong(0) == 1 && row.getLong(1) == 1)
  }

  test("quarter completeness counts ALL periods including Q05 (reference semantics)") {
    val qc = DataQuality.quarterCompleteness(bls)
    // PRS30006011/1995 has Q01..Q05 -> 5 periods -> NOT complete (==4)
    val r = qc.filter("series_id = 'PRS30006011' and year = 1995").head()
    assert(r.getLong(2) == 5)
    assert(!r.getBoolean(3))
    // TIE0000001/2001 has only Q01 -> 1
    assert(qc.filter("series_id = 'TIE0000001' and year = 2001").head().getLong(2) == 1)
  }

  test("IQR bounds via approxQuantile and outlier filter") {
    val vals = (1 to 100).map(_.toDouble) :+ 10000.0
    val df = vals.toDF("v")
    val (lo, hi) = DataQuality.iqrBounds(df, "v")
    assert(lo < 1.0 && hi < 10000.0)
    assert(DataQuality.iqrOutliers(df, "v").count() == 1)
  }

  test("domain checks: min/max and negative census") {
    val (lo, hi) = DataQuality.minMax(bls, "year")
    assert(lo == 1995 && hi == 2020)
    assert(DataQuality.countWhere(bls, col("value") < 0) == 7)
  }

  test("summary row carries the reference's metric names") {
    val row = DataQuality.summary(spark, bls, population)
    val names = row.columns.toSeq
    assert(names.contains("bls_rows") && names.contains("bls_outlier_rows_iqr")
      && names.contains("population_non_positive_values") && names.contains("run_utc"))
    val r = row.head()
    assert(r.getAs[Long]("bls_rows") == 16)
    assert(r.getAs[Long]("population_rows") == 10)
    assert(r.getAs[Long]("bls_distinct_series_id") == 3)
  }
}
