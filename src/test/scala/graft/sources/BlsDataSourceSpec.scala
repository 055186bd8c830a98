package graft.sources

import graft.SparkSpec
import graft.parse.BlsParser

class BlsDataSourceSpec extends SparkSpec {

  lazy val viaSource = spark.read.format("bls").load(fixturePath("pr.data.0.Current"))

  test("format(\"bls\") resolves via DataSourceRegister and yields the canonical schema") {
    assert(viaSource.schema == BlsDataSource.schema)
  }

  test("source results == BlsParser results on the golden fixture") {
    val a = viaSource.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSet
    val b = BlsParser.parseFile(spark, fixturePath("pr.data.0.Current")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3))).toSet
    assert(a == b)
    assert(a.size == 16)
  }

  test("column pruning reaches the reader: pruned scan outputs only requested fields") {
    val pruned = viaSource.select("year", "series_id")
    assert(pruned.collect().map(_.getInt(0)).min == 1995)
    val scanSchema = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.schema.fieldNames.toSeq)
    assert(scanSchema.exists(_.sorted == Seq("series_id", "year")),
      s"expected pruned scan schema, got $scanSchema")
  }

  test("the source composes with the analytics layer") {
    val best = graft.analytics.Analytics.bestYearBySeries(viaSource)
      .filter("series_id = 'PRS30006011'").head()
    assert(best.getInt(1) == 1995)
  }
}
