package graft.core

import graft.SparkSpec
import graft.queries.Registry

/** The SQL surface produces the same results as the DataFrame API —
  * both are the same Catalyst plans.
  */
class SqlSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame pricing summary") {
    val viaSql = Sql.sql(spark, sfDir,
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity),2) AS sum_qty,
           count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
         GROUP BY l_returnflag, l_linestatus""").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    val viaDf = Registry.byName("q01_pricing_summary").run(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaSql == viaDf)
  }

  test("window function through SQL: best ship-year per supplier matches q05") {
    val viaSql = Sql.sql(spark, sfDir,
      """WITH yearly AS (
           SELECT l_suppkey, year(l_shipdate) AS ship_year,
                  round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
           FROM lineitem GROUP BY 1, 2)
         SELECT l_suppkey, ship_year AS best_year, revenue FROM (
           SELECT *, row_number() OVER (
             PARTITION BY l_suppkey ORDER BY revenue DESC, ship_year ASC) AS rn
           FROM yearly) WHERE rn = 1""").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val viaDf = Registry.byName("q05_window_top1").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(viaSql == viaDf)
  }

  test("events view is readable through SQL with the normalized timestamp") {
    val n = Sql.sql(spark, sfDir,
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .head().getLong(0)
    assert(n > 0)
  }
}
