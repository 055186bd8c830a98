package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Relational operator coverage (SURVEY.md §2.3–§2.9) re-expressed over
  * the synthetic star schema. Every query is declarative DataFrame code:
  * filters/projections reach the parquet scan (predicate pushdown +
  * column pruning), aggregates run partial→final, the one small-dim
  * join is explicitly broadcast, and window top-1 shuffles once on its
  * partition key. Double-valued aggregates are rounded identically on
  * both the Spark and DuckDB side so FP summation order can't flip the
  * hash compare.
  */
object RelationalQueries {

  /** A2/A12 + F3 (range predicate before agg): TPC-H-Q1-shaped pricing
    * summary. Reference: grouped sum 20_analytics.ipynb:2180-2184 and
    * year-range filter :643. Scale: partial aggregation map-side; only
    * 4-ish groups shuffle.
    */
  val q01PricingSummary = Q(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1999-06-30").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity),2) AS sum_qty,
        round(sum(l_extendedprice),2) AS sum_base_price,
        round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        round(avg(l_quantity),4) AS avg_qty,
        round(avg(l_discount),4) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-06-30 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""),
    headline = true)

  /** P1 + F3/F6 (project + conjunctive range predicates): row-level
    * filter/project whose predicates must appear as parquet
    * PushedFilters. Reference: 20_analytics.ipynb:343-355, 643.
    */
  val q02FilterProject = Q(
    "q02_filter_project",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_discount" > 0.05 && $"l_quantity" >= 25)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem WHERE l_discount > 0.05 AND l_quantity >= 25"""))

  /** J1 (equi join) + A2, with the small dim explicitly broadcast —
    * the 100 TB plan is two shuffle-free broadcast joins feeding one
    * grouped aggregate. Reference join: 20_analytics.ipynb:2542-2557.
    */
  val q03JoinAgg = Q(
    "q03_join_agg",
    (s, dir) => {
      import s.implicits._
      val orders = Tables.orders(s, dir)
      val customer = Tables.customer(s, dir)
      val nation = Tables.nation(s, dir)
      orders
        .join(broadcast(customer.select($"c_custkey", $"c_nationkey")),
          $"o_custkey" === $"c_custkey")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          round(sum($"o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    },
    Some("""SELECT n_name, round(sum(o_totalprice),2) AS revenue, count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name"""),
    headline = true)

  /** J1 left-outer semantics (nulls on the probe side survive, as in the
    * reference's population-year join where 2020 is absent —
    * 20_analytics.ipynb:2554). Aggregate-then-join keeps the shuffled
    * side small; nation is the preserved side.
    */
  val q04LeftJoin = Q(
    "q04_left_join",
    (s, dir) => {
      import s.implicits._
      val nation = Tables.nation(s, dir)
      val perNation = Tables.customer(s, dir)
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("cnt"), sum($"c_acctbal").as("bal"))
      nation
        .join(perNation, $"n_nationkey" === $"c_nationkey", "left")
        .select(
          $"n_name",
          coalesce($"cnt", lit(0L)).as("n_customers"),
          round(coalesce($"bal", lit(0.0)), 2).as("total_acctbal"))
    },
    Some("""SELECT n_name, coalesce(cnt, 0) AS n_customers,
        round(coalesce(bal, 0.0), 2) AS total_acctbal
      FROM nation LEFT JOIN (
        SELECT c_nationkey, count(*) AS cnt, sum(c_acctbal) AS bal
        FROM customer GROUP BY c_nationkey) c
      ON n_nationkey = c_nationkey"""))

  /** W1 (row_number top-1-per-group with desc/asc tie-break — the
    * reference's "best year per series", 20_analytics.ipynb:2186-2196).
    * Revenue is rounded BEFORE ranking so both engines rank identical
    * values. One shuffle for the agg, one for the window partition.
    */
  val q05WindowTop1 = Q(
    "q05_window_top1",
    (s, dir) => {
      import s.implicits._
      val yearly = Tables.lineitem(s, dir)
        .groupBy($"l_suppkey", year($"l_shipdate").as("ship_year"))
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      val w = Window.partitionBy($"l_suppkey").orderBy($"revenue".desc, $"ship_year".asc)
      yearly
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"l_suppkey", $"ship_year".as("best_year"), $"revenue")
    },
    Some("""WITH yearly AS (
        SELECT l_suppkey, year(l_shipdate) AS ship_year,
               round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        FROM lineitem GROUP BY 1, 2),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY l_suppkey ORDER BY revenue DESC, ship_year ASC) AS rn
        FROM yearly)
      SELECT l_suppkey, ship_year AS best_year, revenue FROM ranked WHERE rn = 1"""),
    headline = true)

  /** A1 (global ungrouped mean/stddev — Req A, 20_analytics.ipynb:640-648;
    * stddev = SAMPLE stddev, n-1, per the golden value in BASELINE.md).
    */
  val q06GlobalStats = Q(
    "q06_global_stats",
    (s, dir) => {
      import s.implicits._
      Tables.customer(s, dir)
        .filter($"c_acctbal".between(0.0, 9000.0))
        .agg(
          round(avg($"c_acctbal"), 4).as("mean_bal"),
          round(stddev_samp($"c_acctbal"), 4).as("stddev_bal"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT round(avg(c_acctbal),4) AS mean_bal,
        round(stddev_samp(c_acctbal),4) AS stddev_bal,
        count(*) AS n_rows
      FROM customer WHERE c_acctbal BETWEEN 0.0 AND 9000.0"""))

  /** A4 (grouped count-distinct — quarter-completeness shape,
    * 21_EDA.ipynb:1877-1881).
    */
  val q07CountDistinct = Q(
    "q07_count_distinct",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          countDistinct($"o_custkey").as("n_cust"),
          countDistinct($"o_orderstatus").as("n_status"),
          count(lit(1)).as("n_orders"))
    },
    Some("""SELECT o_orderpriority,
        count(DISTINCT o_custkey) AS n_cust,
        count(DISTINCT o_orderstatus) AS n_status,
        count(*) AS n_orders
      FROM orders GROUP BY o_orderpriority"""),
    headline = true)

  /** A6/X7 (null-profile: sum of isNull casts per column —
    * 21_EDA.ipynb:1074-1081). Single pass over the table.
    */
  val q08NullProfile = Q(
    "q08_null_profile",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir).agg(
        sum($"user_id".isNull.cast("int")).as("null_user_id"),
        sum($"event_type".isNull.cast("int")).as("null_event_type"),
        sum($"value".isNull.cast("int")).as("null_value"),
        sum($"props".isNull.cast("int")).as("null_props"),
        count(lit(1)).as("total"))
    },
    // DuckDB sum(INTEGER) returns HUGEINT, which its pandas/arrow bridge
    // widens to float64 — CAST to BIGINT so both engines emit int64.
    Some("""SELECT
        CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
        CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
        CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
        CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
        count(*) AS total
      FROM events"""))

  /** F8 (post-agg HAVING: business-key duplicate detector,
    * 21_EDA.ipynb:666-668 — "should be 0 rows").
    */
  val q09DupCheck = Q(
    "q09_dup_check",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .groupBy($"l_orderkey", $"l_linenumber")
        .agg(count(lit(1)).as("n"))
        .filter($"n" > 1)
    },
    Some("""SELECT l_orderkey, l_linenumber, count(*) AS n
      FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1"""))

  /** A9/A10 (distinct counts / cardinalities — 21_EDA.ipynb:523-525) and
    * the dropDuplicates full-row variant.
    */
  val q10Cardinalities = Q(
    "q10_cardinalities",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      // Count distinct ROW HASHES, not distinct rows: the shuffle then
      // carries a 16-byte digest per row instead of the full row (the
      // md5-of-JSON is null-safe and column-order-stable). At 100 TB
      // this is the difference between shuffling the table and
      // shuffling a hash column. 128-bit digest keeps the collision
      // expectation ≪ 1 even at 10^12 rows (birthday bound ~3e-15).
      // Caveat for doubles: dropDuplicates treats NaN==NaN and
      // -0.0==0.0 as equal, but they serialize to DISTINCT JSON — on a
      // table that can hold NaN/-0.0, normalize (nanvl + x+0.0) before
      // to_json. Orders has no double edge values, so not needed here.
      val distinctRows = o
        .select(md5(to_json(struct(o.columns.map(col): _*))).as("__rh"))
        .agg(countDistinct($"__rh"))
        .head().getLong(0)
      o.agg(
        countDistinct($"o_orderstatus").as("n_status"),
        countDistinct($"o_orderpriority").as("n_priority"),
        countDistinct($"o_custkey").as("n_cust"),
        count(lit(1)).as("n_rows"))
        .withColumn("n_distinct_rows", lit(distinctRows))
    },
    Some("""SELECT
        count(DISTINCT o_orderstatus) AS n_status,
        count(DISTINCT o_orderpriority) AS n_priority,
        count(DISTINCT o_custkey) AS n_cust,
        count(*) AS n_rows,
        (SELECT count(*) FROM (SELECT DISTINCT * FROM orders)) AS n_distinct_rows
      FROM orders"""))

  /** A5 + F6 (global min/max domain check + negative-value census —
    * 21_EDA.ipynb:1372-1377).
    */
  val q11DomainMinmax = Q(
    "q11_domain_minmax",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).agg(
        min(year($"l_shipdate")).cast("long").as("min_year"),
        max(year($"l_shipdate")).cast("long").as("max_year"),
        countDistinct(year($"l_shipdate")).as("n_years"),
        sum(($"l_quantity" < 0).cast("int")).as("negative_qty"),
        sum(($"l_extendedprice" <= 0).cast("int")).as("nonpositive_price"))
    },
    // int64 on both sides: Spark year() is INT32 (DuckDB's is BIGINT),
    // and DuckDB sum(INTEGER) is HUGEINT (float64 through pandas).
    Some("""SELECT
        min(year(l_shipdate)) AS min_year,
        max(year(l_shipdate)) AS max_year,
        count(DISTINCT year(l_shipdate)) AS n_years,
        CAST(sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_qty,
        CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price
      FROM lineitem"""))

  /** O2 (orderBy desc + limit → TakeOrderedAndProject; unique key in the
    * sort makes the top-k deterministic — 20_analytics.ipynb:3169).
    */
  val q12TopK = Q(
    "q12_topk",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""),
    headline = true)

  /** A8's exact counterpart: percentiles. The reference uses
    * approxQuantile (Greenwald–Khanna, 21_EDA.ipynb:2309) which is not
    * oracle-matchable by construction; the oracle entry uses exact
    * `percentile` (linear interpolation — same as DuckDB quantile_cont),
    * and the DQ module keeps the approximate version.
    */
  val q13Percentile = Q(
    "q13_percentile",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      // distributed order statistics (graft.functions.Quantiles): sorts
      // scale out where percentile's distinct-value hashmaps don't; the
      // two independent column passes run as concurrent Spark jobs
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.{Await, Future}
      val fQty = Future(graft.functions.Quantiles.exact(li, "l_quantity", Seq(0.25, 0.5, 0.75)))
      val fPrice = Future(graft.functions.Quantiles.exact(li, "l_extendedprice", Seq(0.9)))
      val Seq(p25, p50, p75) = Await.result(fQty, scala.concurrent.duration.Duration.Inf)
      val Seq(p90) = Await.result(fPrice, scala.concurrent.duration.Duration.Inf)
      Seq((1)).toDF("one").select(
        round(lit(p25), 4).as("p25"),
        round(lit(p50), 4).as("p50"),
        round(lit(p75), 4).as("p75"),
        round(lit(p90), 4).as("price_p90"))
    },
    Some("""SELECT
        round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        round(quantile_cont(l_quantity, 0.75), 4) AS p75,
        round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
      FROM lineitem"""))

  /** A7 (describe(): count/mean/stddev/min/max of one column —
    * 21_EDA.ipynb:2121).
    */
  val q14Describe = Q(
    "q14_describe",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir).agg(
        count($"l_extendedprice").as("cnt"),
        round(avg($"l_extendedprice"), 4).as("mean_v"),
        round(stddev_samp($"l_extendedprice"), 4).as("stddev_v"),
        round(min($"l_extendedprice"), 2).as("min_v"),
        round(max($"l_extendedprice"), 2).as("max_v"))
    },
    Some("""SELECT count(l_extendedprice) AS cnt,
        round(avg(l_extendedprice),4) AS mean_v,
        round(stddev_samp(l_extendedprice),4) AS stddev_v,
        round(min(l_extendedprice),2) AS min_v,
        round(max(l_extendedprice),2) AS max_v
      FROM lineitem"""))

  /** X10 + F6 (IQR outlier detection, 21_EDA.ipynb:2309-2318). The
    * quantile bounds are computed in-plan (scalar-aggregate broadcast
    * join) instead of a driver-side collect — the same two-pass
    * semantics, but it stays distributed at 100 TB.
    */
  val q15IqrOutliers = Q(
    "q15_iqr_outliers",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      // two-pass IQR exactly as the reference does it (collect bounds,
      // inject as literals — 21_EDA.ipynb:2309-2314), with the quantile
      // pass as a distributed sort; the literal bounds then push down
      // to the parquet scan of the second pass
      val Seq(q1, q3) =
        graft.functions.Quantiles.exact(li, "l_extendedprice", Seq(0.25, 0.75))
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      li.filter($"l_extendedprice" < lo || $"l_extendedprice" > hi)
        .agg(
          count(lit(1)).as("n_outliers"),
          round(min($"l_extendedprice"), 2).as("min_outlier"),
          round(max($"l_extendedprice"), 2).as("max_outlier"))
    },
    Some("""WITH b AS (
        SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
               quantile_cont(l_extendedprice, 0.75) AS q3
        FROM lineitem)
      SELECT count(*) AS n_outliers,
             round(min(l_extendedprice),2) AS min_outlier,
             round(max(l_extendedprice),2) AS max_outlier
      FROM lineitem, b
      WHERE l_extendedprice < q1 - 1.5*(q3-q1)
         OR l_extendedprice > q3 + 1.5*(q3-q1)"""))

  /** Latent histogram capability (21_EDA.ipynb:32915 display SQL):
    * width_bucket + least/greatest are Spark built-ins.
    */
  val q16Histogram = Q(
    "q16_histogram",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select(width_bucket($"l_quantity", lit(0.0), lit(50.0), lit(12L)).as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
    },
    // DuckDB 1.0 has no width_bucket; the oracle spells out the same
    // SQL-standard semantics ((v-lo)/(hi-lo)*n, floor, +1, clamped).
    Some("""SELECT CASE WHEN l_quantity < 0.0 THEN 0
               WHEN l_quantity >= 50.0 THEN 13
               ELSE CAST(floor((l_quantity - 0.0) / (50.0 - 0.0) * 12) AS BIGINT) + 1 END AS bucket,
             count(*) AS n
      FROM lineitem GROUP BY 1"""))

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02FilterProject, q03JoinAgg, q04LeftJoin,
    q05WindowTop1, q06GlobalStats, q07CountDistinct, q08NullProfile,
    q09DupCheck, q10Cardinalities, q11DomainMinmax, q12TopK,
    q13Percentile, q14Describe, q15IqrOutliers, q16Histogram)
}
