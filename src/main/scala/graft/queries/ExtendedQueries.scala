package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Coverage beyond the reference's own surface: as-of join, grouping
  * sets, pivot, and set operations — the remaining standard analytic
  * operators a user would expect from a complete engine.
  */
object ExtendedQueries {

  /** As-of join — an operator Spark lacks natively, composed from
    * existing ops (prompt preference (a)): for every `error` event,
    * the most recent `click` of the same user at or before it.
    * Implementation: union both event kinds, one window per user
    * ordered by time (clicks sort before errors on ties — inclusive
    * `>=` as-of semantics), carry the last non-null click timestamp
    * forward. ONE shuffle on user_id, no range-join explosion —
    * unlike an inequality join, cost is O(events log events) and
    * partitions by user at any scale. The DuckDB oracle uses its
    * native ASOF LEFT JOIN.
    */
  val q20AsofJoin = Q(
    "q20_asof_join",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .filter($"event_type".isin("error", "click"))
        .select($"event_id", $"user_id", $"ts", $"event_type",
          when($"event_type" === "click", $"ts").as("click_marker"),
          ($"event_type" === "click").cast("int").as("is_click"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc, $"is_click".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_click_ts", last($"click_marker", ignoreNulls = true).over(w))
        .filter($"event_type" === "error")
        .select(
          $"event_id", $"user_id",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("error_ts"),
          date_format($"last_click_ts", "yyyy-MM-dd HH:mm:ss").as("last_click_ts"))
    },
    Some("""SELECT e.event_id, e.user_id,
        strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
        strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
      FROM events e
      ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        ON e.user_id = c.user_id AND e.ts >= c.ts
      WHERE e.event_type = 'error'"""),
    headline = true)

  /** ROLLUP grouping sets: subtotals + grand total in one pass
    * (partial aggregation expands grouping ids map-side).
    */
  val q21Rollup = Q(
    "q21_rollup",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"""))

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: long→wide per-user event-type value sums. Explicit value
    * list keeps the schema static (no extra distinct pass, stable
    * columns at any scale). The oracle spells the same thing as CASE
    * aggregates.
    */
  val q22Pivot = Q(
    "q22_pivot",
    (s, dir) => {
      import s.implicits._
      val pivoted = Tables.events(s, dir)
        .groupBy($"user_id")
        .pivot("event_type", EventTypes)
        .agg(round(sum($"value"), 2))
      // coalesce AFTER the pivot: PivotFirst fills absent (user, type)
      // cells with NULL regardless of any coalesce inside the
      // aggregate; the oracle's CASE form yields 0.0 for those cells
      pivoted.select(
        ($"user_id" +: EventTypes.map(t => coalesce(col(t), lit(0.0)).as(t))): _*)
    },
    Some {
      val cases = EventTypes.map(t =>
        s"round(coalesce(sum(CASE WHEN event_type = '$t' THEN value END), 0.0), 2) AS \"$t\"")
        .mkString(",\n        ")
      s"""SELECT user_id,
        $cases
      FROM events GROUP BY user_id"""
    })

  /** Set operations (absent from the reference, §2.10): UNION /
    * INTERSECT / EXCEPT distinct semantics.
    */
  val q23SetOps = Q(
    "q23_set_ops",
    (s, dir) => {
      import s.implicits._
      val richCustomers = Tables.customer(s, dir)
        .filter($"c_acctbal" > 5000).select($"c_custkey".as("k"))
      val bigSpenders = Tables.orders(s, dir)
        .filter($"o_totalprice" > 300000).select($"o_custkey".as("k"))
      val building = Tables.customer(s, dir)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
      richCustomers.union(bigSpenders).distinct()
        .intersect(Tables.customer(s, dir).select($"c_custkey".as("k")))
        .except(building)
    },
    Some("""WITH rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
        big AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000),
        bld AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        allc AS (SELECT c_custkey AS k FROM customer)
      SELECT k FROM (
        (SELECT k FROM rich UNION SELECT k FROM big)
        INTERSECT SELECT k FROM allc)
      EXCEPT SELECT k FROM bld"""))

  /** Sketch aggregates: HLL++ approximate distinct (per group and via
    * mergeable DataSketches HLL). The raw estimates are not
    * DuckDB-oracle-able (different sketch implementations by
    * construction), so the query emits the exact distinct counts plus
    * BOOLEAN accuracy gates (|approx−exact|/exact ≤ 15%, ≈3σ of the
    * default 5% relativeSD — a 1σ gate would flip on ordinary
    * estimator deviation at a different SF or layout; the gate tests
    * "sketch wired correctly", not estimator luck) — the oracle
    * recomputes the exact counts and asserts the gates are true, so
    * the sketch path is exercised and checked, not just row-counted.
    * At 100 TB the mergeable sketch is the only way to count distincts
    * without an expand + two-phase exact aggregation.
    *
    * Threshold robustness: the 15% gate holds oracle-green at both
    * verified SFs (3 rows each at sf0.01 and sf0.1 — r6 `VerifyOne` +
    * `check.py --skip-verify` runs), i.e. both sketches land within
    * the band on 6k- and 600k-row groups alike.
    */
  val q24Sketches = Q(
    "q24_sketches",
    (s, dir) => {
      import s.implicits._
      // r21 (guide §2.3 "aggregate before you shuffle" + §1 measured):
      // one agg mixing TWO countDistincts (Expand ×3) with the
      // imperative sketch aggregates planned the WHOLE expanded
      // 3×row stream through ObjectHashAggregate (sort-based fallback
      // past 128 keys) + a Sort + SortAggregate pass — 6.3 s honest at
      // sf0.1, hidden for 20 rounds because count() pruned every
      // aggregate expression (0.15 s). Split: sketches partial-agg
      // map-side over 3 groups (no Expand, never falls back), exact
      // distincts stay a pure codegen HashAggregate chain, and the two
      // 3-row frames broadcast-join on the group key.
      val li = Tables.lineitem(s, dir)
      val exact = li.groupBy($"l_returnflag").agg(
        countDistinct($"l_partkey").as("exact_parts"),
        countDistinct($"l_orderkey").as("exact_orders"))
      val approx = li.groupBy($"l_returnflag").agg(
        approx_count_distinct($"l_partkey").as("approx_parts"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").as("hll_orders"))
      exact.join(broadcast(approx), Seq("l_returnflag"))
        .select(
          $"l_returnflag",
          $"exact_parts",
          $"exact_orders",
          (abs($"approx_parts" - $"exact_parts") <=
            lit(0.15) * $"exact_parts").as("approx_parts_ok"),
          (abs($"hll_orders" - $"exact_orders") <=
            lit(0.15) * $"exact_orders").as("hll_orders_ok"))
    },
    Some("""SELECT l_returnflag,
        count(DISTINCT l_partkey) AS exact_parts,
        count(DISTINCT l_orderkey) AS exact_orders,
        true AS approx_parts_ok,
        true AS hll_orders_ok
      FROM lineitem GROUP BY l_returnflag"""))

  /** Range self-join via time-bucket banding: pairs of events by the
    * same user within 5 minutes of each other. A naive |t1−t2| ≤ Δ
    * join is a per-user cross product; bucketing ts into Δ-wide bands
    * and joining on (user, bucket) ∪ (user, bucket+1) touches only
    * adjacent bands — the standard equi-join reduction that keeps
    * range joins shuffle-hash-joinable at any scale. The oracle uses
    * DuckDB's native inequality join; identical pairs either way.
    */
  val q25RangeJoin = Q(
    "q25_range_join",
    (s, dir) => {
      import s.implicits._
      val deltaSec = 300L
      val ev = Tables.events(s, dir)
        .select($"event_id", $"user_id", $"ts",
          (unix_timestamp($"ts") / deltaSec).cast("long").as("bucket"))
      // candidate buckets: adjacent bands either side (covers all
      // |dt| <= delta without assuming ids are time-ordered)
      val left = ev.select($"event_id".as("id_a"), $"user_id", $"ts".as("ts_a"),
        explode(array($"bucket" - 1, $"bucket", $"bucket" + 1)).as("jb"))
      val right = ev.select($"event_id".as("id_b"), $"user_id", $"ts".as("ts_b"),
        $"bucket".as("jb"))
      left.join(right, Seq("user_id", "jb"))
        .filter($"id_a" < $"id_b" &&
          abs(unix_timestamp($"ts_a") - unix_timestamp($"ts_b")) <= deltaSec)
        // no distinct needed: the right side has one bucket and the
        // left side's three exploded bands are distinct, so each
        // qualifying ordered pair joins exactly once
        .select($"user_id", $"id_a", $"id_b",
          (unix_timestamp($"ts_b") - unix_timestamp($"ts_a")).as("dt_sec"))
    },
    Some("""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        date_diff('second', a.ts, b.ts) AS dt_sec
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.event_id < b.event_id
        AND abs(date_diff('second', a.ts, b.ts)) <= 300"""))

  /** Deterministic train/val/test split assignment by content hash —
    * the reproducible way to partition a training corpus (stable under
    * re-runs, insertions, and resharding, unlike rand()). Buckets from
    * the engine-portable md5-prefix hash of the document id.
    */
  val q26TrainSplit = Q(
    "q26_train_split",
    (s, dir) => {
      import s.implicits._
      val bucket = pmod(graft.functions.exprs.token_hash60($"doc_id".cast("string")), lit(100L))
      Tables.documents(s, dir)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy($"split", $"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
    },
    Some("""SELECT CASE
          WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
          WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
          ELSE 'test' END AS split,
        lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1, 2"""))

  val all: Seq[Q] = Seq(
    q20AsofJoin, q21Rollup, q22Pivot, q23SetOps, q24Sketches, q25RangeJoin, q26TrainSplit)
}
