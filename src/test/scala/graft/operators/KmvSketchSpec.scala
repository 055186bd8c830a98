package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("merge algebra: min-k of a union == re-min-k of the unioned sketches") {
    // two disjoint halves of one keyspace; the sketch of the union
    // must equal merging the half-sketches and re-taking the k
    // smallest — the property that makes KMV a partial aggregate
    val a = (1L to 500L).map(v => ("g", v)).toDF("g", "v")
    val b = (501L to 1000L).map(v => ("g", v)).toDF("g", "v")
    val k = 16
    def hashes(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      KmvSketch.minKHashes(df, "g", "v", k).select($"h")
        .collect().map(_.getLong(0)).toSeq.sorted
    val whole = hashes(a.union(b))
    val merged = (hashes(a) ++ hashes(b)).distinct.sorted.take(k)
    assert(whole == merged, s"union sketch $whole != merged sketches $merged")
  }

  test("NULL values neither squat min-k slots nor move the estimate") {
    // NULL hashes sort NULLS FIRST under ascending order — before the
    // isNotNull guard they occupied the smallest sketch slots while
    // countDistinct excluded them, so est_distinct diverged from the
    // sketch contract on any group containing NULLs
    val vals = (1L to 2000L).map(v => ("g", java.lang.Long.valueOf(v))) ++
      Seq.fill(10)(("g", null.asInstanceOf[java.lang.Long]))
    val withNulls = vals.toDF("g", "v")
    val clean = (1L to 2000L).map(v => ("g", v)).toDF("g", "v")
    val k = 32
    val a = KmvSketch.minKHashes(withNulls, "g", "v", k)
      .select($"h").collect().map(_.getLong(0)).toSeq.sorted
    val b = KmvSketch.minKHashes(clean, "g", "v", k)
      .select($"h").collect().map(_.getLong(0)).toSeq.sorted
    assert(a == b, "NULL rows must not enter the sketch")
    val est = KmvSketch.distinctEstimate(withNulls, "g", "v", k)
      .head()
    val estClean = KmvSketch.distinctEstimate(clean, "g", "v", k).head()
    assert(est.getLong(1) == estClean.getLong(1) &&
      est.getDouble(2) == estClean.getDouble(2),
      s"estimate must ignore NULLs: $est vs $estClean")
  }

  test("estimate lands near the truth; small groups fall back to exact") {
    val big = (1L to 2000L).map(v => ("big", v))
    val tiny = (1L to 5L).map(v => ("tiny", v))
    val out = KmvSketch.distinctEstimate((big ++ tiny).toDF("g", "v"), "g", "v", k = 32)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (bigExact, bigEst, bigErr) = out("big")
    assert(bigExact == 2000L)
    // KMV sigma ~ 1/sqrt(k-2) ~ 18% at k=32; 3 sigma on a fixed hash
    info(f"KMV estimate for 2000 distinct: $bigEst%.1f (rel_err $bigErr%.4f)")
    assert(bigErr < 0.55, s"estimate $bigEst too far from 2000 (rel_err $bigErr)")
    // 5 distinct < k: the sketch IS the value set -> exact answer
    assert(out("tiny") == ((5L, 5.0, 0.0)), s"""tiny group: ${out("tiny")}""")
  }

  test("set-ops: unsaturated sketches give EXACT union/intersection/Jaccard") {
    // |A| = 40, |B| = 40, |A∩B| = 20, |A∪B| = 60 — all under k = 64,
    // so the sketches ARE the value sets and every estimate is exact
    val rows = ((1L to 40L).map(v => (0L, v)) ++ (21L to 60L).map(v => (1L, v)))
      .toDF("side", "v")
    val r = KmvSketch.setOpsEstimate(rows, "side", "v", k = 64).head()
    assert(r.getLong(0) == 60L, s"exact_union: $r")
    assert(r.getDouble(1) == 60.0, s"est_union must be exact unsaturated: $r")
    assert(r.getLong(2) == 20L, s"exact_inter: $r")
    assert(r.getDouble(3) == 20.0, s"est_inter must be exact unsaturated: $r")
    assert(r.getDouble(4) == math.round(20.0 / 60.0 * 10000) / 10000.0, s"est_jaccard: $r")
  }

  test("set-ops: saturated estimates land near the truth") {
    // |A∪B| = 6000, |A∩B| = 2000 against k = 256: rel err ~ 1/sqrt(k)
    val rows = ((1L to 4000L).map(v => (0L, v)) ++ (2001L to 6000L).map(v => (1L, v)))
      .toDF("side", "v")
    val r = KmvSketch.setOpsEstimate(rows, "side", "v", k = 256).head()
    assert(r.getLong(0) == 6000L && r.getLong(2) == 2000L, s"exact sides: $r")
    val (estU, estI) = (r.getDouble(1), r.getDouble(3))
    assert(math.abs(estU - 6000) / 6000.0 < 0.25, s"est_union off: $estU")
    assert(math.abs(estI - 2000) / 2000.0 < 0.35, s"est_inter off: $estI")
  }

  test("MinKAgg ignores the negative skip sentinel") {
    val agg = new graft.functions.MinKAgg(4)
    val s = Seq(5L, -1L, 3L, -1L, 9L).foldLeft(agg.zero)(agg.reduce)
    assert(s.toSeq == Seq(3L, 5L, 9L), s"sentinel leaked into the sketch: ${s.toSeq}")
  }

  test("q42 on the real table: estimates within 3 sigma per group") {
    val rows = KmvSketch
      .distinctEstimate(Tables.lineitem(spark, sfDir), "l_returnflag", "l_orderkey", 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(rows.length == 3)
    val bound = 3.0 / math.sqrt(32 - 2)
    rows.foreach { case (g, exact, err) =>
      assert(exact > 32, s"group $g too small for the sketch path")
      assert(err <= bound, f"group $g rel_err $err%.4f beyond 3-sigma $bound%.3f")
    }
  }
}
