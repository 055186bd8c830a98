package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's ambient-load self-defense against the DRIVER's actual
  * BENCH_r*.json shape. The r8 defense parsed top-level `sf`/`queries`,
  * but the driver wraps Bench's line — top-level `sf` is the bare
  * number and the query map lives under `parsed.queries` — so
  * `prevQueries` was always empty and the rerun guard never fired
  * (s01's 3.28x ambient reading entered the official r8 record
  * uncorrected). These tests feed a driver-format fixture file and
  * assert the parser sees it AND that a planted outlier triggers the
  * rerun decision.
  */
class BenchDefenseSpec extends AnyFunSuite {

  private def writeRound(dir: java.io.File, n: Int, body: String): Unit = {
    val f = new java.io.File(dir, f"BENCH_r$n%02d.json")
    java.nio.file.Files.write(f.toPath, body.getBytes("UTF-8"))
  }

  private def tempDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("bench-defense").toFile
    d.deleteOnExit()
    d
  }

  // Build the driver-shaped record programmatically so the embedded
  // `tail` escaping is exact, not hand-maintained.
  private def driverJson(sf: Double, sfPath: String, queries: Map[String, Double]): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("n", 8); root.put("rc", 0); root.put("cpus", 32); root.put("sf", sf)
    val parsed = root.putObject("parsed")
    parsed.put("metric", "total"); parsed.put("value", queries.values.sum)
    parsed.put("unit", "sec")
    val q = parsed.putObject("queries")
    queries.foreach { case (k, v) => q.put(k, v) }
    parsed.put("sf", sfPath)
    val rawLine = {
      val inner = m.createObjectNode()
      inner.put("metric", "total"); inner.put("value", queries.values.sum)
      inner.put("unit", "sec")
      val iq = inner.putObject("queries")
      queries.foreach { case (k, v) => iq.put(k, v) }
      inner.put("sf", sfPath)
      m.writeValueAsString(inner)
    }
    root.put("tail", ": Initialized BlockManager\n" + rawLine + "\n[success] Total time: 63 s")
    m.writeValueAsString(root)
  }

  test("driver-format record yields non-empty prevQueries (parsed.queries, numeric sf)") {
    val d = tempDir()
    writeRound(d, 8, driverJson(0.1, "/root/testdata/sf0.1",
      Map("s01_ann_bruteforce" -> 1.167, "q33_window_suite" -> 0.276, "d06_dedup_clusters" -> 2.13)))
    val prev = Bench.bestPrevQueries(Seq(d), "sf0.1")
    assert(prev.nonEmpty, "r8 regression: driver-wrapped records must be readable")
    assert(prev("s01_ann_bruteforce") == 1.167)
    assert(prev("d06_dedup_clusters") == 2.13)
  }

  test("the real BENCH_r08.json on disk parses (format coupling pin)") {
    val repo = new java.io.File("/root/repo")
    val r8 = new java.io.File(repo, "BENCH_r08.json")
    assume(r8.isFile, "official record not present in this checkout")
    val prev = Bench.bestPrevQueries(Seq(repo), "sf0.1")
    assert(prev.nonEmpty, "the official driver records must be readable")
    assert(prev.contains("s01_ann_bruteforce"))
  }

  test("minimum across rounds wins (last round alone can be the outlier)") {
    val d = tempDir()
    writeRound(d, 7, driverJson(0.1, "/root/testdata/sf0.1", Map("s01_ann_bruteforce" -> 0.356)))
    writeRound(d, 8, driverJson(0.1, "/root/testdata/sf0.1", Map("s01_ann_bruteforce" -> 1.167)))
    val prev = Bench.bestPrevQueries(Seq(d), "sf0.1")
    assert(prev("s01_ann_bruteforce") == 0.356)
  }

  test("cross-SF records are excluded") {
    val d = tempDir()
    writeRound(d, 8, driverJson(0.01, "/root/testdata/sf0.01", Map("s01_ann_bruteforce" -> 0.2)))
    assert(Bench.bestPrevQueries(Seq(d), "sf0.1").isEmpty)
  }

  test("raw Bench line (no driver wrapper) still parses — old-format fallback") {
    val d = tempDir()
    writeRound(d, 6,
      """{"metric":"total","value":1.0,"unit":"sec","queries":{"q01_pricing_summary":0.5},"sf":"/root/testdata/sf0.1"}""")
    val prev = Bench.bestPrevQueries(Seq(d), "sf0.1")
    assert(prev("q01_pricing_summary") == 0.5)
  }

  test("stdout line fits the driver's 2000-char tail window for the FULL registry") {
    // The r9 record came back parsed:null because the line (with three
    // per-query detail maps inlined) outgrew the tail capture; by r16
    // the per-query map ALONE spent 1808 of the 1900-char budget at 72
    // headliners. r17 moved it entirely to BENCH_DETAIL.json
    // (`queries_3dp`) + BENCH_HISTORY.jsonl: the line is now O(1) in
    // registry size — pin it WELL under budget for the whole registry,
    // worst-case formatting, so headliner growth can never regress it.
    val names = graft.queries.Registry.all.map(_.name)
    val results = names.map(n => n -> 9999.999)
    val line = Bench.benchLine(results, "/root/testdata/sf0.1", 12.34)
    assert(line.length < 300,
      s"bench line ${line.length} chars — the slim-line contract regressed")
    assert(line.startsWith("{\"metric\":\"total\""))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.path("n").asInt() == names.size)
    assert(node.path("n_failed").asInt() == 0)
    assert(node.path("sf").asText() == "sf0.1")
    // load1 rides the line (r19): a noisy-host total must be
    // self-describing in BENCH_r*.json, not only in BENCH_DETAIL
    assert(node.path("load1").asDouble() == 12.34)
    assert(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Bench.benchLine(results, "/tmp/sf0.1"))
      .path("load1").asDouble() == -1.0)
    // a failed query is visible on the line
    val line2 = Bench.benchLine(Seq("ok" -> 1.0, "dead" -> -1.0), "/tmp/sf0.1")
    val node2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line2)
    assert(node2.path("n_failed").asInt() == 1)
    assert(node2.path("value").asDouble() == 1.0)
  }

  test("BENCH_HISTORY.jsonl lines feed the drift trigger (r17 slim-line successor)") {
    // The slim stdout line carries no per-query map, so driver records
    // from r17 on are blind to the drift trigger; Bench's own appended
    // history file is the replacement source — and the min must span
    // BOTH sources (old round records + history lines).
    val d = tempDir()
    writeRound(d, 8, driverJson(0.1, "/root/testdata/sf0.1",
      Map("s01_ann_bruteforce" -> 1.167)))
    java.nio.file.Files.write(new java.io.File(d, "BENCH_HISTORY.jsonl").toPath,
      ("""{"metric":"total","value":9.0,"unit":"sec","queries":{"s01_ann_bruteforce":0.4,"new_q":2.5},"sf":"sf0.1"}""" + "\n" +
        """{"metric":"total","value":9.0,"unit":"sec","queries":{"new_q":1.75},"sf":"sf0.1"}""" + "\n" +
        """{"metric":"total","value":9.0,"unit":"sec","queries":{"new_q":0.01},"sf":"sf0.01"}""" + "\n").getBytes("UTF-8"))
    val prev = Bench.bestPrevQueries(Seq(d), "sf0.1")
    assert(prev("s01_ann_bruteforce") == 0.4) // min across record + history
    assert(prev("new_q") == 1.75) // history-only query, cross-SF line excluded
  }

  test("planted 4x outlier above the 0.5s floor triggers the rerun") {
    val prev = Map("s01_ann_bruteforce" -> 0.356)
    assert(Bench.needsRerun("s01_ann_bruteforce", 4 * 0.356, prev))
  }

  test("sub-0.5s readings and mild drift do not trigger") {
    val prev = Map("q33_window_suite" -> 0.103, "d06_dedup_clusters" -> 2.13)
    // 2.68x but absolute 0.276s < 0.5s floor: scheduler jitter, exempt
    assert(!Bench.needsRerun("q33_window_suite", 0.276, prev))
    // above the floor but only 1.5x: not an outlier
    assert(!Bench.needsRerun("d06_dedup_clusters", 3.2, prev))
    // unknown query: nothing to compare against
    assert(!Bench.needsRerun("brand_new_query", 9.9, prev))
  }

  test("oracle-anchor gate trigger: a first-round query past 1s and 2x DuckDB reruns") {
    // r9's d11_fuzzy_dedup: new that round (no prior records), official
    // median 8.601s vs oracle 3.964s under load1 6-8 — past the judged
    // gate, yet the drift trigger had nothing to compare against.
    val oracle = Map("d11_fuzzy_dedup" -> 3.964)
    assert(Bench.needsRerun("d11_fuzzy_dedup", 8.601, Map.empty, oracle))
    // quiet-load reading (0.39x) must NOT trigger
    assert(!Bench.needsRerun("d11_fuzzy_dedup", 1.542, Map.empty, oracle))
  }

  test("oracle-anchor trigger exemptions: sub-1s floor and missing anchor") {
    // scheduler-floor queries sit far above 2x DuckDB but under 1s
    // absolute (r9's q03 at 27x / 0.4s): exempt
    assert(!Bench.needsRerun("q03_join_agg", 0.406, Map.empty, Map("q03_join_agg" -> 0.015)))
    // >1s and >2x but no anchor on record: nothing to judge against
    assert(!Bench.needsRerun("no_anchor_query", 9.9, Map.empty, Map.empty))
    // either trigger suffices: drift fires even when the oracle side is quiet
    assert(Bench.needsRerun("s01_ann_bruteforce", 1.5,
      Map("s01_ann_bruteforce" -> 0.356), Map("s01_ann_bruteforce" -> 1.0)))
  }

  test("quiet-anchor trigger: BENCH_r10's uncaught ambient readings now rerun") {
    // The exact r10 cases the r10 verdict flagged: best-prev was itself
    // inflated (drift silent) and the oracle gate needs >=1s (q33/q20
    // silent). The quiet anchor catches all of them.
    val quiet = Map("d11_fuzzy_dedup" -> 0.889, "d06_dedup_clusters" -> 1.28,
      "q33_window_suite" -> 0.055, "q20_asof_join" -> 0.056)
    assert(Bench.needsRerun("d11_fuzzy_dedup", 4.37, Map("d11_fuzzy_dedup" -> 4.37),
      Map.empty, quiet))
    assert(Bench.needsRerun("d06_dedup_clusters", 3.92, Map.empty, Map.empty, quiet))
    assert(Bench.needsRerun("q33_window_suite", 0.373, Map.empty, Map.empty, quiet))
    assert(Bench.needsRerun("q20_asof_join", 0.389, Map.empty, Map.empty, quiet))
    // within 2x of the quiet anchor: no rerun
    assert(!Bench.needsRerun("d11_fuzzy_dedup", 1.5, Map.empty, Map.empty, quiet))
    // sub-0.2s absolute: scheduler jitter even when far past 2x
    assert(!Bench.needsRerun("q33_window_suite", 0.15, Map.empty, Map.empty, quiet))
    // no anchor recorded: trigger silent
    assert(!Bench.needsRerun("unanchored", 9.9, Map.empty, Map.empty, quiet))
  }

  test("quiet-regression flag: r12's t25 slip would now be reported") {
    // The rerun machinery corrects ambient outliers but lets a REAL
    // sub-second plan regression enter the record silently: r12's t25
    // went 0.258 -> 0.602s (2.3x) — under the perf-weak bar (>=1s),
    // under best-prev drift (3x), caught only at judging. The
    // post-rerun quietRegressions pass flags it.
    val quiet = Map("t25_vocab_growth" -> 0.258, "q54_sample_quantiles" -> 0.657)
    val results = Seq(
      ("t25_vocab_growth", 0.602), // the r12 slip: flagged
      ("q54_sample_quantiles", 0.69), // within 2x of anchor: silent
      ("unanchored_query", 9.9)) // no anchor: nothing to judge against
    assert(Bench.quietRegressions(results, quiet) ==
      Seq(("t25_vocab_growth", 0.602, 0.258)))
    // sub-0.2s readings are scheduler jitter, never regressions
    assert(Bench.quietRegressions(
      Seq(("q33_window_suite", 0.15)), Map("q33_window_suite" -> 0.055)).isEmpty)
  }
}
