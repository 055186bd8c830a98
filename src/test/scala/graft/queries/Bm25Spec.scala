package graft.queries

import graft.SparkSpec

/** s12 BM25 retrieval: ranking semantics on a planted corpus plus the
  * plan properties the 100 TB story rests on (query terms broadcast,
  * top-k pre-truncated).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact copy outranks partial overlap; disjoint docs never appear") {
    // doc 0 is the query (0 % 97 == 0). Same length everywhere so
    // length normalization can't reorder the planted structure.
    val dir = writeDocs(Seq(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "alpha beta gamma delta epsilon zeta", // exact copy
      2L -> "alpha beta gamma nu xi omicron",      // half overlap
      3L -> "rho sigma tau upsilon phi chi"))      // disjoint
    val out = SimilarityQueries.s12Bm25.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out.map(_._1).distinct == Seq(0L), s"only query 0 exists: $out")
    assert(out.map(_._3) == Seq(1L, 2L),
      s"expected copy then half-overlap, got $out")
    assert(out.head._4 > out(1)._4,
      s"copy must outscore partial overlap: $out")
    assert(!out.exists(_._3 == 3L), s"disjoint doc leaked into top-k: $out")
  }

  test("query terms join broadcasts; top-10 folds into the bottom-k aggregate") {
    val p = SimilarityQueries.s12Bm25.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"query-term join must broadcast, plan:\n$p")
    // per-query top-10 is the native bottom-k heap aggregate (partial
    // aggregation truncates map-side); a window/sort stage here would
    // re-exchange every scored pair (the r12 perf barrier)
    assert(p.contains("bottom_k_id_pairs"),
      s"top-10 must run as the native bottom-k aggregate, plan:\n$p")
    assert(!p.contains("Window"),
      s"s12 reintroduced a window barrier, plan:\n$p")
  }
}
