package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** [[SegmentCompaction.compactedCopy]]'s contract: the compacted copy
  * is READ-INDISTINGUISHABLE from the source store — every face's
  * read path is a pure function of the union of committed segment
  * rows, so folding N segments into one must change nothing: not the
  * sketch estimates, not the serving graph, and not the edges a
  * LATER append derives from the state it beam-searches.
  */
class SegmentCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("segcompact").toString

  private def committedSegs(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName)
  }

  test("flat store (HLL): compacted copy is one committed segment with the identical estimate") {
    val events = Tables.events(spark, sfDir)
    val in = freshDir(); val out = freshDir()
    (0 to 2).foreach(i => IncrementalHll.appendBatch(
      events.filter($"event_id" % 3 === i), "event_type", "user_id", in, i.toLong))
    val folded = SegmentCompaction.compactedCopy(spark, in, out)
    assert(folded == 3)
    assert(committedSegs(out) == Seq("batch=0"))
    val est = (d: String) => IncrementalHll.estimate(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(est(out) == est(in))
  }

  test("flat store (quantiles): estimate survives compaction bit-for-bit; " +
    "a crashed uncommitted source segment is excluded like every read excludes it") {
    val li = Tables.lineitem(spark, sfDir)
    val key = concat($"l_orderkey".cast("string"), lit("-"), $"l_linenumber".cast("string"))
    val in = freshDir(); val out = freshDir()
    (0 to 1).foreach(i => IncrementalQuantiles.appendBatch(
      li.filter($"l_orderkey" % 2 === i), $"l_returnflag", $"l_extendedprice",
      key, in, i.toLong))
    // crash: a partial segment without _SUCCESS must not leak into the copy
    Seq(("XX", 0L, 0.0)).toDF("g", "h", "v")
      .write.parquet(s"$in/batch=9/data_without_marker")
    val ps = Seq(0.25, 0.5, 0.9)
    SegmentCompaction.compactedCopy(spark, in, out)
    val est = (d: String) => IncrementalQuantiles.estimate(spark, d, ps).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(est(out) == est(in))
    assert(!est(out).exists(_._1 == "XX"))
  }

  test("multi-part store (graph ANN): serving graph and vectors survive compaction, " +
    "and a post-compaction append derives the identical graph on either store") {
    val K = 6; val Beam = 12; val Hops = 3
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val half = n / 2
    val q3 = half + (n - half) / 2
    val in = freshDir(); val out = freshDir()
    IncrementalGraphAnn.createIndex(emb.filter($"vec_id" < half), in, K, rounds = 2)
    IncrementalGraphAnn.appendBatch(
      emb.filter($"vec_id" >= half && $"vec_id" < q3), in, 1L, K, Beam, Hops)
    SegmentCompaction.compactedCopy(spark, in, out)
    assert(committedSegs(out) == Seq("batch=0"))

    val graph = (d: String) => IncrementalGraphAnn.currentGraph(spark, d, K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val vecs = (d: String) => IncrementalGraphAnn.vectors(spark, d)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toVector)).toSet
    assert(graph(out) == graph(in))
    assert(vecs(out) == vecs(in))

    // the state either store presents to a NEW batch is identical, so
    // the (deterministic) insertion derives identical out-edges
    val tail = emb.filter($"vec_id" >= q3)
    IncrementalGraphAnn.appendBatch(tail, in, 3L, K, Beam, Hops)
    IncrementalGraphAnn.appendBatch(tail, out, 3L, K, Beam, Hops)
    assert(graph(out) == graph(in))
  }
}
