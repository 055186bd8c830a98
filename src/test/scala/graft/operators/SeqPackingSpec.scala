package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SeqPackingSpec extends SparkSpec {
  import spark.implicits._

  private val C = 100L

  test("next-fit invariants: fills bounded, bins contiguous, oversized docs isolated") {
    val toks = Seq(
      // bucket 0: 60+30 fit, 40 opens bin 2, 200 (oversized) bin 3, 10 bin 4
      (0L, 0L, 60L), (1L, 0L, 30L), (2L, 0L, 40L), (3L, 0L, 200L), (4L, 0L, 10L),
      // bucket 1: exact-capacity fit then new bin
      (5L, 1L, 100L), (6L, 1L, 1L)).toDF("doc_id", "bucket", "tok")
    val packed = SeqPacking.packTokenCounts(toks, C)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(packed(0L)._1 == 1 && packed(1L)._1 == 1) // 60+30 share bin 1
    assert(packed(2L)._1 == 2) // 90+40 > 100 -> bin 2
    assert(packed(3L)._1 == 3) // oversized doc gets its own bin
    assert(packed(4L)._1 == 4) // 200+10 > 100 -> next bin (next-fit, no lookback)
    assert(packed(5L)._1 == 1 && packed(6L)._1 == 2) // exact fit, then overflow
  }

  test("bin fills never exceed capacity except single-doc oversized bins") {
    val packed = SeqPacking.packDocuments(
      Tables.documents(spark, sfDir), capacity = 64, nBuckets = 4)
    val bins = packed.groupBy($"bucket", $"bin_id")
      .agg(sum($"tok").as("fill"), count(lit(1)).as("n"))
      .collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val fill = r.getLong(2); val n = r.getLong(3)
      assert(fill <= 64 || n == 1,
        s"bin ${r.getLong(0)}/${r.getLong(1)} overfilled: $fill tokens, $n docs")
    }
    // bin ids are contiguous from 1 within every bucket
    packed.groupBy($"bucket")
      .agg(max($"bin_id").as("mx"), countDistinct($"bin_id").as("nd"))
      .collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("packOrdered walks ord order, not doc-id order") {
    // doc ids reversed vs ord: id 10 (ord 1, 60) then id 9 (ord 2, 30)
    // share bin 1; id 8 (ord 3, 40) overflows into bin 2. Doc-id order
    // would pack (8:40, 9:30) into bin 1 and 10 into bin 2 instead.
    val toks = Seq(
      (10L, 0L, 1L, 60L), (9L, 0L, 2L, 30L), (8L, 0L, 3L, 40L))
      .toDF("doc_id", "bucket", "ord", "tok")
    val packed = SeqPacking.packOrdered(toks, C)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(packed == Map(10L -> 1L, 9L -> 1L, 8L -> 2L))
  }

  test("packOrdered with ord = doc_id == packTokenCounts") {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select($"doc_id", pmod($"doc_id", lit(4)).cast("long").as("bucket"),
      $"doc_id".as("ord"),
      graft.functions.TextFunctions.tokenCount($"text").cast("long").as("tok"))
    val a = SeqPacking.packOrdered(toks, 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val b = SeqPacking.packTokenCounts(toks.drop("ord"), 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }

  test("packing is deterministic under input repartitioning") {
    val docs = Tables.documents(spark, sfDir)
    val a = SeqPacking.packDocuments(docs, 128, 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    val b = SeqPacking.packDocuments(docs.repartition(13), 128, 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(a == b)
  }
}
