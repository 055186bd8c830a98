package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** d02 equivalence: the candidate-then-verify plan (LSH candidates →
  * exact Jaccard) must produce the same ≥-threshold pairs as the
  * all-pairs exact inverted-index computation it replaced. With 4
  * bands × 3 rows, single-band collision probability at s=0.5 is only
  * ~0.41 — recall is total here because the corpus's true near-dups
  * sit far above the threshold (synthetic dups are ≥0.9 similar),
  * which is the regime LSH parameters are tuned for in production.
  * This spec pins that: if testdata or LSH parameters drift so that a
  * true ≥0.5 pair escapes the candidate set, it fails loudly.
  */
class CandVerifySpec extends SparkSpec {
  import spark.implicits._

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq

  test("d02 candidate-verified Jaccard == all-pairs exact Jaccard on the test corpus") {
    val verified = collectPairs(d02NgramJaccardRun)

    // all-pairs exact reference: shingle inverted-index self-join (the
    // pre-round-5 d02 plan — quadratic on hot shingles, kept here only
    // as the exhaustive ground truth at test scale)
    val sh = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(DedupQueries.shingles($"text")).as("sh"))
      .select($"doc_id", graft.functions.exprs.token_hash60($"sh").as("h"))
      .distinct()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val allPairs = inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .select($"doc_a", $"doc_b",
        round($"inter" / ($"sz_a" + $"sz_b" - $"inter"), 4).as("jaccard"))
      .filter($"jaccard" >= 0.5)

    val exhaustive = collectPairs(allPairs)
    assert(verified.nonEmpty, "threshold pairs exist at sf0.001 — empty means vacuous")
    assert(verified == exhaustive,
      s"candidate-verify missed or invented pairs:\n verified=$verified\n exhaustive=$exhaustive")
  }

  private def d02NgramJaccardRun =
    DedupQueries.d02NgramJaccard.run(spark, sfDir)
}
