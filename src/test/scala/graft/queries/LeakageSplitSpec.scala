package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** t22 leakage-safe split: the structural guarantee (no near-dup pair
  * ever straddles a split boundary) plus the q26 compatibility
  * properties the assignment inherits.
  */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assignment =
    TextQueries.t22LeakageSplit.run(spark, sfDir).cache()

  test("zero near-dup pairs cross a split boundary (the structural guarantee)") {
    val pairs = graft.operators.TextDedup
      .minhashCandidates(Tables.documents(spark, sfDir), "doc_id", "text")
      .filter($"est_sim" >= 0.5)
      .select($"doc_a", $"doc_b")
    val a = assignment.select($"doc_id".as("doc_a"), $"split".as("split_a"))
    val b = assignment.select($"doc_id".as("doc_b"), $"split".as("split_b"))
    val crossing = pairs.join(a, "doc_a").join(b, "doc_b")
      .filter($"split_a" =!= $"split_b").count()
    assert(crossing == 0)
    assert(pairs.count() > 0) // the guarantee is vacuous on an empty pair set
  }

  test("every document appears exactly once, with a valid split label") {
    val docs = Tables.documents(spark, sfDir)
    assert(assignment.count() == docs.count())
    assert(assignment.select($"doc_id").distinct().count() == docs.count())
    assert(assignment.filter(!$"split".isin("train", "val", "test")).count() == 0)
  }

  test("cluster members share one split; singletons match q26's own-id bucket") {
    // all members of a cluster carry the same label
    val perCluster = assignment.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("n")).filter($"n" > 1).count()
    assert(perCluster == 0)
    // a singleton's cluster_id is its own doc_id, so its bucket is
    // exactly the q26 hash of its id
    val singletons = assignment.groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
      .filter($"sz" === 1).select($"cluster_id".as("doc_id"))
    val expected = pmod(
      graft.functions.exprs.token_hash60($"doc_id".cast("string")), lit(100L))
    val mismatched = assignment.join(singletons, "doc_id")
      .withColumn("want",
        when(expected < 80, "train").when(expected < 90, "val").otherwise("test"))
      .filter($"split" =!= $"want").count()
    assert(mismatched == 0)
    // and the split fractions over singletons are roughly 80/10/10
    val n = assignment.join(singletons, "doc_id").count().toDouble
    val trainFrac = assignment.join(singletons, "doc_id")
      .filter($"split" === "train").count() / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
  }

  test("a planted near-dup family lands on one side regardless of id hashes") {
    // ids chosen so their OWN q26 buckets differ (doc-level split
    // would separate them); near-identical text forces one cluster
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val dir = java.nio.file.Files.createTempDirectory("t22").toString
    Seq(
      1L -> base, 2L -> (base + "tail"), 3L -> base,
      100L -> "completely different words nothing shared here at all one",
      200L -> "another disjoint document with its own private vocabulary two")
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextQueries.t22LeakageSplit.run(spark, dir)
    val fam = out.filter($"doc_id".isin(1L, 2L, 3L))
      .select($"split").distinct().collect()
    assert(fam.length == 1, s"family split across ${fam.mkString(",")}")
  }
}
