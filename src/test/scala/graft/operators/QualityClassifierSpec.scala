package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // vocabulary-separated corpus: clean prose (stopword-balanced
  // sentences) labeled 1, navigation/boilerplate junk labeled 0
  private val clean = Seq(
    "the quick fox ran over the quiet hill and it was gone",
    "a long winter is coming to the valley and the river froze",
    "it is a truth that the garden grows in the warm light",
    "the ship sailed of its own accord and the crew slept")
  private val junk = Seq(
    "click here subscribe now buy buy discount offer click banner",
    "cookie policy accept decline cookie settings privacy banner",
    "sign up login register newsletter subscribe click here now",
    "terms conditions copyright all rights reserved sitemap links")

  private def corpus(extra: Seq[(Long, String, Int)] = Nil) = {
    val rows =
      clean.zipWithIndex.map { case (t, i) => (i.toLong, t, 1) } ++
        junk.zipWithIndex.map { case (t, i) => (100L + i, t, 0) } ++
        extra
    rows.toDF("doc_id", "text", "weak_label")
  }

  test("planted boilerplate scores below clean prose") {
    val out = QualityClassifier
      .trainAndScore(corpus(), "doc_id", "text", "weak_label")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val cleanProbs = clean.indices.map(i => out(i.toLong))
    val junkProbs = junk.indices.map(i => out(100L + i))
    assert(cleanProbs.min > junkProbs.max,
      s"classifier failed to separate: clean $cleanProbs vs junk $junkProbs")
    assert(cleanProbs.min > 0.5 && junkProbs.max < 0.5,
      s"probabilities not calibrated around the decision point: $out")
  }

  test("a token-less doc scores exactly at the class prior") {
    val out = QualityClassifier
      .trainAndScore(corpus(Seq((200L, "", 0))), "doc_id", "text", "weak_label")
      .filter($"doc_id" === 200L).head()
    // bias = ln((4+1)/(5+1)); no tokens -> logit == bias
    val expected = 1.0 / (1.0 + math.exp(-math.log(5.0 / 6.0)))
    assert(math.abs(out.getDouble(3) - expected) < 1e-3,
      s"empty doc must score sigmoid(bias): ${out.getDouble(3)} vs $expected")
  }

  test("t17 end to end: the learned scores track the weak labels") {
    val out = graft.queries.Registry.byName("t17_quality_classifier")
      .run(spark, sfDir)
      .groupBy($"weak_label").agg(avg($"prob_pos").as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(0L),
      s"mean prob_pos must be higher for the positive class: $out")
  }
}
