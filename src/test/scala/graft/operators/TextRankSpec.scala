package graft.operators

import graft.SparkSpec

/** TextRank: the distributed integer-micro iteration must equal a
  * plain driver-side replay of the published update rule, a planted
  * hub must outrank peripheral terms, and the result must be
  * partitioning-independent (the point of carrying rank as bigint
  * micros — no FP summation order anywhere).
  */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // "hub" co-occurs with every other term; spokes only touch the hub
    1L -> "hub alpha hub beta hub gamma hub delta",
    2L -> "hub alpha hub beta hub gamma",
    3L -> "epsilon hub epsilon hub").toDF("doc_id", "text")

  /** Driver-side replay: same graph, same integer-micro update. */
  private def reference(
      texts: Seq[String], iters: Int): Map[String, Long] = {
    val bigrams = texts.flatMap(_.split("\\s+").filter(_.nonEmpty)
      .sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
    val edges = (bigrams ++ bigrams.map(_.swap))
      .filter(p => p._1 != p._2)
      .groupBy(identity).map { case ((s, d), g) => (s, d, g.size.toLong) }
      .toSeq
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = edges.map(_._1).distinct
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, d, w) =>
          d -> math.round((w.toDouble / outw(s)) * (pr(s) * 0.85))
        }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      pr = nodes.map(n => n -> (150000L + contrib.getOrElse(n, 0L))).toMap
    }
    pr
  }

  test("distributed iteration equals the driver-side replay exactly") {
    val got = TextRank.ranks(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = reference(
      docs.collect().map(_.getString(1)).toSeq, TextRank.Iters)
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("the hub outranks every spoke") {
    val got = TextRank.ranks(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hub = got("hub")
    (got - "hub").foreach { case (t, v) =>
      assert(hub > v, s"hub ($hub) must outrank $t ($v)")
    }
  }

  test("result is identical under a different input partitioning") {
    val a = TextRank.ranks(docs.repartition(1), "text", iters = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val b = TextRank.ranks(docs.repartition(13), "text", iters = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a == b, s"partitioning changed ranks:\n a=$a\n b=$b")
  }
}
