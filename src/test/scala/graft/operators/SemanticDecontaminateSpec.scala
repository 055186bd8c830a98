package graft.operators

import graft.SparkSpec
import graft.core.Tables

/** Semantics of `Decontaminate.semanticHits` (the d15 operator) on a
  * planted geometry, plus equivalence with a driver-side brute force
  * on the real embeddings table.
  */
class SemanticDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  // bench axes e_x / e_y; corpus rows exercise each branch:
  //   1 — near e_x only; 2 — EXACT cosine tie against both benches
  //       (argmax must resolve to the smaller bench id);
  //   3 — orthogonal to both (no row); 4 — zero vector (NULL cosine,
  //       no row, matching the oracle engine's x/0 = NULL)
  private val bench = df(Seq(
    100L -> Array(1f, 0f, 0f),
    120L -> Array(0f, 1f, 0f)))
  private val corpus = df(Seq(
    1L -> Array(1f, 0.1f, 0f),
    2L -> Array(0.6f, 0.6f, 0f),
    3L -> Array(0f, 0f, 1f),
    4L -> Array(0f, 0f, 0f)))

  test("hits, counts and the deterministic argmax on planted vectors") {
    val out = Decontaminate
      .semanticHits(corpus, bench, "vec_id", "embedding", tau = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L),
      s"orthogonal and zero vectors must not appear, got ${out.keySet}")
    assert(out(1L) == ((1L, 0.995, 100L)), s"doc 1: ${out(1L)}")
    // 0.6/0.8485... rounds to 0.7071 against BOTH benches: n_hits 2,
    // tie broken to the smaller bench id
    assert(out(2L) == ((2L, 0.7071, 100L)), s"doc 2: ${out(2L)}")
  }

  test("operator equals driver-side brute force on the real embeddings") {
    val all = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    val (b, c) = all.partition(_._1 % 20 == 0)
    def cos4(x: Array[Float], y: Array[Float]): Option[Double] = {
      def dot(p: Array[Float], q: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < math.min(p.length, q.length)) {
          s += p(i).toDouble * q(i).toDouble; i += 1
        }
        s
      }
      val den = math.sqrt(dot(x, x)) * math.sqrt(dot(y, y))
      if (den == 0.0) None
      else Some(java.math.BigDecimal.valueOf(dot(x, y) / den)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    val expected = c.flatMap { case (cid, cv) =>
      val hits = b.flatMap { case (bid, bv) =>
        cos4(cv, bv).filter(_ >= 0.30).map(bid -> _)
      }
      if (hits.isEmpty) None
      else {
        val best = hits.map(_._2).max
        Some(cid -> ((hits.length.toLong, best,
          hits.filter(_._2 == best).map(_._1).min)))
      }
    }.toMap
    val got = Decontaminate
      .semanticHits(
        Tables.embeddings(spark, sfDir).filter($"vec_id" % 20 =!= 0),
        Tables.embeddings(spark, sfDir).filter($"vec_id" % 20 === 0),
        "vec_id", "embedding", tau = 0.30)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got.size == expected.size && expected.nonEmpty,
      s"expected ${expected.size} flagged vectors, got ${got.size}")
    assert(got == expected)
  }
}
