package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.SparkSpec

/** Property pin for the generic [[AsofJoin]]: on arbitrary inputs —
  * tiny key/timestamp domains chosen to FORCE equal-ts collisions on
  * both sides, duplicate left rows, keys with empty right sides, and
  * composite keys — the operator equals the brute-force definition:
  * per left row, the right row with max (ts, tie) among same-key
  * rows at-or-before it.
  */
class AsofJoinPropertySpec extends SparkSpec {

  private def check(prop: Prop, minTests: Int): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  // tiny domains on purpose: collisions are the interesting inputs
  private val rowGen = for {
    k <- Gen.chooseNum(0, 2)
    ts <- Gen.chooseNum(0L, 12L)
    v <- Gen.chooseNum(-5L, 5L)
  } yield (k, ts, v)

  private val caseGen = for {
    lefts <- Gen.listOfN(12, rowGen)
    rights <- Gen.listOfN(12, rowGen)
  } yield (lefts, rights.zipWithIndex.map { case ((k, ts, v), i) =>
    (k, ts, i.toLong, v) }) // tie = unique index

  private def brute(
      lefts: Seq[(Int, Long, Long)],
      rights: Seq[(Int, Long, Long, Long)]): Seq[(Int, Long, Long, Option[(Long, Long, Long)])] =
    lefts.map { case (k, ts, v) =>
      val best = rights.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption
      (k, ts, v, best.map(r => (r._3, r._4, r._2)))
    }

  test("asofJoin == brute force on adversarially colliding inputs") {
    import spark.implicits._
    check(Prop.forAll(caseGen) { case (lefts, rights) =>
      val l = lefts.toDF("k", "us", "lv")
        .select($"k", timestamp_micros($"us").as("ts"), $"lv")
      val r = rights.toDF("k", "us", "tie", "rv")
        .select($"k", timestamp_micros($"us").as("ts"), $"tie", $"rv")
      val got = AsofJoin.asofJoin(l, r, Seq("k"), "ts", "tie")
        .select($"k", unix_micros($"ts"), $"lv",
          $"asof.tie", $"asof.rv", unix_micros($"asof.asof_ts"))
        .collect()
        .map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) None
          else Some((x.getLong(3), x.getLong(4), x.getLong(5)))))
        .toSeq
      val want = brute(lefts, rights)
      got.sortBy(_.toString) == want.sortBy(_.toString)
    }, minTests = 10)
  }

  test("composite keys: the join key is (k1, k2), never k1 alone") {
    import spark.implicits._
    val l = Seq((0, 0, 10L, 1L), (0, 1, 10L, 2L)).toDF("k1", "k2", "us", "lv")
      .select($"k1", $"k2", timestamp_micros($"us").as("ts"), $"lv")
    val r = Seq((0, 0, 5L, 0L, 7L), (1, 1, 5L, 1L, 8L))
      .toDF("k1", "k2", "us", "tie", "rv")
      .select($"k1", $"k2", timestamp_micros($"us").as("ts"), $"tie", $"rv")
    val got = AsofJoin.asofJoin(l, r, Seq("k1", "k2"), "ts", "tie")
      .select($"lv", $"asof.rv").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .toMap
    assert(got(1L) == Some(7L), s"(0,0) must match its own composite key: $got")
    assert(got(2L).isEmpty, s"(0,1) must NOT borrow (0,0)'s right row: $got")
  }
}
