package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Analytics
import graft.parse.BlsParser

/** Property-based tests (SURVEY.md §5 test plan): parse totality,
  * best-year invariants, sync-counter algebra.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop, minTests: Int = 20): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val lineGen: Gen[String] = Gen.oneOf(
    // well-formed
    for {
      sid <- Gen.alphaUpperStr.map(s => "PRS" + s.take(8).padTo(8, '0'))
      year <- Gen.choose(1990, 2030)
      p <- Gen.choose(1, 5)
      v <- Gen.choose(-100.0, 100.0)
    } yield f"$sid\t$year\tQ0$p\t$v%.1f",
    // junk
    Gen.oneOf("", "   ", "garbage", "a b", "x\ty\tz\tw\tv\tu",
      "PRS1\tnotayear\tQ01\t1.0", "PRS1\t2020\tQ01\tnotanumber"),
    Gen.asciiPrintableStr.map(_.replace("\n", " ").take(60)))

  test("parse totality: any input either yields a typed row or is dropped, never throws") {
    check(Prop.forAll(Gen.listOfN(40, lineGen)) { lines =>
      val parsed = BlsParser.parse(lines.toDF("value")).collect()
      parsed.forall { r =>
        !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3)
      }
    })
  }

  private val obsGen = for {
    sid <- Gen.oneOf("S1", "S2", "S3")
    year <- Gen.choose(2000, 2005)
    p <- Gen.choose(1, 5)
    v <- Gen.choose(-50, 50).map(_.toDouble)
  } yield (sid, year, s"Q0$p", v)

  test("best-year invariants: result year in series years; sum equals max yearly sum; ties pick min year") {
    check(Prop.forAll(Gen.listOfN(60, obsGen)) { obs0 =>
      val obs = obs0.distinctBy(o => (o._1, o._2, o._3))
      val bls = obs.toDF("series_id", "year", "period", "value")
      val best = Analytics.bestYearBySeries(bls).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toList
      val yearly: Map[(String, Int), Double] = obs
        .groupBy(o => (o._1, o._2))
        .view.mapValues(_.map(_._4).sum).toMap
      best.forall { case (sid, by, sv) =>
        val sums = yearly.collect { case ((s, y), v) if s == sid => (y, v) }
        val maxSum = sums.map(_._2).max
        val minYearAtMax = sums.filter(t => t._2 == maxSum).map(_._1).min
        math.abs(sv - maxSum) < 1e-9 && by == minYearAtMax
      } && best.map(_._1).toSet == obs.map(_._1).toSet
    })
  }

  test("sync-counter algebra: uploaded + updated + skipped + errors = remote files") {
    import graft.ingest._
    import scala.util.Success
    check(Prop.forAll(
      Gen.choose(0, 8), Gen.choose(0, 8), Gen.choose(0, 4)) { (nNew, nSame, nFail) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      val src = "https://example.test/pr/"
      val all = (0 until nNew + nSame + nFail).map(i => f"pr.f$i%02d")
      val listing = all.map(f => s"""<a href="$f">$f</a>""").mkString
      // pre-seed the "same" files locally with identical bytes
      all.slice(nNew, nNew + nSame).foreach { f =>
        LocalFileStore.write(s"$dir/$f", s"body-$f".getBytes, overwrite = true)
      }
      val responses: Map[String, scala.util.Try[String]] =
        Map(src -> Success(listing)) ++
          all.take(nNew + nSame).map(f => (src + f) -> Success(s"body-$f")).toMap
      val m = BlsMirrorSync.run(new FakeFetcher(responses), LocalFileStore,
        BlsSyncConfig(src, dir))
      m.uploaded == nNew && m.updated == 0 && m.skipped == nSame &&
        m.errors.size == nFail &&
        m.uploaded + m.updated + m.skipped + m.errors.size == all.size
    })
  }
}
