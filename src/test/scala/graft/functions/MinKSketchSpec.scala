package graft.functions

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the KMV min-K aggregator's pure algebra — the
  * invariants the streaming path leans on (stream == batch holds iff
  * reduce/merge form a commutative, associative, idempotent monoid
  * whose result is the sorted distinct min-K of the inputs).
  */
class MinKSketchSpec extends AnyFunSuite {

  private def check(prop: Prop, minTests: Int = 60): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private val K = MinKSketch.K
  private val hashGen: Gen[Long] = Gen.chooseNum(0L, (1L << 60) - 1)
  private val listGen: Gen[List[Long]] = Gen.listOf(hashGen)

  private def foldAll(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(MinKSketch.zero)(MinKSketch.reduce)

  private def expected(xs: Seq[Long]): Seq[Long] =
    xs.distinct.sorted.take(K)

  test("fold-reduce over any input == sorted distinct min-K") {
    check(Prop.forAll(listGen) { xs =>
      foldAll(xs).toSeq == expected(xs)
    })
  }

  test("reduce is insertion-order independent") {
    check(Prop.forAll(listGen) { xs =>
      foldAll(xs).toSeq == foldAll(xs.reverse).toSeq
    })
  }

  test("merge is commutative, associative, idempotent, and == fold of the union") {
    check(Prop.forAll(listGen, listGen, listGen) { (a, b, c) =>
      val (sa, sb, sc) = (foldAll(a), foldAll(b), foldAll(c))
      def m(x: Array[Long], y: Array[Long]) = MinKSketch.merge(x.clone(), y.clone())
      val comm = m(sa, sb).toSeq == m(sb, sa).toSeq
      val assoc = m(m(sa, sb), sc).toSeq == m(sa, m(sb, sc)).toSeq
      val idem = m(sa, sa).toSeq == sa.toSeq
      val union = m(sa, sb).toSeq == expected(a ++ b)
      comm && assoc && idem && union
    })
  }

  test("re-delivery changes nothing: reduce of an already-present hash is identity") {
    check(Prop.forAll(listGen.suchThat(_.nonEmpty)) { xs =>
      val s = foldAll(xs)
      xs.forall(h => MinKSketch.reduce(s.clone(), h).toSeq == s.toSeq)
    })
  }
}
