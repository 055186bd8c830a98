package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the r10 kernels, driven through their static
  * eval methods (no Spark session needed): the scrub kernel against a
  * plain-Scala tokenizer reference, and CDC chunking's structural
  * invariants on arbitrary byte payloads.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop, minTests: Int = 60): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.oneOf("alpha", "beta", "gamma", "x1", "Y2"),
    Gen.oneOf(" ", "  ", "\t", "\n"))).map(_.mkString)

  private def refToks(s: String): Seq[String] =
    s.split("\\s+").filter(_.nonEmpty).toSeq

  private def scrub(text: String, drops: Seq[Long]): (Long, Long, String) = {
    val row = graft.functions.ShingleImpl.scrubTokens(
      UTF8String.fromString(text),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        drops.map(l => l: Any).toArray))
    (row.getLong(0), row.getLong(1), row.getUTF8String(2).toString)
  }

  test("scrub_tokens: totals, phantom positions, empty/full drops (property)") {
    val posGen = Gen.listOf(Gen.choose(-2L, 40L))
    check(Prop.forAll(textGen, posGen) { (text, drops) =>
      val toks = refToks(text)
      val dropSet = drops.toSet
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !dropSet.contains(i.toLong) => t
      }
      val (nTok, nRemoved, keptText) = scrub(text, drops)
      // n_tok is the \s+ token count; n_removed counts only REAL
      // dropped tokens (phantom/negative positions ignored); kept_text
      // is the survivors joined by single spaces, in order
      nTok == toks.length.toLong &&
        nRemoved == (toks.length - kept.length).toLong &&
        keptText == kept.mkString(" ")
    })
    // exhaustive edges
    assert(scrub("", Seq(0L)) == ((0L, 0L, "")))
    assert(scrub("a b c", Seq.empty) == ((3L, 0L, "a b c")))
    assert(scrub("a b c", Seq(0L, 1L, 2L)) == ((3L, 3L, "")))
  }

  private val payloadGen: Gen[Array[Byte]] =
    Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  private def cdc(p: Array[Byte]): Seq[String] = {
    val arr = graft.functions.CdcChunks.chunks(p, 8, 64)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("cdc_chunks: chunk digests reassemble the payload exactly (property)") {
    check(Prop.forAll(payloadGen) { p =>
      val chunks = cdc(p)
      if (p.isEmpty) chunks.isEmpty
      else {
        // re-derive the boundary segmentation independently and check
        // every chunk id is the md5 of its hex slice, in order, with
        // the slices tiling the payload completely
        val hx = p.map(b => f"${b & 0xff}%02X").mkString
        val pow = Array.iterate(1L, 8)(_ * 31)
        val ends = ((7 until p.length).filter { i =>
          val sum = (0 until 8).map(k => (p(i - 7 + k) & 0xff).toLong * pow(7 - k)).sum
          (sum % 1000000007L) % 64 == 0
        } :+ (p.length - 1)).distinct.sorted
        val expected = ends.foldLeft((Seq.empty[String], 0)) { case ((acc, s), e) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val d = md.digest(hx.substring(s * 2, (e + 1) * 2).getBytes("US-ASCII"))
          (acc :+ d.map("%02x".format(_)).mkString, e + 1)
        }._1
        chunks == expected
      }
    })
  }

  test("cdc_chunks: identical payloads chunk identically; chunking is deterministic") {
    check(Prop.forAll(payloadGen) { p =>
      cdc(p) == cdc(p.clone())
    })
  }
}
