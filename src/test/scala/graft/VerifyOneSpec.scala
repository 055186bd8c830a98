package graft

import org.scalatest.funsuite.AnyFunSuite

/** VerifyOne must resolve EVERY requested name against the registry
  * before running or deleting anything: r17's sf10 campaign lost 2 of
  * its 3 dump chunks to five misspelled query names because resolution
  * happened lazily inside the per-query loop — a typo at position k
  * wasted the preceding runs AND aborted the rest.
  */
class VerifyOneSpec extends AnyFunSuite {

  test("a misspelled name fails fast with the nearest registry match " +
    "and deletes no prior dump") {
    val out = java.nio.file.Files.createTempDirectory("v1spec").toFile
    val prior = new java.io.File(out, "q52_sequence_mining")
    assert(prior.mkdir())
    // the exact typo that killed r17's chunk 2, plus a good name AFTER
    // it — validation must reject the whole launch before any run
    val e = intercept[RuntimeException](VerifyOne.main(
      Array("q52_seq_mining,q44_funnel", "/nonexistent-sf-dir", out.toString)))
    assert(e.getMessage.contains("q52_seq_mining"))
    assert(e.getMessage.contains("nearest: 'q52_sequence_mining'"))
    assert(e.getMessage.contains("nothing was run or deleted"))
    assert(prior.isDirectory, "a prior dump must survive a failed launch")
    assert(out.listFiles().map(_.getName).toSeq == Seq("q52_sequence_mining"),
      "no dump dir may be created by a failed launch")
  }

  test("all five r17 typos resolve to the names the builder meant") {
    val e = intercept[RuntimeException](VerifyOne.validateNames(Seq(
      "q52_seq_mining", "d16_decontaminate_ivf", "s10_ivfpq",
      "t16_bpe_train", "t26_textrank")))
    for (want <- Seq("q52_sequence_mining", "s10_ann_ivfpq", "t16_bpe_merges"))
      assert(e.getMessage.contains(s"'$want'"), s"nearest-match miss: $want")
  }

  test("valid names pass validation untouched") {
    VerifyOne.validateNames(Seq("q01_pricing_summary", "t26_unigram_lm"))
  }
}
