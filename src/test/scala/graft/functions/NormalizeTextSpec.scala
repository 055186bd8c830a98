package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The t19 hygiene kernel on planted mess the clean synthetic corpus
  * cannot exercise: NFC composition, control/zero-width stripping,
  * whitespace+Zs collapse, and the interactions between them. The
  * expected values are hand-derived from the published contract
  * (NormalizeExprImpl's scaladoc == the oracle's regex chain). All
  * invisible characters are built from explicit code points so the
  * fixtures stay readable and editor-safe.
  */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private def cp(i: Int): String = new String(Character.toChars(i))
  private val BEL = cp(0x0007)
  private val DEL = cp(0x007f)
  private val C1 = cp(0x0085) // NEL, a C1 control
  private val ZWSP = cp(0x200b)
  private val BOM = cp(0xfeff)
  private val NBSP = cp(0x00a0)
  private val EMSP = cp(0x2003)
  private val ACUTE = cp(0x0301) // combining acute accent
  private val EACUTE = cp(0x00e9) // precomposed é

  private def norm(ss: Seq[String]): Seq[String] =
    ss.toDF("t").select(exprs.normalize_text($"t").as("n"))
      .collect().map(_.getString(0)).toSeq

  private def norm1(s: String): String = norm(Seq(s)).head

  test("NFC composes decomposed sequences") {
    assert(norm1("Cafe" + ACUTE) == "Caf" + EACUTE)
    // already-composed text is untouched
    assert(norm1("Caf" + EACUTE) == "Caf" + EACUTE)
  }

  test("controls and zero-widths strip; tabs/newlines survive as spaces") {
    assert(norm1("a" + BEL + "b") == "ab", "BEL strips without leaving a space")
    assert(norm1("a" + ZWSP + "b") == "ab", "zero-width space strips")
    assert(norm1(BOM + "doc") == "doc", "leading BOM strips")
    assert(norm1("a\tb\nc\rd") == "a b c d", "tab/newline/CR collapse to spaces")
    assert(norm1("a " + BEL + " b") == "a b",
      "a stripped control between spaces must not double the space")
    assert(norm1("x" + DEL + C1 + "yz") == "xyz", "DEL and C1 controls strip")
  }

  test("whitespace runs collapse, NBSP included; ends trim") {
    assert(norm1("  a   b  ") == "a b")
    assert(norm1("a" + NBSP + NBSP + "b") == "a b", "NBSP is a Zs separator")
    assert(norm1("a" + EMSP + "b") == "a b", "EM SPACE is a Zs separator")
    assert(norm1(" \t \n ") == "", "all-whitespace text normalizes to empty")
    assert(norm1("") == "")
  }

  test("normalization is idempotent") {
    val messy = Seq("Cafe" + ACUTE + "  x", BOM + " a\tb ", "z" + ZWSP + " y", "")
    val once = norm(messy)
    assert(norm(once) == once, "normalize(normalize(x)) must equal normalize(x)")
  }

  test("kernel matches the oracle regex chain on a mixed sample") {
    // the same transform expressed through Spark's declarative regex
    // functions (the oracle's shape, minus nfc which Spark lacks —
    // inputs here are pre-composed so NFC is the identity)
    val messy = Seq("a" + BEL + "b", "  x\t\ty  ", "p" + ZWSP + " q",
      "plain text", "a" + NBSP + "b", "del" + DEL + "c1" + C1)
    val declarative = messy.toDF("t").select(
      trim(regexp_replace(regexp_replace($"t",
        "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f\\u200b-\\u200f\\u2060\\ufeff]", ""),
        "[\\t\\n\\r \\p{Zs}]+", " "), " ").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(norm(messy) == declarative,
      "kernel and declarative regex chain diverge")
  }
}
