package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** d11 equivalence: the banded fuzzy-dedup plan (LSH candidates →
  * length-difference prune → thresholded levenshtein with the
  * driver-derived cap) must keep exactly the pairs the UNPRUNED
  * computation keeps — plain `levenshtein` over every candidate, no
  * length prefilter, no DP cutoff. The prunes are sound by the
  * triangle bound (||a|-|b|| <= edit distance) plus the rounding-slack
  * argument in the query's Scaladoc; this spec makes the argument
  * falsifiable against the real corpus AND a planted boundary corpus.
  */
class FuzzyDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 0.02

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "lev", "rel_dist")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq

  /** Uncapped reference: same candidates, full DP per pair, rel filter
    * only.
    */
  private def uncapped(docs: org.apache.spark.sql.DataFrame) = {
    val cand = graft.operators.TextDedup
      .minhashCandidates(docs, "doc_id", "text")
      .select($"doc_a", $"doc_b")
    val texts = docs.select($"doc_id", $"text")
    cand
      .join(texts.select($"doc_id".as("doc_a"), $"text".as("text_a")), "doc_a")
      .join(texts.select($"doc_id".as("doc_b"), $"text".as("text_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        levenshtein($"text_a", $"text_b").cast("long").as("lev"),
        greatest(length($"text_a"), length($"text_b")).as("maxlen"))
      .select($"doc_a", $"doc_b", $"lev",
        round($"lev" / $"maxlen", 4).as("rel_dist"))
      .filter($"rel_dist" <= Tau)
  }

  test("d11 capped+pruned == uncapped levenshtein on the test corpus") {
    val fast = collectPairs(DedupQueries.d11FuzzyDedup.run(spark, sfDir))
    val slow = collectPairs(uncapped(Tables.documents(spark, sfDir)))
    assert(fast.nonEmpty, "no qualifying pairs at sf0.001 — vacuous test")
    assert(fast == slow,
      s"banded plan diverged from the exhaustive DP:\n fast=$fast\n slow=$slow")
  }

  test("planted pairs straddling the cap boundary resolve identically") {
    // 60 tokens ≈ 300 chars; cap = ceil(0.02 * maxlen) + 1 ≈ 7-8.
    // Plant: an exact dup (lev 0), a 1-edit pair (clearly under tau),
    // a pair just OVER tau (char edits ~5% of length — inside the
    // length prefilter but bailed out by the DP cutoff, the -1 branch),
    // and a pair with a large length gap (killed by the prefilter).
    val base = (1 to 60).map(i => f"tok$i%03d").mkString(" ")
    val oneEdit = base.updated(10, 'X')
    val overTau = {
      val chars = base.toCharArray
      (0 until chars.length by 20).foreach(i => chars(i) = 'Z')
      new String(chars)
    }
    val shorter = base.take(base.length / 2)
    val docs = Seq(
      1L -> base, 2L -> base, 3L -> oneEdit, 4L -> overTau, 5L -> shorter)
      .toDF("doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("fuzzy_dedup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings unused by d11 but Tables.documents only needs the one
    val fast = collectPairs(DedupQueries.d11FuzzyDedup.run(spark, dir))
    val slow = collectPairs(uncapped(docs))
    assert(fast == slow,
      s"boundary corpus diverged:\n fast=$fast\n slow=$slow")
    // the planted structure actually exercised the branches
    val kept = fast.map(p => (p._1, p._2)).toSet
    assert(kept.contains((1L, 2L)) && kept.contains((1L, 3L)),
      s"exact dup and 1-edit pair must survive, kept=$kept")
    assert(!kept.exists(p => p._2 == 4L || p._1 == 4L),
      s"the over-tau mutation must be rejected, kept=$kept")
    assert(!kept.exists(p => p._2 == 5L || p._1 == 5L),
      s"the half-length doc must be rejected, kept=$kept")
  }

  test("45k-char boundary pair survives the cap (r9 ADVICE: rounding slack > +1)") {
    // 4-dp HALF_UP acceptance admits lev up to (tau + 0.00005)·maxlen,
    // so past maxlen = 20k chars the naive cap ceil(tau·gmax)+1 no
    // longer covers every qualifying pair. Plant a pair in that gap:
    // maxlen = 44999, naive cap = ceil(899.98)+1 = 901, qualifying max
    // lev = floor below 0.02005·44999 = 902.23 → 902. A lev-902 pair
    // must be KEPT; under the naive cap the banded DP bails to -1 and
    // the pair is silently dropped.
    //
    // lev is exact by construction: a contiguous equal-length block
    // substitution with a disjoint alphabet ('Z' never appears in the
    // base) has edit distance exactly the block length — the matched
    // prefix/suffix pin the alignment and no character inside the
    // block can match.
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxy0123456789" // no 'z'/'Z'
    val base = Seq.fill(9000)(
      Seq.fill(4)(alpha(rnd.nextInt(alpha.length))).mkString).mkString(" ")
    assert(base.length == 44999)
    def blockSub(start: Int, n: Int): String =
      base.substring(0, start) + "Z" * n + base.substring(start + n)
    val justUnder = blockSub(1000, 902)  // rel 0.02004 → rounds to tau, KEPT
    val justOver = blockSub(20000, 910)  // rel 0.02022 → over tau, dropped
    val docs = Seq(1L -> base, 2L -> justUnder, 3L -> justOver)
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("fuzzy_long").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = collectPairs(DedupQueries.d11FuzzyDedup.run(spark, dir))
    val byPair = out.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((1L, 2L)).contains(902L),
      s"the lev-902 boundary pair must survive with its exact distance, got=$out")
    assert(!byPair.contains((1L, 3L)) && !byPair.contains((2L, 3L)),
      s"over-tau long pairs must be rejected, got=$out")
  }
}
