package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PerplexityScoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // Corpus-typical docs repeat the "a b" pattern; doc 9 is token soup
  // that shares the vocabulary but never the corpus's dominant bigrams.
  private val corpus = docs(
    1L -> "a b a b a b a b",
    2L -> "a b a b a b c d",
    3L -> "a b a b c d a b",
    9L -> "b c d a d c b a")

  test("corpus-typical text scores lower perplexity than token soup") {
    val lm = PerplexityScore.bigramLm(corpus, "doc_id", "text")
    val ppl = PerplexityScore.scorePerplexity(corpus, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(1L) < ppl(9L) && ppl(2L) < ppl(9L) && ppl(3L) < ppl(9L),
      s"the fluent-noise doc must score highest: $ppl")
  }

  test("conditional probabilities per context sum to ~1") {
    val lm = PerplexityScore.bigramLm(corpus, "doc_id", "text")
      .select(split($"bigram", " ").getItem(0).as("w1"), $"cond_p")
      .groupBy($"w1").agg(sum($"cond_p").as("tot"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    lm.foreach { case (w1, tot) =>
      assert(math.abs(tot - 1.0) < 1e-4, s"P(.|$w1) sums to $tot")
    }
  }

  test("documents without a bigram are absent; unseen bigrams take the floor") {
    val short = docs(5L -> "solo", 6L -> "x y")
    val lm = PerplexityScore.bigramLm(corpus, "doc_id", "text")
    val out = PerplexityScore
      .scorePerplexity(short, "doc_id", "text", lm, unseenFloor = 1e-6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.map(_._1) == Seq(6L), s"1-token doc must be absent, got $out")
    // every bigram of doc 6 is unseen -> ppl = 1 / floor
    assert(out.head._3 == 1e6, s"fully-unseen doc must score 1/floor, got $out")
  }

  test("Kneser-Ney matches a hand-computed fixture (seen, unseen-bigram, unseen-context)") {
    // train: "a b" x3, "a c", "b a" -> counts: (a,b)=3 (a,c)=1 (b,a)=1
    //   + cross-doc bigrams from the 2-shingle stream of each doc
    val train = docs(1L -> "a b a b a b", 2L -> "a c b a")
    // train bigram occurrences: d1: ab ba ab ba ab; d2: ac cb ba
    // counts: ab=3, ba=3, ac=1, cb=1 -> T=4 types
    // ctx: a: c1=4 (ab+ac), n1p_fw=2 ; b: c1=3+?, ba=3 -> c1=3, n1p_fw=1
    //      c: cb=1 -> c1=1, n1p_fw=1
    // cont: b<-{a,c}? ab,cb -> n1p_bw(b)=2; a<-{b}=1; c<-{a}=1
    val score = docs(10L -> "a b x")
    // doc 10 bigrams: "a b" (seen), "b x" (unseen w2=x, seen ctx b)
    val out = PerplexityScore
      .scorePerplexityKN(score, train, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1 && out.head._2 == 2L)
    // hand computation (T=4 bigram types, W2={a,b,c}=3, V={a,b,c}=3):
    //   Pcont(b) = (max(2-0.75,0) + 0.75*3/3) / 4 = (1.25+0.75)/4 = 0.5
    //   p("a b"): seen bigram, ctx a: c1=4, n1p_fw=2
    //     -> (max(3-0.75,0) + 0.75*2*0.5) / 4 = (2.25+0.75)/4 = 0.75
    //   Pcont(x) = (0 + 0.75*3/3) / 4 = 0.1875 (uniform-interp mass —
    //     an unseen word still gets genuine continuation probability)
    //   p("b x"): unseen bigram, ctx b seen (c1=3, n1p_fw=1)
    //     -> (0 + 0.75*1*0.1875) / 3 = 0.046875
    val expected = BigDecimal(math.exp(-(math.log(0.75) + math.log(0.046875)) / 2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head._3 == expected,
      s"KN ppl ${out.head._3} != hand-computed $expected")
  }

  // The classic Kneser-Ney demonstration corpus: "francisco" is
  // frequent but ONLY ever follows "san" (promiscuity-poor), "b"
  // follows many different words (promiscuity-rich), and 40 hapax
  // sentences inflate the vocabulary — the tax add-one pays on every
  // seen bigram. (The engine's synthetic sf corpora have a ~31-token
  // vocab and ZERO unseen held-out bigrams, so they cannot exercise
  // smoothing at all — measured before these planted tests replaced
  // an sf-corpus comparison.)
  private val knTrain = {
    val sanFrancisco = (1L to 20L).map(i => i -> "san francisco")
    val promiscuous = Seq(
      100L -> "a b c b d b e b",
      101L -> "c b a b d b",
      102L -> "e b c b a b")
    val hapax = (200L until 240L).map(i => i -> s"u$i v$i")
    docs((sanFrancisco ++ promiscuous ++ hapax): _*)
  }

  test("Kneser-Ney continuation: novel context prefers promiscuous words; add-one cannot tell") {
    // held-out: "q" is an unseen context; "b" follows 5 distinct words
    // in train, "francisco" only 1 — KN's continuation distribution
    // ranks "q b" as far more plausible than "q francisco"; add-one
    // assigns both the identical 1/(0+V) and cannot distinguish them.
    val held = docs(1000L -> "q b", 1001L -> "q francisco")
    val kn = PerplexityScore.scorePerplexityKN(held, knTrain, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a1 = PerplexityScore.scorePerplexityAddOne(held, knTrain, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(kn(1000L) < kn(1001L),
      s"KN must prefer the promiscuous continuation: $kn")
    assert(a1(1000L) == a1(1001L),
      s"add-one must be blind to continuation promiscuity: $a1")
  }

  test("Kneser-Ney scores held-out text better than add-one (hapax-inflated vocab)") {
    // held-out docs reuse the corpus's dominant seen bigrams plus one
    // novel recombination each; add-one taxes every seen bigram by
    // V ≈ 90 extra counts, KN only by the 0.75 discount.
    val held = docs(
      1000L -> "san francisco san francisco",
      1001L -> "a b e b c b",
      1002L -> "d b san francisco")
    val kn = PerplexityScore.scorePerplexityKN(held, knTrain, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a1 = PerplexityScore.scorePerplexityAddOne(held, knTrain, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(kn.keySet == a1.keySet && kn.size == 3)
    kn.keySet.foreach { id =>
      assert(kn(id) < a1(id), s"doc $id: KN ${kn(id)} must beat add-one ${a1(id)}")
    }
    val gmKn = math.exp(kn.values.map(math.log).sum / kn.size)
    val gmA1 = math.exp(a1.values.map(math.log).sum / a1.size)
    assert(gmKn < gmA1, s"KN geomean $gmKn must be under add-one $gmA1")
  }
}
