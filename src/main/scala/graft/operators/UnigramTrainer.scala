package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** Unigram-LM tokenizer training (Kudo 2018, the SentencePiece
  * unigram model) — the other tokenizer family in production use
  * beside BPE ([[BpeTrainer]]). Where BPE grows a vocabulary bottom-up
  * by merging, the unigram model starts from an over-complete seed
  * vocabulary (all frequent substrings) and fits piece probabilities
  * by EM over every possible segmentation of every word; encoding is
  * the Viterbi argmax segmentation.
  *
  * EM here is the exact soft flavour: the E-step computes each
  * piece-occurrence's marginal probability with the standard
  * forward/backward lattice DP over word positions, and the M-step
  * renormalizes expected counts. The whole fit is replayable in the
  * DuckDB oracle (t26) because every FP step is deterministic by
  * construction:
  *  - piece probabilities are rounded to 6 dp before every round
  *    (through Spark's `round`, the engine-pairing t14 established);
  *  - the lattice DPs use only IEEE +/·/÷ in a FIXED accumulation
  *    order (increasing split position; no logs, no re-association),
  *    so alphas/betas are bit-identical across engines;
  *  - each occurrence's marginal is quantized to integer MICRO-units
  *    (floor(x·1e6 + 0.5)) before any cross-row sum, so corpus-level
  *    expected counts are exact bigints, summation-order-free.
  *
  * Scale shape (BpeTrainer's): the corpus-sized work is ONE token
  * census (explode → groupBy word); every EM round runs one kernel
  * call per DISTINCT word ([[graft.functions.UnigramEm]], model as
  * driver-side state — plan O(1) nodes at any vocab) plus a
  * vocab-sized integer aggregate; the M-step collects the model-sized
  * count table (the KMeans-centroid pattern). Micro-quantization
  * headroom: expected-count sums reach ~1e6 micro-units per corpus
  * token, so bigint overflow needs ~9e12 tokens — at the 100 TB scale
  * drop the quantum to 1e4 or shard the M-step sum.
  *
  * Caps (applied identically in the oracle): words are alphanumeric
  * whitespace tokens of ≤ [[MaxWord]] chars (SentencePiece caps
  * sentence/piece lengths the same way); candidate pieces are 1..4
  * chars; the seed keeps every single char (coverage guarantee) plus
  * the top [[SeedMulti]] multi-char substrings by occurrence-weighted
  * frequency (ties lexicographic).
  */
object UnigramTrainer {

  val MaxWord = 12
  val SeedMulti = 48

  final case class PieceStat(piece: String, em_prob: Double, vit_count: Long)

  /** Distinct-word frequency table over alphanumeric tokens. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(wsTokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[A-Za-z0-9]+$") && length(col("w")) <= MaxWord)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Occurrence-weighted substring census (lengths 1..4): the seed
    * vocabulary candidates.
    */
  private def substringCensus(words: DataFrame): DataFrame =
    words
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)), st ->
              transform(sequence(1, least(${graft.functions.UnigramImpl.MaxPiece},
                                          length(w) - st + 1)),
                ln -> substring(w, st, ln))))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))

  /** The seed vocabulary: every single char + top-[[SeedMulti]]
    * multi-char substrings, with occurrence counts.
    */
  private def seedTable(words: DataFrame): DataFrame = {
    val subs = substringCensus(words)
    subs.filter(length(col("piece")) === 1)
      .unionByName(subs.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(SeedMulti))
  }

  /** Renormalize a (piece, cnt) table into 6-dp probabilities through
    * Spark's own `round` (the DuckDB-pairing the t14 contract uses) —
    * model-sized frame, collected for the next round's kernel.
    */
  private def normalized(counts: Seq[(String, Long)], spark: org.apache.spark.sql.SparkSession)
      : Seq[(String, Double)] = {
    import spark.implicits._
    val df = counts.toDF("piece", "cnt")
    df.crossJoin(broadcast(df.agg(sum(col("cnt")).as("tot"))))
      .select(col("piece"), round(col("cnt") / col("tot"), 6).as("p"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
  }

  /** Fit the unigram model with `rounds` EM iterations and Viterbi-
    * encode the corpus under the final model. Returns the model-sized
    * result frame (piece, em_prob, vit_count), pieces sorted into the
    * deterministic pid order (lexicographic).
    */
  def train(docs: DataFrame, textCol: String, rounds: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordTable(docs, textCol).localCheckpoint(true)
    val seed = seedTable(words)
      .orderBy(col("piece").asc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val pieces = seed.map(_._1).toArray
    var probs = {
      val p = normalized(seed, spark).toMap
      pieces.map(p)
    }
    var r = 0
    while (r < rounds) {
      val cnts = words
        .select(col("freq"),
          explode(graft.functions.exprs.unigram_em(col("w"), pieces, probs)).as("e"))
        .groupBy(col("e.pid").as("pid"))
        .agg(sum(col("e.micro") * col("freq")).as("cnt"))
        .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
      val p = normalized(
        pieces.indices.map(i => (pieces(i), cnts.getOrElse(i, 0L))).toSeq, spark).toMap
      probs = pieces.map(p)
      r += 1
    }
    val vit = words
      .select(col("freq"),
        explode(graft.functions.exprs.unigram_viterbi(col("w"), pieces, probs)).as("pid"))
      .groupBy(col("pid")).agg(sum(col("freq")).as("vit_count"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    pieces.indices
      .map(i => PieceStat(pieces(i), probs(i), vit.getOrElse(i, 0L)))
      .toDF()
  }
}
