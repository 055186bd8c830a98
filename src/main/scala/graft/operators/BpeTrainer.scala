package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** BPE tokenizer training — the textbook byte-pair-encoding merge
  * loop (Sennrich et al.): count adjacent symbol pairs over the
  * word-frequency table, merge the most frequent pair everywhere,
  * repeat. Deterministic throughout: ties break lexicographically on
  * (left, right), so the learned merge table is a pure function of
  * the corpus.
  *
  * Symbol sequences are carried in TWO synchronized forms — a list
  * (for pair counting) and a self-delimited string `<l><o><w>` (for
  * merge application): `replace(s, '<l><o>', '<lo>')` is a literal
  * left-to-right non-overlapping scan in BOTH Spark and DuckDB, which
  * is exactly BPE's greedy merge order, and the `<>` delimiters make
  * multi-char symbols unambiguous. That equivalence is what lets the
  * DuckDB oracle (t16) replay the whole training loop.
  *
  * Scale shape: the corpus-sized work is ONE census (explode tokens →
  * groupBy word), after which every merge round runs on the distinct-
  * word table — vocab-sized (≤ ~10⁸ rows at 100 TB), never the
  * corpus. Each round is one partial-aggregated pair census + a
  * map-only merge apply, checkpointed to keep lineage flat. A
  * production tokenizer run (30–50k merges) would batch merges per
  * pass or train on a sample; the loop here is the exact algorithm.
  */
object BpeTrainer {

  final case class Merge(step: Long, left_sym: String, right_sym: String, pair_freq: Long)

  /** Words as (freq, s, syms): alphanumeric whitespace tokens only
    * (the `<>` delimiters must not occur inside symbols).
    */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(wsTokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[A-Za-z0-9]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(lit("<"), array_join(split(col("w"), ""), "><"), lit(">")).as("s"),
        split(col("w"), "").as("syms"))

  /** Adjacent-pair census of a word table: (l, r, pf) weighted by word
    * frequency — partial aggregation collapses the explode map-side.
    */
  private def pairCensus(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
             i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))""")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("pf"))

  /** Learn `numMerges` merges from the corpus. Stops early if the
    * vocabulary runs out of adjacent pairs.
    */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    var cur = wordTable(docs, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var step = 1L
    var exhausted = false
    while (step <= numMerges && !exhausted) {
      val top = pairCensus(cur)
        .orderBy(col("pf").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, pf) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += Merge(step, l, r, pf)
        // call_function, not SQL-text interpolation: symbols pass as
        // literals, so the merge apply cannot break if the word filter
        // ever admits characters meaningful to the SQL parser
        cur = cur
          .select(col("freq"),
            call_function("replace", col("s"),
              lit(s"<$l><$r>"), lit(s"<$l$r>")).as("s"))
          .select(col("freq"), col("s"),
            expr("regexp_extract_all(s, '<([^>]*)>', 1)").as("syms"))
          .localCheckpoint(true)
        step += 1
      }
    }
    merges.result()
  }

  /** The learned merge table as a DataFrame (the t16 query surface). */
  def learnMergesDF(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, numMerges).toDF()
  }

  /** Segment a word column into the learned subword units: apply the
    * merge list in training order (the standard BPE encode). Pure
    * column expressions — one codegen'd projection however many
    * merges are applied. Words containing the `<`/`>` delimiter
    * characters would corrupt the self-delimited encoding and are
    * emitted unsegmented (single-element array) — the same contract
    * as training, which only learns over alphanumeric tokens.
    */
  def segment(df: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    val enc0: Column =
      concat(lit("<"), array_join(split(col(wordCol), ""), "><"), lit(">"))
    val encoded = merges.foldLeft(enc0) { (s, m) =>
      call_function("replace", s,
        lit(s"<${m.left_sym}><${m.right_sym}>"), lit(s"<${m.left_sym}${m.right_sym}>"))
    }
    df.withColumn("subwords",
      when(col(wordCol).rlike("[<>]"), array(col(wordCol)))
        .otherwise(regexp_extract_all(encoded, lit("<([^>]*)>"), lit(1))))
  }
}
