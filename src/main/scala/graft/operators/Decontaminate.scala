package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination — remove (or flag) training documents that
  * share word n-gram shingles with a benchmark/eval corpus, so the
  * model is not trained on its own test set. The standard pretraining
  * hygiene pass (the reference corpus is the published eval suite; the
  * n-gram overlap rule is the widely published decontamination
  * criterion).
  *
  * Scale shape — the part that matters at 100 TB: the benchmark corpus
  * is tiny (eval suites are MBs) while the training corpus is the
  * 100 TB side, so the contamination check is ONE broadcast hash join
  * of the training shingle stream against the broadcast benchmark
  * shingle-hash set. No shuffle of the corpus, no self-join; cost is a
  * single linear scan. Shingles hash through the engine-portable
  * md5-prefix (`graft.functions.exprs.token_hash60`), same contract as
  * the dedup ladder.
  */
object Decontaminate {

  /** (id, shingle-hash) pairs of a corpus — shared shingling contract
    * with the dedup ladder (word n-grams, 60-bit md5 prefix). NOT
    * deduplicated: a distinct here would shuffle the whole corpus;
    * callers dedup after the benchmark probe has filtered the stream.
    */
  private def shingleHashes(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), explode(TextDedup.shingles(col(textCol), n)).as("sh"))
      .select(col(idCol), graft.functions.exprs.token_hash60(col("sh")).as("h"))

  /** Per-training-doc contamination evidence: (idCol, n_hits) for every
    * training doc sharing ≥ 1 distinct shingle with the benchmark
    * corpus; n_hits counts the distinct shared shingle hashes. The
    * benchmark side is explicitly broadcast, and the distinct-count
    * happens AFTER the probe — the only shuffled rows are the matches,
    * not the corpus's shingle stream.
    */
  def contaminationHits(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    val benchSet = shingleHashes(bench, idCol, textCol, n)
      .select(col("h")).distinct()
    shingleHashes(train, idCol, textCol, n)
      .join(broadcast(benchSet), Seq("h"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("h")).as("n_hits"))
  }

  /** The clean training corpus: drop every doc with ≥ `minHits` shared
    * shingles (default 1 — any overlap contaminates). One broadcast
    * join + one anti-join; full rows survive.
    */
  def removeContaminated(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      minHits: Long = 1L): DataFrame = {
    val hits = contaminationHits(train, bench, idCol, textCol, n)
      .filter(col("n_hits") >= minHits)
      .select(col(idCol))
    train.join(hits, Seq(idCol), "left_anti")
  }
}
