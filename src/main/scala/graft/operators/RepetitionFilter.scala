package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Intra-document repetition filter — the published Gopher /
  * RefinedWeb quality heuristics over token n-grams: documents that
  * loop or carry boilerplate repeat WITHIN themselves, which the
  * cross-document dedup ladder (TextDedup) never sees. Backs the
  * oracle-checked `t13_repetition` query.
  *
  * Scale shape: the statistic never leaves its row, so the whole
  * computation is ONE zero-shuffle projection on the codegen'd
  * `ngram_rep_stats` kernel — no explode, no aggregation, no join.
  * (RepetitionFilterSpec pins kernel == the declarative
  * explode-groupBy-join reference, kept below as
  * [[repetitionStatsViaAggregation]].)
  */
object RepetitionFilter {

  /** Per-doc repetition stats: `top2gram_frac` = tokens covered by the
    * most frequent 2-gram (2·max-count / tokens; exceeds 1 for
    * overlapping runs — the standard form) and `dup5gram_frac` =
    * fraction of 5-gram positions whose 5-gram occurs more than once.
    *
    * NULL-text rows are dropped, matching the explode-based reference
    * (and the DuckDB oracle's unnest), where they produce no gram rows.
    * `idCol` is expected unique per row (the documents-table contract):
    * stats are per ROW, while the aggregation reference would pool
    * grams across rows sharing an id.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"),
        graft.functions.exprs.ngram_rep_stats(col(textCol), 2).as("s2"),
        graft.functions.exprs.ngram_rep_stats(col(textCol), 5).as("s5"))
      .select(col(idCol),
        round(try_divide(lit(2.0) * col("s2").getItem(0), col("n_tok")), 4)
          .as("top2gram_frac"),
        round(try_divide(col("s5").getItem(1), col("s5").getItem(2)), 4)
          .as("dup5gram_frac"))

  /** Declarative reference implementation — the corpus-wide
    * (doc, gram) explode + two aggregations + three-way join the
    * kernel replaces (same results, two shuffles of the full n-gram
    * stream). Kept for the equivalence spec, the same role
    * `TextDedup.shinglesFold` plays for the shingle kernel.
    */
  private[operators] def repetitionStatsViaAggregation(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tok"))
    def gramCounts(n: Int) = docs
      .select(col(idCol), explode(TextDedup.shingles(col(textCol), n)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
    val top2 = gramCounts(2).groupBy(col(idCol)).agg(max(col("c")).as("top2"))
    val dup5 = gramCounts(5).groupBy(col(idCol)).agg(
      sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_pos"),
      sum(col("c")).as("n_pos"))
    toks.join(top2, idCol).join(dup5, idCol)
      .select(col(idCol),
        round(try_divide(lit(2.0) * col("top2"), col("n_tok")), 4).as("top2gram_frac"),
        round(try_divide(col("dup_pos"), col("n_pos")), 4).as("dup5gram_frac"))
  }

  /** Keep only docs below both repetition bounds (defaults are the
    * published removal thresholds). Full rows survive via anti-join.
    */
  def dropRepetitive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxTop2: Double = 0.2,
      maxDup5: Double = 0.3): DataFrame = {
    val bad = repetitionStats(docs, idCol, textCol)
      .filter(col("top2gram_frac") > maxTop2 || col("dup5gram_frac") > maxDup5)
      .select(col(idCol))
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
