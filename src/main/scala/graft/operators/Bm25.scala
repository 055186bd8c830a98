package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The BM25 scoring stage, factored out of s12 so the one-shot query
  * and the incremental index ([[IncrementalIndex]]) score through the
  * SAME code path — the stream ≡ batch equivalence is then a property
  * of the index contents, not of two scoring implementations agreeing.
  *
  * Arithmetic is the s12 determinism contract verbatim: per-(query,
  * term, doc) contributions quantized to integer micros with
  * floor(x + 0.5) (no per-row BigDecimal), bigint sums, 4-dp half-up
  * in integer arithmetic, ranking on the rounded score with a doc_id
  * tie-break. See SimilarityQueries.s12Bm25 for the full rationale
  * and the DuckDB replay.
  */
object Bm25 {

  /** Compute-once shared lexical ranking, keyed by (session, corpus
    * tag). The first caller builds the ranked frame and
    * `localCheckpoint`s it eagerly — it is |queries| × k rows, i.e.
    * model-sized at any corpus scale — and every later consumer in the
    * same session reads the materialized blocks instead of re-running
    * the full posting/scoring pipeline. This is the production shape a
    * hybrid-retrieval stack has anyway: the lexical ranking is
    * computed once and SHARED by every fusion/reranker downstream
    * (s14), while s12 — the measurement of the lexical pipeline
    * itself — deliberately does NOT read this memo.
    */
  private val shared = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), DataFrame]()

  def sharedRanked(spark: org.apache.spark.sql.SparkSession, tag: String)(
      build: => DataFrame): DataFrame =
    shared.computeIfAbsent((spark, tag), _ => build.localCheckpoint(true))

  /** Drop this session's shared rankings (test isolation). */
  def clearShared(spark: org.apache.spark.sql.SparkSession): Unit = {
    val it = shared.keySet().iterator()
    while (it.hasNext) if (it.next()._1 eq spark) it.remove()
  }

  /** Top-k BM25 per query over a posting-list frame.
    *
    * @param tf postings carrying document length: (doc_id, dl, term, tf)
    * @param qt query terms: (query_id, term), unique per (query, term)
    * @param stats ONE-row frame (n_docs, s_tok) — attached by
    *   broadcast cross-join (the X10 pattern), so corpus stats never
    *   become eager driver scalars and the whole plan stays one action
    * @param k neighbors kept per query
    */
  def scoreTopK(tf: DataFrame, qt: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    // df census restricted to the query vocabulary -> broadcastable;
    // the posting lists are never shuffled by term
    val dfreq = tf
      .join(broadcast(qt.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tff = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) +
        (lit(0.75) * col("dl") * col("n_docs")) / col("s_tok")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(dfreq), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .filter(col("doc_id") =!= col("query_id"))
      // floor(x + 0.5), NOT round(x, 0): same half-up for the
      // strictly-positive contributions, without a BigDecimal per row
      .select(col("query_id"), col("doc_id"),
        floor(idf * tff * lit(1000000.0) + lit(0.5)).cast("long").as("c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("sum_c"))
      // 4-dp half-up entirely in bigint arithmetic, then ONE exact
      // integer / 1e4 division
      .select(col("query_id"), col("doc_id"),
        (expr("(sum_c + 50) div 100") / lit(10000.0)).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}
