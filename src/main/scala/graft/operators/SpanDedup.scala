package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document duplicated-span detection — the exact-substring-dedup
  * family (suffix-array dedup over the concatenated corpus),
  * re-expressed for Spark as rolling n-token span hashing: a span is
  * duplicated iff its 60-bit hash occurs in ≥ 2 distinct documents.
  * Unlike the pairwise ladder (d02/d03), this is corpus-internal and
  * never forms document pairs — it finds verbatim passages (licenses,
  * boilerplate, quoted text) shared by ANY number of documents at the
  * cost of a hash census instead of a suffix array.
  *
  * Scale notes: per-doc distinct spans (one linear pass + one dedup
  * shuffle), a span-hash census with map-side partial aggregation (one
  * shuffle carrying (hash, count) pairs only — a ~1% fraction of corpus
  * bytes at 100 TB), and a hash-partitioned join back onto the span
  * frame. No stage is quadratic in corpus size, and no stage carries
  * document text past the shingling scan.
  */
object SpanDedup {

  /** (id, span-hash) distinct pairs: word n-gram spans of `textCol`
    * hashed to 60 bits (md5 prefix — engine-portable). Distinct BEFORE
    * hashing so the census counts distinct documents per span.
    */
  def docSpanHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), explode(TextDedup.shingles(col(textCol), n)).as("sh"))
      .distinct()
      .select(col(idCol), graft.functions.exprs.token_hash60(col("sh")).as("h"))

  /** Per-document duplicated-span statistics: total distinct spans,
    * spans whose hash occurs in ≥ 2 distinct documents, and the
    * duplicated fraction (round 4). One row per input document.
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    // checkpointed: the census and the join-back both consume it — the
    // explode+distinct subtree must not run twice
    val hashed = docSpanHashes(docs, idCol, textCol, n).localCheckpoint(true)
    val census = hashed.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    hashed
      .join(census, Seq("h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
      .select(col(idCol), col("n_spans"), col("n_dup_spans"),
        round(try_divide(col("n_dup_spans"), col("n_spans")), 4).as("dup_frac"))
  }

  /** Exact-substring SCRUB — the rewrite face of this operator family
    * (Lee et al. 2021, "Deduplicating Training Data Makes Language
    * Models Better": remove the duplicated text itself, not the
    * documents carrying it). Every occurrence of a span whose hash
    * appears in ≥ 2 distinct documents has its token positions
    * dropped; the surviving tokens re-join with single spaces. Output
    * is one row per input document: (id, n_tok, n_removed,
    * kept_text) — kept_text is whitespace-normalized by construction
    * (all docs are rebuilt from their token streams, so scrubbed and
    * untouched documents come back in the same canonical form).
    *
    * Scale shape: the span frame (id, pos, hash) is built by one
    * codegen'd shingle kernel pass and localCheckpointed (census and
    * join-back both consume it); the census shuffles (hash, count)
    * pairs only; covered positions explode ONLY duplicated spans
    * (k rows each) and aggregate to one sorted positions array per
    * affected document — bounded by the duplicated text volume, not
    * the corpus; the rewrite itself is one [[graft.functions
    * .ScrubTokens]] kernel call per document on a doc-id-partitioned
    * left join. No stage carries document text besides the two
    * corpus scans (span build + rewrite).
    *
    * Positions past a short doc's token count (its whole-text span
    * claims `n` slots) are ignored by the kernel, so no clamping
    * stage is needed and n_removed counts real tokens only.
    */
  def scrubSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      minDocs: Int = 2): DataFrame = {
    val id = col(idCol)
    // Spread the corpus FIRST (CLAUDE.md s01/s12 pattern): both heavy
    // passes — the shingle/hash kernel scan below and scrubCore's
    // per-doc kernel rewrite — are map-side on whatever partitioning
    // they inherit, and a single-file local corpus scans 1-2 wide.
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism)
    // (id, pos, h): every span occurrence WITH its start position —
    // unlike spanStats this must keep positions, so the census
    // distinct runs on a projection instead of the frame itself
    val spans = posSpans(spread, idCol, textCol, n).localCheckpoint(true)
    val dupHashes = spans.select(id, col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("h"))
    scrubCore(spread, idCol, textCol, spans, dupHashes, n)
  }

  /** (id, pos, h): every span occurrence with its 0-based start token
    * position — the positions-kept sibling of [[docSpanHashes]].
    */
  private[operators] def posSpans(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextDedup.shingles(col(textCol), n)).as(Seq("pos", "sh")))
      .select(col(idCol), col("pos"),
        graft.functions.exprs.token_hash60(col("sh")).as("h"))

  /** The scrub stage shared by the one-shot [[scrubSpans]] and the
    * incremental [[IncrementalSpanCensus.scrubAgainst]]: given a
    * document frame, its positioned spans and the duplicated-hash set
    * (however derived), drop every covered token position through one
    * `scrub_tokens` kernel call per document.
    */
  private[operators] def scrubCore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spans: DataFrame,
      dupHashes: DataFrame,
      n: Int): DataFrame = {
    val id = col(idCol)
    // covered token positions per doc, sorted for deterministic
    // arrays; collect_set dedups inside the aggregate (with map-side
    // partials), so no separate distinct pass over the exploded frame
    val covered = spans
      .join(dupHashes, Seq("h"))
      .select(id, explode(sequence(col("pos").cast("long"),
        col("pos").cast("long") + lit(n - 1).cast("long"))).as("cp"))
      .groupBy(id)
      .agg(sort_array(collect_set(col("cp"))).as("cps"))
    docs
      .join(covered, Seq(idCol), "left")
      .select(id, graft.functions.exprs.scrub_tokens(
        col(textCol),
        coalesce(col("cps"), typedLit(Array.empty[Long]))).as("sc"))
      .select(id, col("sc.n_tok").as("n_tok"),
        col("sc.n_removed").as("n_removed"),
        col("sc.kept_text").as("kept_text"))
  }

  /** Keep only documents whose duplicated-span fraction is at most
    * `maxDupFrac` (Gopher-style hygiene budget: a doc that is mostly
    * text seen elsewhere in the corpus is dropped wholesale).
    */
  def dropSpanDuplicated(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      maxDupFrac: Double = 0.5): DataFrame = {
    val keep = spanStats(docs, idCol, textCol, n)
      .filter(col("dup_frac") <= maxDupFrac)
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }
}
