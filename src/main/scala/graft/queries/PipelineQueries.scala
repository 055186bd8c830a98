package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** End-to-end pipeline compositions measured AS pipelines — the way
  * the 100 TB job actually runs. Per-query benchmarks measure each
  * operator in isolation; these entries measure the cross-stage costs
  * (checkpoint placement, shuffle reuse, stage overlap) that only
  * appear when the stages are chained.
  */
object PipelineQueries {

  /** pipe01: the full data-hygiene ladder HygieneLadderSpec proves
    * correct on a planted corpus, run end-to-end on the real
    * `documents` table and measured as ONE job —
    *
    *   normalize → exact dedup → near dedup (est_sim ≥ 0.8)
    *     → span budget (dup_frac ≤ 0.5) → decontaminate (vs the
    *   doc_id % 37 = 0 benchmark split, d08's convention)
    *     → repetition gate → quality gate (t03 score ≥ 0.64)
    *
    * Output is the per-document DISPOSITION: `dropped_at` names the
    * FIRST stage that dropped each document ('kept' for survivors), so
    * the oracle hash pins every stage's exact victim set, not just
    * survivor counts. Thresholds are the operators' defaults except
    * the quality gate (0.64 ≈ the corpus's 25th percentile — a gate
    * that drops nothing measures nothing).
    *
    * Scale shape: each stage is its own operator's documented shape
    * (content-hash census, banded LSH, span census, broadcast
    * benchmark probe, zero-shuffle kernels); the ladder adds only
    * doc_id-keyed semi/anti joins between stages, and the final
    * disposition is a chain of doc_id-keyed left joins over id-only
    * frames. The corpus repartitions ONCE at the top (the s01/s12
    * single-row-group spread); every stage inherits that width.
    *
    * Stage-set note (why the oracle can be a flat CTE chain): a doc's
    * minhash signature, span set, shingle set and scores depend only
    * on its OWN text, so each stage's per-doc state is computable on
    * the full corpus and then restricted to that stage's input set —
    * except the SPAN CENSUS and near-dup CANDIDATE PAIRS, which
    * depend on the surviving SET and are therefore computed over the
    * stage's input CTE (s1/s2) exactly as the operators do.
    */
  val pipe01HygieneLadder = Q(
    "pipe01_hygiene_ladder",
    (s, dir) => {
      import s.implicits._
      import graft.operators._
      val docs = Tables.documents(s, dir)
      val norm = graft.functions.exprs.normalize_text($"text")
      val bench = docs.filter($"doc_id" % 37 === 0)
        .select($"doc_id", norm.as("text"))
      val corp = docs.filter($"doc_id" % 37 =!= 0)
        .select($"doc_id", norm.as("text"))
        .repartition(s.sparkContext.defaultParallelism)
      val s1 = TextDedup.exactDedup(corp, "doc_id", "text")
      val s2 = TextDedup.dropNearDuplicates(s1, "doc_id", "text", threshold = 0.8)
      val s3 = SpanDedup.dropSpanDuplicated(s2, "doc_id", "text", n = 5, maxDupFrac = 0.5)
      val s4 = Decontaminate.removeContaminatedBloom(s3, bench, "doc_id", "text")
      val s5 = RepetitionFilter.dropRepetitive(s4, "doc_id", "text")
      val s6 = s5.filter(
        graft.functions.TextFunctions.qualityScore($"text") >= 0.64)
      def mark(df: DataFrame, m: String) =
        df.select($"doc_id", lit(1).as(m))
      corp.select($"doc_id")
        .join(mark(s1, "m1"), Seq("doc_id"), "left")
        .join(mark(s2, "m2"), Seq("doc_id"), "left")
        .join(mark(s3, "m3"), Seq("doc_id"), "left")
        .join(mark(s4, "m4"), Seq("doc_id"), "left")
        .join(mark(s5, "m5"), Seq("doc_id"), "left")
        .join(mark(s6, "m6"), Seq("doc_id"), "left")
        .select($"doc_id",
          when($"m1".isNull, "exact")
            .when($"m2".isNull, "near")
            .when($"m3".isNull, "span")
            .when($"m4".isNull, "decontaminate")
            .when($"m5".isNull, "repetition")
            .when($"m6".isNull, "quality")
            .otherwise("kept").as("dropped_at"))
    },
    Some {
      val q = graft.functions.TextFunctions.qualityScoreSql
      val w = graft.functions.TextFunctions.wsTokensSql
      s"""WITH corp AS MATERIALIZED (
        SELECT doc_id,
          trim(regexp_replace(regexp_replace(nfc_normalize(text),
            '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f\\x{200b}-\\x{200f}\\x{2060}\\x{feff}]', '', 'g'),
            '[\\t\\n\\r \\p{Zs}]+', ' ', 'g'), ' ') AS text
        FROM documents WHERE doc_id % 37 <> 0),
      benchd AS MATERIALIZED (
        SELECT doc_id,
          trim(regexp_replace(regexp_replace(nfc_normalize(text),
            '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f\\x{200b}-\\x{200f}\\x{2060}\\x{feff}]', '', 'g'),
            '[\\t\\n\\r \\p{Zs}]+', ' ', 'g'), ' ') AS text
        FROM documents WHERE doc_id % 37 = 0),
      -- stage 1: exact dedup (keep min doc_id per content hash)
      s1 AS MATERIALIZED (
        SELECT c.* FROM corp c JOIN (
          SELECT min(doc_id) AS doc_id FROM corp GROUP BY md5(text)) k
          USING (doc_id)),
      -- stage 2: near dedup — candidates + est_sim over the s1 set
      ${DedupQueries.lshCandSql("s1")},
      est AS (
        SELECT c.doc_a, c.doc_b,
          round(sum(CASE WHEN ma.mv = mb.mv THEN 1 ELSE 0 END)
            / ${graft.operators.TextDedup.NumHashes}.0, 4) AS est_sim
        FROM cand c
        JOIN mh ma ON ma.doc_id = c.doc_a
        JOIN mh mb ON mb.doc_id = c.doc_b AND ma.i = mb.i
        GROUP BY c.doc_a, c.doc_b),
      s2 AS MATERIALIZED (
        SELECT * FROM s1 WHERE doc_id NOT IN (
          SELECT DISTINCT doc_b FROM est WHERE est_sim >= 0.8)),
      -- stage 3: span budget — census over the s2 set
      sp3 AS (
        SELECT DISTINCT doc_id,
          CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(${DedupQueries.shinglesSql(5)}) AS sh FROM s2)),
      census3 AS (SELECT h, count(*) AS nd FROM sp3 GROUP BY h),
      dupfrac AS (
        SELECT s.doc_id,
          round(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) / count(*), 4) AS dup_frac
        FROM sp3 s JOIN census3 c USING (h) GROUP BY s.doc_id),
      s3 AS MATERIALIZED (
        SELECT s2.* FROM s2 JOIN dupfrac USING (doc_id) WHERE dup_frac <= 0.5),
      -- stage 4: decontaminate vs the benchmark shingle-hash set
      bsh AS (
        SELECT DISTINCT CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
        FROM (SELECT unnest(${DedupQueries.shinglesSql(5)}) AS sh FROM benchd)),
      hit4 AS (
        SELECT DISTINCT t.doc_id FROM (
          SELECT DISTINCT doc_id,
            CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
          FROM (SELECT doc_id, unnest(${DedupQueries.shinglesSql(5)}) AS sh FROM s3)) t
        JOIN bsh b ON b.h = t.h),
      s4 AS MATERIALIZED (
        SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM hit4)),
      -- stage 5: repetition gate (t13's stats, operator thresholds)
      toks5 AS (SELECT doc_id, CAST(len($w) AS BIGINT) AS n_tok FROM s4),
      g2 AS (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(${DedupQueries.shinglesSql(2)}) AS g FROM s4)
        GROUP BY doc_id, g),
      top2 AS (SELECT doc_id, max(c) AS top2 FROM g2 GROUP BY doc_id),
      g5 AS (
        SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(${DedupQueries.shinglesSql(5)}) AS g FROM s4)
        GROUP BY doc_id, g),
      dup5 AS (
        SELECT doc_id,
          sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_pos, sum(c) AS n_pos
        FROM g5 GROUP BY doc_id),
      rep AS (
        SELECT t.doc_id FROM toks5 t
        JOIN top2 USING (doc_id) JOIN dup5 USING (doc_id)
        WHERE round(2.0 * top2 / n_tok, 4) > 0.2
           OR round(dup_pos / n_pos, 4) > 0.3),
      s5 AS MATERIALIZED (
        SELECT * FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM rep)),
      -- stage 6: quality gate
      s6 AS MATERIALIZED (SELECT * FROM s5 WHERE $q >= 0.64)
      SELECT c.doc_id,
        CASE WHEN s1.doc_id IS NULL THEN 'exact'
             WHEN s2.doc_id IS NULL THEN 'near'
             WHEN s3.doc_id IS NULL THEN 'span'
             WHEN s4.doc_id IS NULL THEN 'decontaminate'
             WHEN s5.doc_id IS NULL THEN 'repetition'
             WHEN s6.doc_id IS NULL THEN 'quality'
             ELSE 'kept' END AS dropped_at
      FROM corp c
      LEFT JOIN s1 ON s1.doc_id = c.doc_id
      LEFT JOIN s2 ON s2.doc_id = c.doc_id
      LEFT JOIN s3 ON s3.doc_id = c.doc_id
      LEFT JOIN s4 ON s4.doc_id = c.doc_id
      LEFT JOIN s5 ON s5.doc_id = c.doc_id
      LEFT JOIN s6 ON s6.doc_id = c.doc_id"""
    },
    headline = true)

  val all: Seq[Q] = Seq(pipe01HygieneLadder)
}
