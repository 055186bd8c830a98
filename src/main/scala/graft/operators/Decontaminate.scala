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

  /** [[contaminationHits]] behind a Bloom prefilter — the sketch-then-
    * verify shape for when the benchmark shingle SET outgrows a
    * broadcast (a 10⁹-shingle eval suite is ~8 GB exact but ~1.2 GB as
    * a 1% Bloom filter): the corpus shingle stream is pruned by a
    * broadcast Bloom probe (Spark's native codegen'd
    * `BloomFilterMightContain` — no UDF in the hot path), and only the
    * ~fpp surviving fraction reaches the exact equi-join. False
    * positives cost one extra join row each and are then discarded by
    * the exact match, so the result is IDENTICAL to the unfiltered
    * path at any fpp (DecontaminateSpec pins equivalence at fpp 0.5).
    */
  def contaminationHitsBloom(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftshim.SparkShims
    import org.apache.spark.sql.types.BinaryType
    val benchSet = shingleHashes(bench, idCol, textCol, n)
      .select(col("h")).distinct().localCheckpoint(true)
    // the bench side is metadata-scale: counting it and folding it into
    // a filter are executor aggregations over the tiny side only
    val bf = benchSet.stat.bloomFilter("h", math.max(benchSet.count(), 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = SparkShims.column(BloomFilterMightContain(
      Literal(bytes, BinaryType), SparkShims.expression(col("h"))))
    shingleHashes(train, idCol, textCol, n)
      .filter(mightContain)
      .join(benchSet, Seq("h"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("h")).as("n_hits"))
  }

  /** [[removeContaminated]] over the Bloom-prefiltered hits — same
    * output, corpus-side join input shrunk to ~fpp of the stream.
    */
  def removeContaminatedBloom(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      minHits: Long = 1L,
      fpp: Double = 0.01): DataFrame = {
    val hits = contaminationHitsBloom(train, bench, idCol, textCol, n, fpp)
      .filter(col("n_hits") >= minHits)
      .select(col(idCol))
    train.join(hits, Seq(idCol), "left_anti")
  }

  /** SEMANTIC contamination evidence — the face n-gram overlap misses:
    * an eval item paraphrased/translated into the training corpus
    * shares no shingles with the benchmark but sits next to it in
    * embedding space. Published decontamination pipelines pair the
    * exact n-gram rule with exactly this cosine-threshold check
    * ("semantic contamination" in recent eval-hygiene literature).
    *
    * For each training vector with ≥ 1 benchmark neighbor at rounded
    * cosine ≥ `tau`: the count of such neighbors (`n_hits`), the best
    * similarity (`best_cos`, 4 dp), and the smallest benchmark id
    * achieving it (`best_bench` — the deterministic tie-break).
    *
    * Scale shape, same argument as [[contaminationHits]]: the
    * benchmark side is model-sized (eval suites are thousands of
    * items) so it rides as ONE broadcast and the corpus is a single
    * linear scan — a declared broadcast nested-loop over the tiny
    * side, s01's exact-scoring shape, NOT a corpus×corpus product.
    * Only the matching pairs (typically a small fraction) reach the
    * per-doc aggregate; the corpus never shuffles. At larger benchmark
    * sets the broadcast swaps for an IVF/LSH candidate stage (s02/s04)
    * with this method as the verify step.
    *
    * `hits` is localCheckpoint'd: the argmax resolution re-reads it
    * (match-scale, not corpus-scale) instead of re-running the scan.
    */
  def semanticHits(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double): DataFrame = {
    import graft.functions.VectorFunctions.{dot, l2Norm}
    val b = broadcast(bench.select(
      col(idCol).as("bench_id"),
      col(vecCol).as("bvec"),
      l2Norm(col(vecCol)).as("bnrm")))
    val c = corpus.select(
      col(idCol), col(vecCol).as("cvec"), l2Norm(col(vecCol)).as("cnrm"))
    val hits = c.crossJoin(b)
      .select(col(idCol), col("bench_id"),
        round(try_divide(dot(col("cvec"), col("bvec")),
          col("cnrm") * col("bnrm")), 4).as("cos"))
      .filter(col("cos") >= tau)
      .localCheckpoint(true)
    resolveHits(hits, idCol)
  }

  /** (id, bench_id, cos) match stream → per-doc evidence row
    * (id, n_hits, best_cos, best_bench) with the deterministic
    * min-bench-id argmax — the resolution stage shared by the exact
    * ([[semanticHits]]) and IVF-blocked ([[semanticHitsIvf]]) screens.
    * Callers checkpoint `hits` first: it is match-scale, and this
    * resolution reads it twice.
    */
  private def resolveHits(hits: DataFrame, idCol: String): DataFrame = {
    val agg = hits.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), max(col("cos")).as("best_cos"))
    agg.join(hits.withColumnRenamed("cos", "best_cos"),
        Seq(idCol, "best_cos"))
      .groupBy(col(idCol), col("n_hits"), col("best_cos"))
      .agg(min(col("bench_id")).as("best_bench"))
      .select(col(idCol), col("n_hits"), col("best_cos"), col("best_bench"))
  }

  /** IVF-BLOCKED semantic contamination evidence — the swap
    * [[semanticHits]]'s Scaladoc promises for when the benchmark
    * outgrows a single broadcast-scan product: both sides are
    * coarse-quantized against a shared deterministic centroid set
    * (s02's cells — max rounded-6 cosine, cell-id tie-break, zero
    * vectors to cell 0), each benchmark item probes its `nprobe`
    * nearest cells, and the exact 4-dp cosine screen runs ONLY inside
    * probed cells. The corpus side is one zero-shuffle kernel argmax
    * (`coarse_assign_cell`) plus one broadcast EQUI-join on the cell
    * id — the declared nested-loop product over the whole benchmark
    * is gone; work scales with cell co-occupancy, not
    * |corpus|×|bench|. Recall < 1 by design (a qualifying pair whose
    * corpus cell is outside the benchmark item's probe list is
    * unseen); `IvfDecontaminateSpec` pins the flagged set as a subset
    * of the exact screen's and its measured recall floor.
    *
    * Probe selection runs distributed over the benchmark frame (the
    * benchmark here is a corpus SPLIT, not a driver-sized constant —
    * s02's driver-side probe loop would collect it): the per-centroid
    * rounded cosines enter the plan as `nCells` literal subtrees and
    * a per-bench-item window ranks them — sim DESC NULLS LAST, cell
    * ASC, exactly the kernel's tie-break, so a zero benchmark vector
    * probes cells 0..nprobe-1 on both engines.
    *
    * Broadcast budget: the probe frame carries the full benchmark
    * vectors, so the broadcast is nprobe × |bench| × (dim × 4 B +
    * ~24 B) — at nprobe 8, dim 768, a 1 M-item benchmark is ~25 GB
    * and does NOT fit. The bound is what this operator is sized for:
    * benchmark suites are split-sized (10³–10⁶ rows; at 10⁵ ×
    * nprobe 8 × dim 64 the probe frame is ~0.2 GB, inside Spark's 8 GB
    * broadcast ceiling with default driver memory the binding limit).
    * Past it, drop the `broadcast()` hint and let the cell-id
    * equi-join shuffle BOTH sides on c_id — same semantics, same
    * output, one extra corpus-side exchange (hash on the already
    * computed cell id), which is exactly the fallback a planner with
    * statistics would pick on its own.
    */
  def semanticHitsIvf(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      cents: Array[Array[Float]],
      nprobe: Int): DataFrame =
    resolveHits(
      semanticHitsIvfFrame(corpus, bench, idCol, vecCol, tau, cents, nprobe)
        .localCheckpoint(true),
      idCol)

  /** [[semanticHitsIvf]]'s hit frame BEFORE the checkpoint — exposed
    * so IvfDecontaminateSpec can pin that the probe join is a
    * broadcast hash equi-join on the cell id (the plan property the
    * checkpoint otherwise hides).
    */
  private[graft] def semanticHitsIvfFrame(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      tau: Double,
      cents: Array[Array[Float]],
      nprobe: Int): DataFrame = {
    import graft.functions.VectorFunctions.{cosineSimilarity, dot, l2Norm}
    val assigned = corpus.select(
      col(idCol), col(vecCol).as("cvec"), l2Norm(col(vecCol)).as("cnrm"),
      graft.functions.exprs.coarse_assign_cell(col(vecCol), cents).as("c_id"))
    val sims = array(cents.map { cvec =>
      round(cosineSimilarity(col(vecCol), typedLit(cvec)), 6)
    }: _*)
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bench_id"))
      .orderBy(col("p_sim").desc_nulls_last, col("c_id").asc)
    val probes = bench
      .select(col(idCol).as("bench_id"), col(vecCol).as("bvec"),
        l2Norm(col(vecCol)).as("bnrm"), posexplode(sims).as(Seq("c_id", "p_sim")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("bench_id"), col("bvec"), col("bnrm"), col("c_id").cast("long"))
    assigned.join(broadcast(probes), Seq("c_id"))
      .select(col(idCol), col("bench_id"),
        round(try_divide(dot(col("cvec"), col("bvec")),
          col("cnrm") * col("bnrm")), 4).as("cos"))
      .filter(col("cos") >= tau)
  }
}
