package graft.operators

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Streaming decontamination against the maintained graph store —
  * `IncrementalGraphAnn.streamingDecontaminate`, the verdict-r15
  * "streaming face for the distributed graph probe": the store indexes
  * the benchmark set (the dense id prefix, d18's bootstrap
  * convention — createIndex's knnGraph build requires dense ids),
  * corpus batches arrive as a real file stream, every micro-batch
  * probes the store via the DISTRIBUTED beam search and emits
  * per-document contamination flags. Pinned, on the real embeddings
  * table:
  *
  *  - stream over 3 micro-batch splits ≡ the one-shot
  *    [[IncrementalGraphAnn.decontaminateBatch]] over the whole corpus
  *    (flags depend only on a row's own vector + the static store, so
  *    the split must be invisible);
  *  - re-delivery of a batch recomputes bit-identical flags (the read
  *    writes no state — idempotence is structural);
  *  - the flags are REAL: some corpus docs flag at τ = 0.30 and every
  *    flagged doc's best contaminant is a store id.
  */
class StreamingGraphDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val (k, rounds, beam, hops) = (10, 3, 20, 3)
  private val TauMicro = 300000L // the d15/d16/d17 τ = 0.30

  private lazy val vecs = Tables.embeddings(spark, sfDir).cache()
  private lazy val n = vecs.count()
  private lazy val m = (n * 2 / 5).toInt // benchmark = dense prefix 0..m-1
  private lazy val corpusRows = vecs.filter($"vec_id" >= m)
    .select($"vec_id", $"embedding")

  private lazy val storeDir: String = {
    val d = Files.createTempDirectory("sgd-store").toString
    IncrementalGraphAnn.createIndex(vecs.filter($"vec_id" < m), d, k, rounds)
    d
  }

  private def flagSet(df: DataFrame): Set[(Long, Long, Double, Long)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

  test("stream over 3 splits == one-shot batch decontamination on the real table") {
    val inDir = Files.createTempDirectory("sgd-in").toString
    val cut1 = m + (n - m) / 3
    val cut2 = m + 2 * (n - m) / 3
    val splits = Seq(
      corpusRows.filter($"vec_id" < cut1),
      corpusRows.filter($"vec_id" >= cut1 && $"vec_id" < cut2),
      corpusRows.filter($"vec_id" >= cut2))

    val got = mutable.Map.empty[Long, Set[(Long, Long, Double, Long)]]
    splits.head.write.mode("append").parquet(inDir)
    val in = spark.readStream.schema(corpusRows.schema).parquet(inDir)
    val q = IncrementalGraphAnn
      .streamingDecontaminate(in, storeDir, "vec_id", "embedding",
        k, beam, hops, TauMicro) { (flags, id) =>
        // the caller's sink keys on batchId — re-delivery overwrites
        got(id) = flagSet(flags)
      }
      .start()
    q.processAllAvailable()
    splits(1).write.mode("append").parquet(inDir)
    q.processAllAvailable()
    splits(2).write.mode("append").parquet(inDir)
    q.processAllAvailable()
    q.stop()

    val streamed = got.values.flatten.toSet
    val oneShot = flagSet(IncrementalGraphAnn.decontaminateBatch(
      corpusRows, storeDir, "vec_id", "embedding", k, beam, hops, TauMicro))
    assert(oneShot.nonEmpty, "the one-shot probe flagged nothing — spec is vacuous")
    assert(got.size >= 3, s"expected >= 3 micro-batches, saw ${got.size}")
    assert(streamed == oneShot,
      s"stream diverges from batch: ${streamed.diff(oneShot)} vs ${oneShot.diff(streamed)}")
    // flags point INTO the store and never at the corpus side
    assert(oneShot.forall { case (id, _, _, contaminant) =>
      id >= m && contaminant < m
    }, "a flag's doc/contaminant landed on the wrong side of the split")
  }

  test("a re-delivered batch recomputes bit-identical flags") {
    val batch = corpusRows.limit(40)
    def run() = flagSet(IncrementalGraphAnn.decontaminateBatch(
      batch, storeDir, "vec_id", "embedding", k, beam, hops, TauMicro))
    val first = run()
    assert(run() == first, "re-delivery produced different flags")
  }
}
