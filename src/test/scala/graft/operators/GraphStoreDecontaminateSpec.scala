package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** d18 — decontamination against the MAINTAINED graph store, end to
  * end: `createIndex → appendAndMaintain (×3, crossing a compaction) →
  * tombstone victims → vacuum → searchTopKDistributed`, the full
  * production read d17 runs against the in-session memo. The DuckDB
  * oracle cannot see a temp-dir store, so this is the pinned identity
  * twin the r15 verdict prescribed:
  *
  *  - the maintained store's flags EQUAL an identically-appended,
  *    never-maintained store's flags over the same surviving corpus
  *    (maintenance — compaction, the swap, vacuum — is invisible at
  *    the decontamination level, not just at the row-union level);
  *  - the lifecycle genuinely fired (a Compact mid-append-loop, a
  *    Vacuum after the tombstones) — a threshold misconfiguration
  *    degrades this spec to vacuous, so the actions are asserted;
  *  - the snapshot read (`belowBatch`) reproduces a past
  *    decontamination verdict bit-for-bit while the store keeps
  *    growing — the pin-your-eval-set property a training run needs.
  */
class GraphStoreDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val (k, rounds, beam, hops) = (10, 3, 20, 3)
  private val TauMicro = 300000L // d15/d16/d17's τ = 0.30

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("d18-store").toString

  private lazy val vecs = Tables.embeddings(spark, sfDir).cache()
  private lazy val n = vecs.count()
  private lazy val m = (n * 4 / 5).toInt // dense bootstrap prefix 0..m-1
  private lazy val bench = vecs.filter($"vec_id" % 20 === 0)
    .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))

  private def tailBatch(b: Int): DataFrame = {
    val cut = Seq(m, m + (n - m) / 3, m + 2 * (n - m) / 3, n).map(_.toLong)
    vecs.filter($"vec_id" >= cut(b - 1) && $"vec_id" < cut(b))
  }

  /** d17's flag shape over a store probe: qualifying corpus nodes with
    * hit count, best similarity, deterministic argmax bench id.
    */
  private def flags(dir: String, belowBatch: Long = Long.MaxValue): Set[(Long, Long, Long, Long)] = {
    val hits = IncrementalGraphAnn
      .searchTopKDistributed(spark, dir, bench, k, beam, hops, belowBatch)
      .filter($"node" % 20 =!= 0 && $"sim_micro" >= TauMicro)
      .select($"q_id", $"node", $"sim_micro")
    val agg = hits.groupBy($"node")
      .agg(count(lit(1)).as("n_hits"), max($"sim_micro").as("best_micro"))
    agg.join(hits.select($"node", $"sim_micro".as("best_micro"), $"q_id"),
        Seq("node", "best_micro"))
      .groupBy($"node", $"n_hits", $"best_micro")
      .agg(min($"q_id").as("best_bench"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  // ratio disabled and vacuum threshold minimal: Compact fires on
  // segment count alone, Vacuum on ANY committed tombstone bytes
  private val cfg = StorePolicy.Config(
    maxSegments = 2, smallFileRatio = 1.1, vacuumTombstoneBytes = 1L)

  private val victims = Seq(1L, 2L, 3L) // corpus-side (none % 20 == 0)

  test("maintained-store decontamination == never-maintained store, " +
    "through a real compact + vacuum lifecycle") {
    val a = freshDir() // closed-loop maintenance on every append
    val b = freshDir() // same appends, never maintained
    IncrementalGraphAnn.createIndex(
      vecs.filter($"vec_id" < m), a, k, rounds)
    IncrementalGraphAnn.createIndex(
      vecs.filter($"vec_id" < m), b, k, rounds)
    val actions = (1 to 3).map { i =>
      IncrementalGraphAnn.appendBatch(tailBatch(i), b, i.toLong, k, beam, hops)
      IncrementalGraphAnn.appendAndMaintain(
        tailBatch(i), a, i.toLong, k, beam, hops,
        cfg.copy(vacuumTombstoneBytes = 64L * 1024 * 1024))
    }
    // segments after append i on a: {0,1}=2 NoOp; {0,1,2}=3>2 Compact
    // (renumbers to {0}); {0,3}=2 NoOp — the loop genuinely compacted
    assert(actions == Seq(StorePolicy.NoOp, StorePolicy.Compact, StorePolicy.NoOp),
      s"got $actions")

    // erase the victims from BOTH stores; store a additionally vacuums
    // (physical drop + tombstone-segment removal + freed ids)
    Tombstones.append(spark, a, 0L, victims)
    Tombstones.append(spark, b, 0L, victims)
    assert(StorePolicy.maintain(spark, a, IncrementalGraphAnn.layout, cfg)
      == StorePolicy.Vacuum)
    assert(StorePolicy.statsOf(spark, a, cfg).tombstoneBytes == 0L)

    val fa = flags(a)
    val fb = flags(b)
    assert(fa.nonEmpty, "the probe flagged nothing — spec is vacuous")
    assert(fa.map(_._1).intersect(victims.toSet).isEmpty,
      "a vacuumed victim survived into the flags")
    assert(fa == fb,
      s"maintained store flags diverge: ${fa.diff(fb)} vs ${fb.diff(fa)}")
  }

  test("snapshot read reproduces a past decontamination verdict while the store grows") {
    val dir = freshDir()
    IncrementalGraphAnn.createIndex(vecs.filter($"vec_id" < m), dir, k, rounds)
    IncrementalGraphAnn.appendBatch(tailBatch(1), dir, 1L, k, beam, hops)
    val verdictAtBatch2 = flags(dir, belowBatch = 2L)
    IncrementalGraphAnn.appendBatch(tailBatch(2), dir, 2L, k, beam, hops)
    IncrementalGraphAnn.appendBatch(tailBatch(3), dir, 3L, k, beam, hops)
    assert(flags(dir, belowBatch = 2L) == verdictAtBatch2,
      "the snapshot verdict drifted as the store grew")
    // and the live read genuinely sees the growth (not a stale cache)
    val live = IncrementalGraphAnn.vectors(spark, dir).count()
    assert(live == n, s"live store holds $live of $n vectors")
  }
}
