package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-stage invariants of pipe02 (the pretraining-data manifest)
  * that the value-hash oracle can't express as structure: coverage,
  * null discipline across the stage boundaries, the leakage guarantee
  * (near-dup families never straddle splits — the reason the split
  * keys on cluster ids), selection monotonicity, and the packing
  * contract over the shuffled order. Runs on the real documents table
  * at the spec SF; the exact values are the DuckDB oracle's job.
  */
class Pipe02Spec extends SparkSpec {
  import spark.implicits._

  // sf0.1, not the default sf0.001: the mixture gate only bites once
  // per-source token censuses exceed the budget, and the cluster stage
  // only produces MULTI-doc clusters where est_sim ≥ 0.5 pairs survive
  // the 0.8 near-dedup — jointly infeasible for deterministic planted
  // text (a pair sharing ≥ 2/3 of its shingles to clear est 0.5 always
  // trips the 0.5 span budget first; survivors are minhash-variance
  // boundary cases), and empirically present only at sf0.1 (2 clusters)
  override def sfDir: String = "/root/testdata/sf0.1"

  private lazy val manifest =
    Registry.byName("pipe02_manifest").run(spark, sfDir).cache()

  test("one manifest row per working-corpus doc; disposition null discipline") {
    val corpCount = graft.core.Tables.documents(spark, sfDir)
      .filter($"doc_id" % 37 =!= 0).count()
    assert(manifest.count() == corpCount)
    assert(manifest.select($"doc_id").distinct().count() == corpCount)
    // dropped docs carry NOTHING downstream; kept docs always have a
    // split and a token count
    val dropped = manifest.filter($"dropped_at" =!= "kept")
    assert(dropped.count() > 0, "ladder dropped nothing — spec is vacuous")
    assert(dropped.filter($"split".isNotNull || $"selected".isNotNull ||
      $"tok".isNotNull || $"shard".isNotNull).count() == 0)
    val kept = manifest.filter($"dropped_at" === "kept")
    assert(kept.count() > 0)
    assert(kept.filter($"split".isNull || $"tok".isNull).count() == 0)
  }

  test("leakage guarantee: every near-dup cluster lands on ONE side of the split") {
    // structural form: all members of a cluster share a split (the
    // whole reason the split hashes cluster_id, not doc_id) ...
    val multi = manifest.filter($"dropped_at" === "kept")
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n"), countDistinct($"split").as("n_splits"))
      .filter($"n" >= 2)
    assert(multi.count() > 0,
      "no multi-doc near-dup cluster at this SF — leakage pin is vacuous")
    assert(multi.filter($"n_splits" =!= 1).count() == 0,
      "a near-dup cluster straddles train/val/test")
    // ... and the pair form re-derived from the operators: candidates
    // at est_sim >= 0.5 over the kept set never straddle
    val ladderKept = manifest.filter($"dropped_at" === "kept").select($"doc_id")
    val docs = graft.core.Tables.documents(spark, sfDir)
      .filter($"doc_id" % 37 =!= 0)
      .select($"doc_id", graft.functions.exprs.normalize_text($"text").as("text"))
      .join(ladderKept, Seq("doc_id"))
    val pairs = graft.operators.TextDedup
      .minhashCandidates(docs, "doc_id", "text")
      .filter($"est_sim" >= 0.5)
    val sides = manifest.select($"doc_id", $"split")
    val straddling = pairs
      .join(sides.select($"doc_id".as("doc_a"), $"split".as("split_a")), Seq("doc_a"))
      .join(sides.select($"doc_id".as("doc_b"), $"split".as("split_b")), Seq("doc_b"))
      .filter($"split_a" =!= $"split_b")
    assert(straddling.count() == 0, "a near-dup pair straddles train/val/test")
  }

  test("selection and packing discipline: val/test always selected; " +
    "exactly the selected train docs are sharded and packed, fills bounded") {
    assert(manifest.filter($"split".isin("val", "test") && !$"selected").count() == 0)
    val train = manifest.filter($"split" === "train")
    assert(train.filter($"selected").count() > 0, "gate selected nothing")
    assert(train.filter(!$"selected").count() > 0, "gate dropped nothing")
    // (shard, pos, bin_id) present iff selected train
    val packedRows = manifest.filter($"shard".isNotNull)
    assert(packedRows.filter($"split" =!= "train" || !$"selected").count() == 0)
    assert(train.filter($"selected" && ($"shard".isNull || $"pos".isNull ||
      $"bin_id".isNull)).count() == 0)
    // positions dense per shard; bins bounded by capacity or singleton
    packedRows.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"), countDistinct($"pos").as("nd"))
      .collect()
      .foreach(r => assert(r.getLong(1) == r.getLong(2) && r.getLong(2) == r.getLong(3),
        s"shard ${r.get(0)}: positions not dense"))
    packedRows.groupBy($"shard", $"bin_id")
      .agg(sum($"tok").as("fill"), count(lit(1)).as("n"))
      .collect()
      .foreach { r =>
        assert(r.getLong(2) <= 512 || r.getLong(3) == 1,
          s"bin ${r.get(0)}/${r.get(1)} overfilled: ${r.getLong(2)} tokens")
      }
  }
}
