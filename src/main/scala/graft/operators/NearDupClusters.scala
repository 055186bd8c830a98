package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collapse near-duplicate candidate pairs into clusters: connected
  * components by iterative min-label propagation (hash-to-min). Each
  * doc's label converges to the smallest doc id reachable through the
  * pair graph — the canonical representative its cluster keeps.
  *
  * Scale shape: each iteration is one join + one aggregate, both hash
  * partitioned on the node id; iterations needed = graph diameter
  * (near-dup graphs are shallow — boilerplate stars, not long chains).
  * No driver-side graph materialization; the loop's only driver value
  * is the converged-yet count.
  */
object NearDupClusters {

  /** @param pairs DataFrame with two id columns (pair endpoints)
    * @param jumpFromIteration rounds before the pointer-jump shortcut
    *   engages (see loop comment); `Int.MaxValue` disables it
    * @return (doc_id, component) — component = min id of the cluster
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIterations: Int = 20,
      jumpFromIteration: Int = 3): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // undirected edge list, both directions
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .cache()

    // localCheckpoint (not cache): iterative self-joins grow the logical
    // plan every round, and Catalyst re-analysis of the compounding tree
    // blows up long before the data does — checkpointing truncates the
    // lineage to the materialized result each iteration
    var labels = edges.select($"src".as("doc_id")).distinct()
      .withColumn("comp", $"doc_id")
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // Min-label propagation, one neighbor hop per round: each node
      // adopts min(own, neighbors') label. Near-dup graphs are usually
      // shallow stars (boilerplate hubs), so the common case converges
      // in 2–3 rounds and anything fancier just adds per-round jobs —
      // measured: an unconditional pointer jump costs ~40% extra wall
      // time at sf0.1 for zero saved rounds.
      //
      // But a deep component (a CHAIN of near-dups at corpus scale)
      // would need diameter rounds. So if the loop is still running
      // after `jumpFromIteration` rounds — evidence the graph is deep —
      // each further round adds the Shiloach-Vishkin pointer jump
      // (comp := comp(comp)): label distance to the component minimum
      // then roughly halves per round, turning a 100-hop chain's 100
      // rounds into ~$jumpFrom + log2(100). The did-anything-change
      // flag rides along in the same pass either way, so convergence
      // detection is a cheap aggregate over the materialized result.
      val doJump = iter >= jumpFromIteration
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy($"dst".as("doc_id"))
        .agg(min($"comp").as("n_comp"))
      val hopBase = labels
        .join(neighborMin, Seq("doc_id"), "left")
        .select($"doc_id",
          least($"comp", coalesce($"n_comp", $"comp")).as("comp"),
          $"comp".as("prev"))
      var cached: Option[DataFrame] = None
      val next = (if (!doJump) {
        hopBase
      } else {
        // lazily persist so the self-join computes the edges-join
        // aggregate once inside the single checkpoint job
        val hop = hopBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached = Some(hop)
        hop.as("l")
          .join(
            hop.select($"doc_id".as("rep"), $"comp".as("rep_comp")).as("r"),
            col("l.comp") === col("r.rep"), "left")
          .select(col("l.doc_id").as("doc_id"),
            least(col("l.comp"), coalesce(col("r.rep_comp"), col("l.comp"))).as("comp"),
            col("l.prev").as("prev"))
      }).select($"doc_id", $"comp",
          ($"comp" < $"prev").cast("long").as("changed"))
        .localCheckpoint(true)
      val changed = next.agg(coalesce(sum($"changed"), lit(0L))).head().getLong(0)
      cached.foreach(_.unpersist(false))
      labels = next.select($"doc_id", $"comp")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations iterations " +
          "(pair-graph diameter exceeds the budget); raise maxIterations — " +
          "silent non-convergence would split real clusters")
    labels
  }

  /** Dedup by cluster: keep only each cluster's representative (min
    * id); docs not in any pair survive untouched.
    */
  def keepRepresentatives(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    val drop = comps.filter(col("doc_id") =!= col("comp"))
      .select(col("doc_id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Dedup by cluster keeping each cluster's BEST member, not an
    * arbitrary one — the canonical-selection policy production
    * pipelines run after near-dup clustering (drop every duplicate
    * copy except the highest-quality one). Ranking is deterministic:
    * `scoreCol` descending (NULLS LAST), id ascending on ties — so
    * with a constant score this degrades exactly to
    * [[keepRepresentatives]] (min id), which NearDupClustersSpec pins.
    *
    * Scale shape: every frame derived from the pair graph (components,
    * ranked members, losers, winner metadata) is bounded by the LSH
    * candidate set — near-linear in the corpus and broadcastable — so
    * the corpus-sized `docs` is touched by exactly ONE anti-join (drop
    * losers) plus one left join (attach cluster metadata). No
    * corpus-wide window, no corpus shuffle: partitioning the whole
    * corpus by `comp` would shuffle 100 TB to rank the <1% of rows
    * that are clustered.
    *
    * @param docs must carry `idCol` and `scoreCol`
    * @return surviving docs (original schema) + `comp` (cluster
    *   representative id = min member id; own id for singletons) +
    *   `cluster_size` (1 for singletons)
    */
  def keepBest(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      scoreCol: String = "score",
      aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    val clustered = docs.select(col(idCol), col(scoreCol))
      .join(comps.withColumnRenamed("doc_id", idCol), Seq(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
    val ranked = clustered.withColumn("rn", row_number().over(w))
    val losers = ranked.filter(col("rn") > 1).select(col(idCol))
    val sizes = comps.groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"))
    val winners = ranked.filter(col("rn") === 1)
      .select(col(idCol), col("comp"))
      .join(sizes, Seq("comp"))
      .select(col(idCol), col("comp"), col("cluster_size"))
    docs.join(losers, Seq(idCol), "left_anti")
      .join(winners, Seq(idCol), "left")
      .withColumn("comp", coalesce(col("comp"), col(idCol)))
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
  }
}
