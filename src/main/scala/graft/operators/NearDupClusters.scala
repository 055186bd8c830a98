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
    * @return (doc_id, component) — component = min id of the cluster
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      maxIterations: Int = 20): DataFrame = {
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
      // (min-label propagation advances one hop per iteration — the
      // iteration count needed equals the pair-graph diameter)
      // each node adopts min(own label, neighbors' labels); the
      // did-anything-change flag rides along in the SAME pass, so the
      // convergence check is a cheap aggregate over the materialized
      // checkpoint instead of a second shuffle join per iteration
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "src"), "src")
        .groupBy($"dst".as("doc_id"))
        .agg(min($"comp").as("n_comp"))
      val next = labels
        .join(neighborMin, Seq("doc_id"), "left")
        .select($"doc_id",
          least($"comp", coalesce($"n_comp", $"comp")).as("comp"),
          ($"n_comp".isNotNull && $"n_comp" < $"comp").cast("long").as("changed"))
        .localCheckpoint(true)
      val changed = next.agg(coalesce(sum($"changed"), lit(0L))).head().getLong(0)
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
}
