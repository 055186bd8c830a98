package graft.tools

import graft.queries.Registry

/** Audit for guide §1.4's count-pruning hazard in graft.Bench: the
  * bench times `q.run(...).count()`, and Catalyst may prune columns —
  * including aggregate expressions and the kernels feeding them — that
  * the count does not need, timing a plan cheaper than the query. For
  * every headline query this prints the heavy-operator census
  * (scans/exchanges/joins/aggregates/generates/windows) of the plan
  * `count()` actually executes next to the full query plan; a query
  * whose count-plan lost heavy operators is being under-timed.
  *
  * Usage: runMain graft.tools.CountPruneAudit [sfDir]
  */
object CountPruneAudit {
  private val Heavy = Seq("Scan parquet", "Exchange", "HashAggregate",
    "ObjectHashAggregate", "SortMergeJoin", "BroadcastHashJoin",
    "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
    "Generate", "Window", "Sort ")

  private def census(plan: String): Map[String, Int] =
    Heavy.map(h => h -> plan.sliding(h.length).count(_ == h)).toMap

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.core.GraftSession.local(appName = "count-prune-audit")
    graft.plans.GraftExtensions.install(spark)
    var flagged = 0
    Registry.headline.foreach { q =>
      val df = q.run(spark, sfDir)
      val full = census(df.queryExecution.executedPlan.toString)
      val cnt = census(df.groupBy().count().queryExecution.executedPlan.toString)
      val lost = Heavy.filter(h => cnt(h) < full(h))
        .map(h => s"$h ${full(h)}->${cnt(h)}")
      if (lost.nonEmpty) {
        flagged += 1
        println(s"[count-prune] ${q.name}: ${lost.mkString(", ")}")
      }
    }
    println(s"[count-prune] flagged $flagged of ${Registry.headline.size} headliners")
    spark.stop()
  }
}
