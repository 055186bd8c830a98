package graft

import graft.core.GraftSession
import graft.queries.Registry

/** Plan-audit CLI: print the formatted physical plan of one or more
  * registry queries (pushdown, broadcast, codegen spans) and time the
  * execution.
  *
  * Usage: runMain graft.Explain <query|all> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty || args(0) == "all") Registry.all.map(_.name)
      else args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"

    val spark = GraftSession.local(appName = "graft-explain")
    graft.plans.GraftExtensions.install(spark) // audit the plans the gate actually runs
    names.foreach { name =>
      val q = Registry.byName(name)
      println(s"========== $name ==========")
      val df = q.run(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
