package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: the Spark-side definition plus (where the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL the
  * driver runs as correctness oracle. Column names/aliases MUST match
  * between the two sides — the compare sorts columns by name.
  *
  * `headline = true` marks queries included in the Bench run (scale-safe
  * at sf0.1 and representative of the engine's hot paths).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Full inventory of oracle-checked queries. Each maps to one or more
  * rows of SURVEY.md §2's operator inventory; Scaladoc on each query
  * cites the reference operator(s) it re-expresses.
  */
object Registry {
  lazy val all: Seq[Q] =
    RelationalQueries.all ++ EventQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ ExtendedQueries.all ++
      AnalyticQueries.all ++ MultimodalQueries.all ++ PipelineQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  lazy val headline: Seq[Q] = all.filter(_.headline)
}
