package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank (Mihalcea & Tarau 2004): PageRank over the token
  * co-occurrence graph — the classic unsupervised keyword/salience
  * scorer, and the same iteration shape as link-graph centrality
  * scoring over a web corpus (the quality signal web-scale pretraining
  * sets like RefinedWeb/FineWeb derive from their crawl graphs).
  *
  * Scale shape: the EDGE CENSUS is the only corpus-sized work — one
  * linear pass exploding adjacent-token pairs, then a groupBy on the
  * pair. Everything after runs on the vocabulary-sized graph: the
  * edge list, out-weights, and node set are materialized once
  * (`localCheckpoint` — each is consumed by every iteration), and
  * each PageRank round is one vocab-sized join + partial-aggregating
  * groupBy + left join. The driver never sees the graph; rank state
  * stays a DataFrame, lineage truncated per round (the d06
  * min-label-propagation pattern, without which the plan tree doubles
  * every iteration).
  *
  * Determinism contract: rank is carried as BIGINT MICRO-units. Each
  * per-edge contribution does its FP ops (weight/out-weight division,
  * damping multiply) in the same left-associative order both engines
  * use, rounds to an integer, and the per-node reduce is then an
  * exact bigint sum — summation-order-free across any partitioning,
  * and bit-replayable by the DuckDB oracle's unrolled CTE chain.
  *
  * Reference: text analysis over `documents` (SURVEY §2 extension
  * track); damping 0.85 and the (1-d) + d·Σ w·pr/outw update are the
  * published TextRank form (eq. 2 of the paper, weighted variant).
  */
object TextRank {

  val Damping = 0.85
  val Iters = 10
  private val Micro = 1000000L

  /** Per-term TextRank over adjacent-token co-occurrence: returns
    * (term, prm BIGINT micro-rank, pr rounded double).
    */
  def ranks(
      docs: DataFrame,
      textCol: String,
      iters: Int = Iters): DataFrame = {
    val bg = docs
      .select(explode(TextDedup.shingles(col(textCol), 2)).as("bigram"))
      // <2-token docs emit one degenerate whole-text shingle — drop
      .filter(size(split(col("bigram"), " ")) === 2)
      .select(split(col("bigram"), " ").getItem(0).as("w1"),
        split(col("bigram"), " ").getItem(1).as("w2"))
    // symmetric weighted edges, no self-loops; vocab-sized from here on
    val edges = bg.select(col("w1").as("src"), col("w2").as("dst"))
      .union(bg.select(col("w2").as("src"), col("w1").as("dst")))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    val outw = edges.groupBy("src").agg(sum(col("w")).as("ow"))
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("term")).distinct()
      .localCheckpoint(true)

    var pr = nodes.select(col("term"), lit(Micro).as("prm"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(outw, "src")
        .join(pr.withColumnRenamed("term", "src"), "src")
        .select(col("dst"),
          round((col("w") / col("ow")) * (col("prm") * lit(Damping)), 0)
            .cast("long").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
      pr = nodes
        .join(contrib.withColumnRenamed("dst", "term"), Seq("term"), "left")
        .select(col("term"),
          (lit((Micro * 15) / 100) + coalesce(col("c"), lit(0L))).as("prm"))
        .localCheckpoint(true)
    }
    pr.select(col("term"), col("prm"),
      round(col("prm") / lit(Micro.toDouble), 4).as("pr"))
  }

  /** DuckDB rendering of the same computation: the edge CTEs plus an
    * UNROLLED pr0..prN chain (one CTE per iteration — recursive CTEs
    * can't carry the per-round aggregate portably). `shinglesSql2` is
    * the caller's 2-token shingle SQL (DedupQueries.shinglesSql(2)).
    */
  def ranksSql(shinglesSql2: String, iters: Int = Iters): String = {
    val base = s"""bg0 AS (
        SELECT unnest($shinglesSql2) AS bigram FROM documents),
      bgp AS (
        SELECT string_split(bigram, ' ')[1] AS w1,
               string_split(bigram, ' ')[2] AS w2
        FROM bg0 WHERE len(string_split(bigram, ' ')) = 2),
      dir_edges AS (
        SELECT w1 AS src, w2 AS dst FROM bgp
        UNION ALL SELECT w2 AS src, w1 AS dst FROM bgp),
      edges AS (
        SELECT src, dst, count(*) AS w FROM dir_edges
        WHERE src <> dst GROUP BY 1, 2),
      outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY 1),
      nodes AS (SELECT DISTINCT src AS term FROM edges),
      pr0 AS (SELECT term, CAST($Micro AS BIGINT) AS prm FROM nodes)"""
    val rounds = (0 until iters).map { k =>
      s"""pr${k + 1} AS (
        SELECT n.term,
          CAST(${(Micro * 15) / 100} + COALESCE(s.c, 0) AS BIGINT) AS prm
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS term,
            CAST(sum(CAST(round((e.w / o.ow) * (p.prm * $Damping), 0)
              AS BIGINT)) AS BIGINT) AS c
          FROM edges e
          JOIN outw o ON o.src = e.src
          JOIN pr$k p ON p.term = e.src
          GROUP BY e.dst) s ON s.term = n.term)"""
    }
    (Seq(base) ++ rounds).mkString(",\n      ") +
      s"\n      SELECT term, prm, round(prm / $Micro.0, 4) AS pr FROM pr$iters"
  }
}
