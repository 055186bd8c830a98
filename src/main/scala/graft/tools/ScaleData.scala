package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger SF from an existing one by key-offset
  * replication — the tool behind SCALE.md's fixed-cost convergence
  * measurements (the driver's testdata stops at sf0.1; the convergence
  * argument needs a point past it).
  *
  * The replication preserves workload CHARACTER, not just row count:
  *
  *  - `lineitem` / `orders`: each copy offsets the order keys by
  *    copy × (max+1), so fact cardinality scales linearly while the
  *    dimension tables (customer/nation/...) stay fixed — how a real
  *    warehouse grows. Group-key cardinality for q05 (suppkey × year)
  *    is unchanged; join fan-in for q03 scales with the facts.
  *  - `embeddings`: each copy offsets vec_id — the CORPUS grows while
  *    the model stays put: coarse centroids, PQ seeds and the query
  *    batch are all "first-N vec_ids", which the offset keeps pinned
  *    to copy 0, exactly how a production ANN index grows (more
  *    vectors indexed against a fixed trained quantizer). Copies
  *    share vector VALUES, so scaled search results stay well-defined
  *    through the (distance, id) tie-break both engines use.
  *  - `documents`: each copy offsets doc_id AND prefixes every token
  *    with a copy tag (`~1~the ~1~quick ...` — '~' is asserted absent
  *    from the source corpus, so no source token can alias a tagged
  *    one), making copies pairwise disjoint in shingle space. Prefixing every token uniformly is a
  *    Jaccard-preserving bijection per copy, so d03's true-pair count
  *    scales exactly linearly — no cross-copy near-dups, no artificial
  *    candidate blowup that would make the scaled run LOOK
  *    superlinear. Copy 0 is byte-identical to the source corpus.
  *  - everything else: copied verbatim (dims don't scale).
  *
  * Output keeps the driver's single-file-per-table layout
  * (`<out>/<table>.parquet` as a FILE) so tools/check.py's DuckDB
  * views read it unchanged.
  *
  * Usage: runMain graft.tools.ScaleData <inDir> <outDir> <copies>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    require(copies >= 1, s"copies must be >= 1, got $copies")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def replicate(name: String)(xform: (DataFrame, Long) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$inDir/$name.parquet")
      val out = xform(
        src.withColumn("__k", explode(sequence(lit(0L), lit(copies - 1L)))),
        copies.toLong
      ).drop("__k")
      // single part file, then rename to the driver's <table>.parquet
      // FILE layout (DuckDB 1.0 can't read a directory path)
      val tmp = s"$outDir/__tmp_$name"
      out.coalesce(1).write.mode("overwrite").parquet(tmp)
      val tmpDir = new java.io.File(tmp)
      val part = tmpDir.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(
        part.toPath, java.nio.file.Paths.get(s"$outDir/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      tmpDir.listFiles().foreach(_.delete()); tmpDir.delete()
    }

    val span = spark.read.parquet(s"$inDir/orders.parquet")
      .agg(max($"o_orderkey")).head().getLong(0) + 1
    val embSpan = spark.read.parquet(s"$inDir/embeddings.parquet")
      .agg(max($"vec_id")).head().getLong(0) + 1
    replicate("embeddings") { (df, _) =>
      df.withColumn("vec_id", $"vec_id" + $"__k" * lit(embSpan))
    }
    val docSpan = spark.read.parquet(s"$inDir/documents.parquet")
      .agg(max($"doc_id")).head().getLong(0) + 1

    replicate("lineitem") { (df, _) =>
      df.withColumn("l_orderkey", $"l_orderkey" + $"__k" * lit(span))
    }
    replicate("orders") { (df, _) =>
      df.withColumn("o_orderkey", $"o_orderkey" + $"__k" * lit(span))
    }
    // The copy tag must be a character the source alphabet cannot
    // produce, or tagging is not a disjoint bijection: with a plain
    // "c<k>" prefix, copy 0's literal token "c1foo" equals copy 1's
    // tagging of "foo", creating cross-copy shingle overlap that biases
    // the linear-scaling measurement. It must ALSO be single-byte
    // ASCII: the first choice here ('§', 2 UTF-8 bytes) made DuckDB's
    // BYTE-based levenshtein disagree with Spark's codepoint-based one
    // on the scale-up (9 vs the correct 7 on a d11 pair) — the base
    // corpus is pure ASCII, so the tag must not introduce the one
    // multi-byte character that splits the engines. '~' is
    // out-of-alphabet AND one byte — assert it, don't assume it.
    val marker = "~"
    require(
      spark.read.parquet(s"$inDir/documents.parquet")
        .filter($"text".contains(marker)).isEmpty,
      s"source corpus contains the copy-tag marker '$marker'; pick another")
    replicate("documents") { (df, _) =>
      df.withColumn("doc_id", $"doc_id" + $"__k" * lit(docSpan))
        .withColumn("text",
          when($"__k" === 0, $"text").otherwise(
            regexp_replace($"text", lit("(\\S+)"),
              concat(lit(marker), $"__k".cast("string"), lit(marker), lit("$1")))))
    }
    // `events`: each copy keeps the SAME users but shifts time by
    // copy × (span rounded up to whole days + 1) — the platform ages
    // rather than re-populates. Per-user histories grow ×copies (the
    // bot-user / per-key-timeline axis the sliced as-of join spreads),
    // temporal density per 10-s bucket stays constant (q57 scales with
    // co-occupancy, linearly), the q58 grid grows linearly in days
    // (users fixed — a user-replication scale-up would grow it
    // quadratically), sessionization gains sessions per user, and
    // every windowed/funnel read sees a longer but
    // statistically-identical stream. Whole-day shifts keep hour-of-day
    // and day-of-week profiles (q17/q50) intact. event_id offsets per
    // copy keep ids unique; ties and tie-breaks replay per copy.
    // The raw ts column has shipped as INT64-nanos AND TIMESTAMP_NTZ
    // across testdata generations (Tables.events' lesson) — shift in
    // the SOURCE representation so the output generation is
    // byte-compatible with its input's readers.
    locally {
      val raw = spark.read.parquet(s"$inDir/events.parquet")
      val evSpan = raw.agg(max($"event_id")).head().getLong(0) + 1
      val tsField = raw.schema("ts").dataType
      val dayUs = 86400000000L
      replicate("events") { (df, _) =>
        val shifted = tsField match {
          case org.apache.spark.sql.types.LongType =>
            // INT64 nanos generation
            val spanNs = raw.agg(max($"ts") - min($"ts")).head().getLong(0)
            val shiftNs = (spanNs / (dayUs * 1000) + 1) * dayUs * 1000
            df.withColumn("ts", $"ts" + $"__k" * lit(shiftNs))
          case _ =>
            // timestamp generations (NTZ or tz'd): span via a UTC
            // µs cast (wall-clock-preserving for NTZ under the UTC
            // session tz); timestampadd preserves the source type
            val spanUs = raw.select(
              unix_micros(max($"ts").cast("timestamp")) -
                unix_micros(min($"ts").cast("timestamp"))).head().getLong(0)
            val spanDays = spanUs / dayUs + 1
            df.withColumn("ts",
              expr(s"timestampadd(DAY, __k * $spanDays, ts)"))
        }
        shifted.withColumn("event_id", $"event_id" + $"__k" * lit(evSpan))
      }
    }
    for (t <- graft.core.Tables.names
         if !Set("lineitem", "orders", "documents", "embeddings", "events")(t)) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$inDir/$t.parquet"),
        java.nio.file.Paths.get(s"$outDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"wrote $outDir at ${copies}x $inDir")
    spark.stop()
  }
}
