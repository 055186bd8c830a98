package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for t24's output pass: times each candidate shape of
  * the per-document aggregation under the noop sink, census/training
  * hoisted out so only the output pass differs.
  *
  * Usage: runMain graft.tools.T24Probe [sfDir] [reps]
  */
object T24Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = graft.core.GraftSession.local(appName = "t24-probe")
    graft.plans.GraftExtensions.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.core.Tables.documents(spark, sfDir)
    val words = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"doc_id",
        explode(graft.functions.TextFunctions.wsTokens($"text")).as("w"))
      .filter($"w".rlike("^[A-Za-z0-9]+$"))
    val census = graft.operators.BpeTrainer.wordCensus(
      words.groupBy($"w").agg(count(lit(1)).as("freq")))
    val Some((_, counts)) =
      graft.operators.BpeTrainer.learnMergesWithCounts(census, 6)
    println(s"[probe] vocab=${counts.size}")
    val perWord = broadcast(counts.toDF("w", "nt"))

    def timeIt(name: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        build.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name median=${ts.sorted.apply(ts.length / 2)}%.3f " +
        s"reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // A: the r20 shape — filter + inner join + doc agg + join-back
    timeIt("A_old_joinback") {
      val agg = words.join(perWord, Seq("w"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum($"nt").cast("long").as("n_bpe_tokens"))
      docs.select($"doc_id").join(agg, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_words", lit(0L)).as("n_words"),
          coalesce($"n_bpe_tokens", lit(0L)).as("n_bpe_tokens"),
          round(try_divide(
            coalesce($"n_bpe_tokens", lit(0L)), coalesce($"n_words", lit(0L))), 4)
            .as("tokens_per_word"))
    }

    // B: the r21 shape — explode_outer + left join + count(when(rlike))
    timeIt("B_outer_left") {
      val toks = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select($"doc_id",
          explode_outer(graft.functions.TextFunctions.wsTokens($"text")).as("w"))
      toks.join(perWord, Seq("w"), "left")
        .groupBy($"doc_id")
        .agg(count(when($"w".rlike("^[A-Za-z0-9]+$"), lit(1))).cast("long")
          .as("n_words"),
          sum($"nt").cast("long").as("n_bpe_tokens"))
        .select($"doc_id", $"n_words",
          coalesce($"n_bpe_tokens", lit(0L)).as("n_bpe_tokens"),
          round(try_divide(coalesce($"n_bpe_tokens", lit(0L)), $"n_words"), 4)
            .as("tokens_per_word"))
    }

    // C: B but the n_words flag computed BEFORE the aggregate (projection)
    timeIt("C_outer_flag_proj") {
      val toks = docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select($"doc_id",
          explode_outer(graft.functions.TextFunctions.wsTokens($"text")).as("w"))
        .withColumn("isw", when($"w".rlike("^[A-Za-z0-9]+$"), 1L))
      toks.join(perWord, Seq("w"), "left")
        .groupBy($"doc_id")
        .agg(count($"isw").cast("long").as("n_words"),
          sum($"nt").cast("long").as("n_bpe_tokens"))
        .select($"doc_id", $"n_words",
          coalesce($"n_bpe_tokens", lit(0L)).as("n_bpe_tokens"),
          round(try_divide(coalesce($"n_bpe_tokens", lit(0L)), $"n_words"), 4)
            .as("tokens_per_word"))
    }

    // D: A without the join-back (inner only; row-count check disabled)
    timeIt("D_inner_nojoinback") {
      words.join(perWord, Seq("w"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).cast("long").as("n_words"),
          sum($"nt").cast("long").as("n_bpe_tokens"))
    }

    spark.stop()
  }
}
