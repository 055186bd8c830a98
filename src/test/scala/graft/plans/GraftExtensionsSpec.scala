package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("install exposes the native expressions through SQL") {
    GraftExtensions.install(spark)
    val h = spark.sql("SELECT rolling_hash('ab') AS h").head().getLong(0)
    assert(h == (97L * 31 + 98) % 1000000007L)
    val d = spark.sql(
      "SELECT dot_f(cast(array(1.0, 2.0) AS array<float>), cast(array(3.0, 4.0) AS array<float>)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
    val sh = spark.sql("SELECT word_shingles('a b c d e f', 5) AS s")
      .head().getSeq[String](0)
    assert(sh == Seq("a b c d e", "b c d e f"))
  }

  test("NativeKernelRule rewrites the declarative dot-product fold to dot_f") {
    GraftExtensions.install(spark)
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val df = e.crossJoin(q)
      .select(VectorFunctions.dotFold($"embedding", $"q_emb").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_f"),
      s"expected dot_f after NativeKernelRule, got:\n$optimized")
    // and the rewritten plan computes the same values as the kernel API
    val viaRule = df.collect().map(_.getDouble(0)).sorted.toSeq
    val viaKernel = e.crossJoin(q)
      .select(VectorFunctions.dot($"embedding", $"q_emb").as("d"))
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(viaRule == viaKernel)
  }

  test("the rule leaves non-matching folds untouched") {
    GraftExtensions.install(spark)
    // a sum-fold (not a dot product) must not be rewritten
    val df = Seq(Seq(1.0f, 2.0f)).toDF("a")
      .select(aggregate(transform($"a", x => x.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("dot_f"))
    assert(df.head().getDouble(0) == 3.0)
  }
}
