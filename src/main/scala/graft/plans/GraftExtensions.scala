package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session extensions for the graft engine: the native expressions as
  * SQL functions plus the native-kernel optimizer rewrite. Production
  * use:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * For an already-running session use `GraftExtensions.install(spark)`
  * (public `experimental.extraOptimizations` + function registry).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => NativeKernelRule)
    ext.injectOptimizerRule(_ => RankLimitRule)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

object GraftExtensions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> (es => RollingHash(es.head)),
    "simhash60" -> (es => SimHash60(es.head)),
    "token_hash60" -> (es => TokenHash60(es.head)),
    "dot_f" -> (es => DotProductF(es(0), es(1))),
    "word_shingles" -> (es => WordShingles(es.head, es(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => n
      case other => throw new IllegalArgumentException(
        s"word_shingles(text, n): n must be an integer literal, got $other")
    })))

  /** Register on a live session (extensions only apply at session
    * construction): SQL functions via the registry, the rewrite rule
    * via the public experimental hook.
    */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftshim.SparkShims.registerFunction(spark, name, builder)
    }
    Seq(NativeKernelRule, RankLimitRule).foreach { rule =>
      if (!spark.experimental.extraOptimizations.contains(rule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ rule
    }
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }
}
