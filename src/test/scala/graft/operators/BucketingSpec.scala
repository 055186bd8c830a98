package graft.operators

import graft.SparkSpec
import graft.core.Tables

class BucketingSpec extends SparkSpec {

  test("bucketed join on matching bucket counts plans with no shuffle exchange") {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    Bucketing.writeBucketed(li, "bkt_lineitem", "l_orderkey", 4)
    Bucketing.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "bkt_orders", "l_orderkey", 4)

    val broadcastOld = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_lineitem", "bkt_orders", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, plan:\n$plan")
      // and it is still correct
      val expected = li.join(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastOld)
    }
  }
}
