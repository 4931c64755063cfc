package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-shuffled co-located joins: the 100 TB answer for a
  * repeatedly-joined fact pair. Written once bucketed by the join key,
  * the join plans with zero Exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkFixture {

  test("bucketed fact-fact join plans without a shuffle") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.table(spark, sfDir, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.table(spark, sfDir, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    // disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").count()
      joined.collect()
      // AQE's toString appends an "== Initial Plan ==" section; analyze
      // only the final plan
      val full = joined.queryExecution.executedPlan.toString
      val plan = full.split("== Initial Plan ==")(0)
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, "expected a sort-merge join")
      // no Exchange below the join: both sides read pre-bucketed
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle its inputs:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
