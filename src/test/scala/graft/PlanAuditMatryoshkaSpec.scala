package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Similarity}

/** Intent pins for q163-q164. */
class PlanAuditMatryoshkaSpec extends AnyFunSuite with SparkFixture {

  test("q163: no truncation -> perfect overlap; 16-dim overlap bounded") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // dims=64 is the identity truncation: both rankings are the same
    // ranking, so overlap must be exactly k for every query
    val ident = Similarity.matryoshkaEval(spark, dir, k = 5, dims = 64)
      .as[(Long, Long)].collect().toSeq
    assert(ident.nonEmpty && ident.forall(_._2 == 5L))
    val t16 = Similarity.matryoshkaEval(spark, dir, k = 5, dims = 16)
      .as[(Long, Long)].collect().toSeq
    assert(t16.map(_._1) == ident.map(_._1)) // every query reported
    assert(t16.forall(r => r._2 >= 0L && r._2 <= 5L))
  }

  test("q164 star join: 2 broadcasts, 0 sort-merge, plain-join rollup") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val rows = Relational.broadcastPlanAudit(spark, dir).collect()
    assert(rows.forall(r => r.getLong(3) == 2L && r.getLong(4) == 0L),
      s"star join must broadcast both dims:\n${rows.mkString("\n")}")
    val plain = Tables.table(spark, dir, "customer")
      .join(Tables.table(spark, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .join(Tables.table(spark, dir, "region"), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)")).as("cents"))
      .orderBy($"r_name")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == plain)
  }
}
