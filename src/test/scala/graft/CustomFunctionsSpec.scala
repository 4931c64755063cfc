package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinKAggregator, TopKAggregator}

/** The two custom extension points beyond msgpack: the codegen'd `hash60`
  * expression and the bounded top-k `Aggregator`.
  */
class CustomFunctionsSpec extends AnyFunSuite with SparkFixture {

  test("hash60 expression equals its SQL-portable md5 formulation") {
    val row = spark.sql(
      "SELECT hash60('abc') AS a, CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT) AS b")
      .collect()(0)
    assert(row.getLong(0) === row.getLong(1))
    // null propagates
    assert(spark.sql("SELECT hash60(CAST(NULL AS STRING))").collect()(0).isNullAt(0))
  }

  test("hash60 stays inside whole-stage codegen (doGenCode, no fallback)") {
    // a file source (not a local collection) so constant folding can't
    // pre-evaluate and the projection actually generates code
    val df = Tables.table(spark, sfDir, "documents").selectExpr("hash60(text) AS h")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(0) >= 0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen stage around hash60:\n$plan")
    assert(!plan.toLowerCase.contains("fallback"), "must not fall back to interpreted eval")
  }

  test("to_msgpack/from_msgpack stay inside whole-stage codegen (no fallback)") {
    val df = Tables.table(spark, sfDir, "documents")
      .selectExpr("named_struct('id', doc_id, 'txt', text) AS rec")
      .selectExpr("to_msgpack(rec) AS bin")
      .selectExpr("from_msgpack(bin, 'id BIGINT, txt STRING') AS back")
      .selectExpr("back.id AS id", "back.txt AS txt")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen stage around msgpack exprs:\n$plan")
    assert(!plan.toLowerCase.contains("fallback"), "must not fall back to interpreted eval")
    // corrupt input still dead-letters to null through the generated path
    val nulls = spark.sql("SELECT from_msgpack(CAST('garbage' AS BINARY), 'id BIGINT') AS v")
    assert(nulls.collect()(0).isNullAt(0))
  }

  test("TopKAggregator laws: bounded, ordered, merge-associative") {
    val agg = new TopKAggregator(3)
    val rows = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (4L, 1.0), (5L, 7.0))
    val all = rows.foldLeft(agg.zero)(agg.reduce)
    assert(all === Seq((2L, 9.0), (3L, 9.0), (5L, 7.0))) // ties: lower id first
    // merging arbitrary splits gives the same answer as one pass
    for (cut <- 1 until rows.length) {
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === all, s"split at $cut")
    }
  }

  test("MinKAggregator laws: bounded, (key,id)-ordered, merge-associative") {
    val agg = new MinKAggregator(3)
    val rows = Seq((9L, 1L), (2L, 5L), (2L, 4L), (7L, 2L), (11L, 3L))
    val all = rows.foldLeft(agg.zero)(agg.reduce)
    assert(all === Seq((2L, 4L), (2L, 5L), (7L, 2L))) // key ties: lower id first
    for (cut <- 1 until rows.length) {
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === all, s"split at $cut")
    }
  }
}
