package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Intent pins for the native as-of join (q175): backward-match
  * semantics on a hand fixture (tolerance edges, ties, no-match, null
  * keys), and PLAN assertions — the custom exec must actually plan, with
  * one exchange per side and no Window (the structural win over the
  * q16/q99 union-window shape).
  */
class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  private def frames() = {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 1000L), // exact-ts click available (ts <= is inclusive)
      (1L, 101L, 1500L), // two clicks at same ts 1400 -> greatest id wins
      (1L, 102L, 9999999999L), // beyond tolerance from any click
      (2L, 103L, 500L), // user with no clicks at all
      (3L, 104L, 2000L) // click exists but only AFTER -> no match
    ).toDF("user_id", "purchase_id", "purchase_us")
    val right = Seq(
      (1L, 900L, 1000L),
      (1L, 901L, 1400L),
      (1L, 902L, 1400L), // tie on ts with 901 -> 902 must win
      (3L, 903L, 2001L)
    ).toDF("click_user", "click_id", "click_us")
    (left, right)
  }

  test("q175 semantics: inclusive backward match, tie to greatest id, tolerance and no-match nulls") {
    val (l, r) = frames()
    val got = graft.plans.AsOf.asofBackward(l, r,
        "user_id", "purchase_us", "click_user", "click_us", "click_id",
        tolUs = 1000L)
      .select("purchase_id", "click_id")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq.sorted
    assert(got == Seq((100L, 900L), (101L, 902L), (102L, -1L), (103L, -1L), (104L, -1L)))
  }

  test("q175 plan: AsOfJoinExec plans with one exchange per side and no Window") {
    val (l, r) = frames()
    val df = graft.plans.AsOf.asofBackward(l, r,
      "user_id", "purchase_us", "click_user", "click_us", "click_id", 1000L)
    df.collect() // force AQE finalization
    // AQE's toString prints the final AND initial plans — assert on the
    // final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (one per side), got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"window sneaked in:\n$plan")
  }

  test("q175 null keys never match and do not derail the merge") {
    import spark.implicits._
    val l = Seq((Some(1L), 10L, 100L), (None, 11L, 100L))
      .toDF("user_id", "purchase_id", "purchase_us")
    val r = Seq((Some(1L), 90L, 50L), (None, 91L, 50L))
      .toDF("click_user", "click_id", "click_us")
    val got = graft.plans.AsOf.asofBackward(l, r,
        "user_id", "purchase_us", "click_user", "click_us", "click_id", 1000L)
      .select("purchase_id", "click_id")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq.sorted
    assert(got == Seq((10L, 90L), (11L, -1L)))
  }

  test("asof over BUCKETED inputs plans with ZERO exchanges — the declared distribution composes with storage co-location") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS asof_l"); spark.sql("DROP TABLE IF EXISTS asof_r")
    val (l, r) = frames()
    // bucket both sides on the join key: EnsureRequirements sees the
    // ClusteredDistribution requirement already satisfied by the scan
    l.write.bucketBy(4, "user_id").sortBy("user_id", "purchase_us").saveAsTable("asof_l")
    r.write.bucketBy(4, "click_user").sortBy("click_user", "click_us").saveAsTable("asof_r")
    try {
      val df = graft.plans.AsOf.asofBackward(
        spark.table("asof_l"), spark.table("asof_r"),
        "user_id", "purchase_us", "click_user", "click_us", "click_id", 1000L)
      val got = df.select("purchase_id", "click_id")
        .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq.sorted
      assert(got == Seq((100L, 900L), (101L, 902L), (102L, -1L), (103L, -1L), (104L, -1L)))
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed as-of must not shuffle either side:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_l"); spark.sql("DROP TABLE IF EXISTS asof_r")
    }
  }

  test("q183 nearest semantics: both directions, tie to backward, same-ts tiebreak interleaving") {
    import spark.implicits._
    val l = Seq(
      (1L, 100L, 1000L), // back Δ600 vs fwd Δ500 -> forward wins
      (1L, 101L, 2000L), // back Δ500 vs fwd Δ500 -> TIE -> backward wins
      (1L, 102L, 5000L), // nearest click Δ2500 > tol -> null
      (2L, 103L, 500L),  // no clicks at all -> null
      (3L, 104L, 1000L), // two same-instant clicks, ids straddle 104 -> Δ0 tie -> backward (id 50)
      (4L, 105L, 1000L)  // one same-instant click with GREATER id -> forward, Δ0
    ).toDF("user_id", "purchase_id", "purchase_us")
    val r = Seq(
      (1L, 910L, 400L), (1L, 911L, 1500L), (1L, 912L, 2500L),
      (3L, 50L, 1000L), (3L, 200L, 1000L),
      (4L, 500L, 1000L)
    ).toDF("click_user", "click_id", "click_us")
    val got = graft.plans.AsOf.asofNearest(l, r,
        "user_id", "purchase_us", "purchase_id",
        "click_user", "click_us", "click_id", tolUs = 1000L)
      .select("purchase_id", "click_id")
      .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSeq.sorted
    assert(got == Seq((100L, 911L), (101L, 911L), (102L, -1L),
      (103L, -1L), (104L, 50L), (105L, 500L)))
  }

  test("q183 plan: nearest AsOfJoinExec plans with one exchange per side and no Window") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1000L)).toDF("user_id", "purchase_id", "purchase_us")
    val r = Seq((1L, 910L, 400L)).toDF("click_user", "click_id", "click_us")
    val df = graft.plans.AsOf.asofNearest(l, r,
      "user_id", "purchase_us", "purchase_id",
      "click_user", "click_us", "click_id", 1000L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (one per side), got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"window sneaked in:\n$plan")
  }

  test("negative tolerance is rejected up front, not silently all-null") {
    val (l, r) = frames()
    intercept[IllegalArgumentException] {
      graft.plans.AsOf.asofBackward(l, r,
        "user_id", "purchase_us", "click_user", "click_us", "click_id", -1L)
    }
  }

  test("q183 equals the q99 window composition on real events") {
    val dir = "/root/testdata/sf0.001"
    val native = operators.EventOps.asOfNearestClickNative(spark, dir)
    val ref = operators.EventOps.asOfNearestClick(spark, dir)
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
  }

  test("q175 equals the window-composed backward reference on real events") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val native = operators.EventOps.asOfNativeClick(spark, dir)
    // independent reference: windowed last-click-before, same tie rule
    val ev = graft.Tables.events(spark, dir)
    val p = ev.where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_us"))
    val c = ev.where($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts_us".as("click_us"))
    val joined = p.join(c, Seq("user_id"), "left")
      .where($"click_us".isNull ||
        ($"click_us" <= $"purchase_us" && $"purchase_us" - $"click_us" <= 7200000000L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"purchase_id").orderBy($"click_us".desc, $"click_id".desc)
    val ref = p.join(
        joined.withColumn("rk", row_number().over(w)).where($"rk" === 1)
          .select($"purchase_id", $"click_id", $"click_us"),
        Seq("purchase_id"), "left")
      .select($"user_id", $"purchase_id", $"purchase_us", $"click_id", $"click_us",
        ($"purchase_us" - $"click_us").as("delta_us"))
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty)
  }
}
