package graft

import org.apache.spark.sql.functions._

/** Apples-to-apples probe for the native as-of join: the SAME
  * strict-backward semantics computed (a) by AsOfJoinExec and (b) by the
  * equivalent window composition (left-join candidates, rank by
  * (click_us, click_id) DESC, keep rank 1 — the plan a DataFrame user
  * writes without the custom operator). Alternating passes in ONE JVM
  * (the q148 probe discipline); results cross-checked equal each pass.
  * Numbers live in BENCH_NOTES; the registered q175 stays on the native
  * path.
  */
object Q175Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfgen/sf1")
    val spark = Tables.session("q175-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tol = 2L * 3600L * 1000000L
    def windowRef(): org.apache.spark.sql.DataFrame = {
      val ev = Tables.events(spark, sfDir)
      val p = ev.where($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts_us".as("purchase_us"))
      val c = ev.where($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts_us".as("click_us"))
      val cand = p.join(c, Seq("user_id"))
        .where($"click_us" <= $"purchase_us" && $"purchase_us" - $"click_us" <= tol)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"purchase_id").orderBy($"click_us".desc, $"click_id".desc)
      p.join(cand.withColumn("rk", row_number().over(w)).where($"rk" === 1)
          .select($"purchase_id", $"click_id", $"click_us"),
        Seq("purchase_id"), "left")
        .select($"user_id", $"purchase_id", $"purchase_us", $"click_id", $"click_us",
          ($"purchase_us" - $"click_us").as("delta_us"))
    }
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"Q175PROBE $tag%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      n
    }
    time("warmup")(operators.EventOps.asOfNativeClick(spark, sfDir))
    for (_ <- 1 to 3) {
      val a = time("native")(operators.EventOps.asOfNativeClick(spark, sfDir))
      val b = time("window")(windowRef())
      require(a == b, s"row counts diverged: $a vs $b")
    }
    // one full-content equality pass
    val n = operators.EventOps.asOfNativeClick(spark, sfDir)
    val r = windowRef()
    require(n.exceptAll(r).isEmpty && r.exceptAll(n).isEmpty, "content diverged")
    println("Q175PROBE content_equal=true")

    // the NEAREST direction (q183), same discipline: native AsOfJoinExec
    // vs q99's union+double-window composition — IDENTICAL semantics,
    // certified by one shared oracle text; alternating passes, content
    // cross-check each run.
    // MEASUREMENT TRAP (hit live): timing `count()` is INVALID for the
    // window side here — q99's window-derived columns feed only the
    // OUTPUT (no filter depends on them), so ColumnPruning deletes the
    // Window nodes under count() and the "window form" times an empty
    // projection. (The backward windowRef above is immune: its
    // `rk === 1` filter forces the window.) Time a full-column noop
    // WRITE instead — the same materialization Bench uses.
    def timeNoop(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"Q175PROBE $tag%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s (noop)")
    }
    timeNoop("nwarmup")(operators.EventOps.asOfNearestClickNative(spark, sfDir))
    for (_ <- 1 to 3) {
      timeNoop("nnative")(operators.EventOps.asOfNearestClickNative(spark, sfDir))
      timeNoop("nwindow")(operators.EventOps.asOfNearestClick(spark, sfDir))
    }
    val nn = operators.EventOps.asOfNearestClickNative(spark, sfDir)
    val nr = operators.EventOps.asOfNearestClick(spark, sfDir)
    require(nn.exceptAll(nr).isEmpty && nr.exceptAll(nn).isEmpty, "nearest content diverged")
    println("Q175PROBE nearest_content_equal=true")
    spark.stop()
  }
}
