package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** q96's decidability contract: the left-outer stream-stream join must
  * emit EVERY unmatched click, including the ones inside the last
  * watermark-delay + join-range window of the stream — exactly the rows
  * the naive formulation leaves stuck in state (Catalyst pushes the
  * event-type filter below the watermark node, so each side's watermark
  * trails its own type's maximum; the sentinel pair is the fix). The
  * batch twin here recomputes the full anti-join in Spark, so a
  * sentinel/watermark regression shows up as missing tail rows even
  * before the DuckDB oracle runs.
  */
class StreamAbandonmentSpec extends AnyFunSuite with SparkFixture {
  test("q96 streamed abandonment equals the batch anti-join incl. the stream tail") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.01"
    val ev = Tables.events(s, dir).select($"user_id", $"event_type", $"ts_us")
    val c = ev.where($"event_type" === "click").select($"user_id", $"ts_us".as("t"))
    val p = ev.where($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts_us".as("pt"))
    val abandoned = c.join(p,
        $"user_id" === $"pu" && $"pt" >= $"t" && $"pt" < $"t" + 3600000000L,
        "left_anti")
    val want = abandoned.groupBy($"user_id")
      .agg(count(lit(1)).as("n_abandoned"),
        min($"t").as("min_click_us"), max($"t").as("max_click_us"))
      .orderBy($"user_id").collect().map(_.toSeq).toSeq
    val got = StreamOps.streamAbandonment(s, dir).collect().map(_.toSeq).toSeq
    assert(got === want)
    // the regression-prone region: the batch twin's globally latest
    // abandoned click must be present in the streamed rollup
    val lastClick = abandoned.agg(max($"t")).head.getLong(0)
    assert(got.exists(_.last == lastClick),
      "latest abandoned click missing — watermark did not pass the stream tail")
  }
}
