package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Intent pin for q159: the transformWithState event-time-TIMER
  * sessionizer. The decisive property: each user's FINAL session has no
  * closing row, so it can only reach the sink through
  * `handleExpiredTimer` — if the per-user counts equal the batch truth,
  * the timers demonstrably fired (an inline-only implementation would
  * lose exactly one session per user).
  */
class TimerSessionSpec extends AnyFunSuite with SparkFixture {

  test("q159 timer sessions equal the batch gap-split, incl. timer-only finals") {
    import spark.implicits._
    val dir = Files.createTempDirectory("q159fix").toString
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val G = 1800L
    // user 7: events at 0,60 | gap 2h | 7200,7260 -> 2 sessions, 4 events
    //   (the second session closes ONLY by timer)
    // user 8: one event -> 1 session, timer-only
    // user 9: exactly-gap boundary: 0 then +1800s -> the >= rule splits
    //   them into 2 sessions of 1 event each
    val rows = Seq(
      (7L, 0L), (7L, 60L), (7L, 7200L), (7L, 7260L),
      (8L, 500L),
      (9L, 0L), (9L, G))
      .zipWithIndex.map { case ((u, t), i) => (i.toLong, ts(t), u, "e") }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.streaming.StreamOps.timerSessionsStreamed(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 2L, 4L), (8L, 1L, 1L), (9L, 2L, 2L)))
  }
}
