package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming operator surface beyond the reference (which is
  * processing-time only — `/root/reference/triton/store.go:109`): event-time
  * windows with watermarks, session windows, and custom keyed state via
  * `flatMapGroupsWithState` — plus the flagship store pipeline
  * (stream → date-partitioned `.tri` archive with checkpointed offsets).
  */
object StreamOps {

  /** The reference's `store` pipeline (`/root/reference/triton.go:90-137`)
    * as one Structured Streaming query: micro-batches append to the
    * date/client-partitioned `.tri` archive, offsets commit to the
    * checkpoint log only after files are durable (the engine's version of
    * checkpoint-after-upload, `/root/reference/triton/store.go:51-67`, but
    * exactly-once instead of at-least-once). `foreachBatch` + deterministic
    * batch handling keeps re-runs idempotent.
    */
  def startStore(events: DataFrame, root: String, client: String,
                 checkpointLocation: String): StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointLocation)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Archive.store(batch, root, client)
      }
      .start()

  /** Watermarked tumbling event-time window counts — late data beyond the
    * watermark is dropped instead of landing in the wrong hour file
    * (the reference's known late-data flaw, `README.md:53-56`).
    */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
                     window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Event-time session windows with a watermark (streaming form of
    * `EventOps.sessionWindowNative`).
    */
  def sessionCounts(events: DataFrame, watermark: String = "30 minutes",
                    gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_in_session"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_in_session"))

  /** Streaming exact dedup: duplicates of an id arriving within the
    * watermark window are dropped with bounded state —
    * `dropDuplicatesWithinWatermark` expires each key once the watermark
    * passes it, so state never grows with the stream (plain
    * `dropDuplicates` on a stream retains every key forever). The live
    * form of the batch `TextDedup.exactDedup` stage.
    */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state: running per-user event counter + last-seen
    * timestamp via `flatMapGroupsWithState` — the engine's
    * arbitrary-stateful-processing extension point (the reference has no
    * per-key state at all, only offsets).
    */
  def runningUserCounts(s: SparkSession, events: Dataset[(Long, Long)]): Dataset[(Long, Long, Long)] = {
    import s.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val (n0, last0) = state.getOption.getOrElse((0L, Long.MinValue))
          var n = n0; var last = last0
          rows.foreach { case (_, ts) => n += 1; if (ts > last) last = ts }
          state.update((n, last))
          Iterator((user, n, last))
      }
  }
}
