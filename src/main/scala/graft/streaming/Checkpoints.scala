package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queryable checkpoint surface (C1-C4): Structured Streaming's
  * checkpoint IS the store — `offsets/N` is written at batch START and
  * `commits/N` only after the sink commits, so the PAIR encodes the
  * durable-then-checkpoint ordering of
  * `/root/reference/triton/store.go:51-67`; this reads the newest
  * committed pair back as a DataFrame so the reference's `stats` lag view
  * (`/root/reference/triton/checkpoint.go:127-151`,
  * `/root/reference/triton.go:142-155`) is a plain query.
  */
object Checkpoints {

  /** Per-shard committed sequence numbers from the newest COMMITTED batch
    * in a query's checkpoint, with the commit age in seconds. `offsets/N`
    * is written at batch START; only a matching `commits/N` proves the
    * sink committed batch N — reading the bare newest offsets entry would
    * report an in-flight (possibly crashed) batch as consumed, breaking
    * the durable-before-checkpoint ordering this surface exists to
    * expose. Reads through the Hadoop FileSystem API, so an HDFS/S3
    * `checkpointLocation` — the normal production case — works the same
    * as a local path.
    */
  def offsets(spark: SparkSession, checkpointLocation: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.fs.{FileStatus, Path}
    val fs = new Path(checkpointLocation).getFileSystem(spark.sessionState.newHadoopConf())
    // one shared numeric-name rule for both logs (skips .tmp/.compact etc.)
    def batchFiles(d: Path): Map[Long, FileStatus] =
      if (!fs.exists(d)) Map.empty
      else fs.listStatus(d).iterator
        .filter { st => val n = st.getPath.getName; n.nonEmpty && n.forall(_.isDigit) }
        .map(st => st.getPath.getName.toLong -> st).toMap
    val commitFiles = batchFiles(new Path(checkpointLocation, "commits"))
    val offsetFiles = batchFiles(new Path(checkpointLocation, "offsets"))
    val rows: Seq[(Long, String, Long, Long)] =
      (commitFiles.keySet intersect offsetFiles.keySet).maxOption.toSeq.flatMap { batchId =>
        // age is measured from the COMMIT file: the offsets file predates
        // it by the whole batch duration, which would overstate lag
        val ageSec = (System.currentTimeMillis()
          - commitFiles(batchId).getModificationTime) / 1000L
        val in = fs.open(offsetFiles(batchId).getPath)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        lines.drop(2) // v1 line + metadata line
          .flatMap(line => ShardOffsets.fromJson(line).seqs.toSeq)
          .map { case (shard, seq) => (batchId, shard, seq, ageSec) }
      }
    rows.toDF("batch_id", "shard", "sequence_number", "age_sec")
  }

  /** Graphite-style lag lines `client.stream.shard.age -> seconds`
    * (`/root/reference/triton/checkpoint.go:145-147`).
    */
  def statsLines(spark: SparkSession, checkpointLocation: String,
                 client: String, stream: String): Seq[String] = {
    import spark.implicits._
    offsets(spark, checkpointLocation)
      .select(concat_ws(".", lit(client), lit(stream), col("shard"), lit("age")), col("age_sec"))
      .as[(String, Long)].collect().toSeq
      .map { case (k, v) => s"$k $v" }
  }
}
