package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queryable checkpoint surface (C1-C4): Structured Streaming's offset log
  * IS the checkpoint store (written after each sink commit — the
  * durable-then-checkpoint ordering of
  * `/root/reference/triton/store.go:51-67`); this reads it back as a
  * DataFrame so the reference's `stats` lag view
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
    import org.apache.hadoop.fs.Path
    val dir = new Path(checkpointLocation, "offsets")
    val commitsDir = new Path(checkpointLocation, "commits")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    def batchIds(d: Path): Set[Long] =
      if (!fs.exists(d)) Set.empty
      else fs.listStatus(d).toSeq.map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).toSet
    val committed = batchIds(commitsDir)
    val rows: Seq[(Long, String, Long, Long)] =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter { st =>
          val n = st.getPath.getName
          n.nonEmpty && n.forall(_.isDigit) && committed.contains(n.toLong)
        }
        .sortBy(_.getPath.getName.toLong).lastOption.toSeq.flatMap { st =>
          val batchId = st.getPath.getName.toLong
          val ageSec = (System.currentTimeMillis() - st.getModificationTime) / 1000L
          val in = fs.open(st.getPath)
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
