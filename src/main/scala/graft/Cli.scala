package graft

import org.apache.spark.sql.functions._

/** CLI entry points matching the reference binary's four commands
  * (`/root/reference/triton.go:176-375`):
  *
  *   store  --sf-dir D --root R --client C      events table -> .tri archive
  *   cat    --root R --client C --start YYYYMMDD --end YYYYMMDD   archive -> JSON lines
  *   shards --stream S                          list shard ids
  *   stats  --checkpoint DIR --client C --stream S   graphite-style lag lines
  *
  * `sbt "runMain graft.Cli cat --root /tmp/arch --client c1 --start 20240101 --end 20241231"`
  */
object Cli {

  private def opts(args: Array[String]): Map[String, String] =
    args.drop(1).sliding(2, 2).collect { case Array(k, v) => k.stripPrefix("--") -> v }.toMap

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: store|cat|shards|stats ..."); sys.exit(2) }
    val o = opts(args)
    lazy val spark = Tables.session("graft-cli", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args(0) match {
      case "store" =>
        val ev = Tables.events(spark, o("sf-dir"))
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        sources.Archive.store(ev, o("root"), o.getOrElse("client", "graft"))
        println(s"stored -> ${o("root")}")
      case "cat" =>
        // JSON-per-line export (`/root/reference/triton.go:361-365`);
        // record fields only — partition bookkeeping stays out of the
        // JSON. Streamed partition-by-partition (the reference writes
        // record-at-a-time): a large archive range never materializes on
        // the driver, and toLocalIterator preserves the global sort.
        sources.Archive.read(spark, o("root"), o.getOrElse("client", ""),
            o("start"), o("end"))
          .orderBy(col("date"), col("event_id"))
          .drop("date", "client")
          .toJSON.toLocalIterator().forEachRemaining(println(_))
      case "shards" =>
        // --pick N prints just the Nth shard id (the reference's
        // PickShardID, `/root/reference/triton/stream.go:226-245`)
        val svc = streaming.ShardService.resolve(o.getOrElse("service", "fake"))
        o.get("pick") match {
          case Some(n) => println(svc.pickShardId(o("stream"), n.toInt))
          case None    => svc.listShards(o("stream")).foreach(println)
        }
      case "stats" =>
        // like the reference CLI (`triton.go:142-155`), stats read either
        // store: a jdbc: URL hits the triton_checkpoint table, anything
        // else is a Structured Streaming checkpointLocation
        val loc = o("checkpoint")
        if (loc.startsWith("jdbc:")) {
          val db = streaming.CheckpointDb.open(loc)
          try db.stats(o.getOrElse("client", "graft"), System.currentTimeMillis() / 1000L)
            .toSeq.sorted.foreach { case (k, v) => println(s"$k $v") }
          finally db.close()
        } else
          streaming.Checkpoints.statsLines(spark, loc,
            o.getOrElse("client", "graft"), o.getOrElse("stream", "events"))
            .foreach(println)
      case other =>
        System.err.println(s"unknown command: $other"); sys.exit(2)
    }
  }
}
