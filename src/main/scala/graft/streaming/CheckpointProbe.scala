package graft.streaming

/** Measures the serial-upsert ceiling of [[CheckpointDb]] — the mirror
  * path (`mirror` / `autoMirror`) issues ONE select-then-update JDBC
  * transaction per shard per progress event, so its per-batch latency is
  * linear in shard count. This probe drives exactly that loop against an
  * embedded Derby at fake-shard counts around the reference deployment
  * scale (tens of shards) and two decades beyond it, so the boundary is
  * measured, not assumed. Numbers are recorded in BENCH_NOTES.md.
  *
  * Shapes probed per count: the cold pass (every shard INSERTs), the
  * steady pass (every shard UPDATEs — the per-progress-event mirror
  * shape), and the `stats` scan reference tooling runs against the
  * table.
  *
  * Run: `sbt "runMain graft.streaming.CheckpointProbe [counts...]"`.
  */
object CheckpointProbe {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(100, 1000, 10000)
    val dir = java.nio.file.Files.createTempDirectory("ckpt_probe")
    val db = CheckpointDb.open(s"jdbc:derby:${dir.resolve("db")};create=true")
    try {
      counts.foreach { n =>
        // separate client AND stream per count: the cold pass stays cold,
        // and the stats() scan (which filters by client) covers exactly
        // this count's n rows, not the cumulative table
        val client = s"probe$n"
        val stream = s"s$n"
        val shards = (0 until n).map(i => f"shardId-$i%012d")
        val t0 = System.nanoTime()
        shards.foreach(sh => db.checkpoint(client, stream, sh, "1", 1L))
        val cold = (System.nanoTime() - t0) / 1e9
        val passes = 3
        val t1 = System.nanoTime()
        (1 to passes).foreach { p =>
          shards.foreach(sh => db.checkpoint(client, stream, sh, p.toString, p.toLong))
        }
        val warm = (System.nanoTime() - t1) / 1e9 / passes
        val t2 = System.nanoTime()
        val nStats = db.stats(client, 100L).size
        val statsSec = (System.nanoTime() - t2) / 1e9
        require(nStats == n, s"stats isolation broken: $nStats rows for $n shards")
        println(f"PROBE shards=$n cold_insert_sec=$cold%.2f warm_pass_sec=$warm%.2f " +
          f"upserts_per_sec=${n / warm}%.0f stats_rows=$nStats stats_sec=$statsSec%.2f")
      }
    } finally {
      db.close()
      // embedded Derby holds the db dir open until shutdown; the probe is
      // a one-shot JVM so the temp dir dies with /tmp
    }
  }
}
