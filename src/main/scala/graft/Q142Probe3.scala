package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Round-12 item 3: the sf10 spill tail. q142's edge build was the
  * largest single spiller (2.1 GB at sf10, BENCH_NOTES round 11). This
  * probe times the two builds head-to-head at SPARK_GRAFT_SF_DIR:
  *
  *  - legacy   — distinct → groupBy(deg) → join → repartition(src)
  *  - windowed — distinct → count window over src (one shuffle, output
  *               already hashpartitioned on src)
  *
  * For each variant: build+materialize wall/spill, then a full 5-round
  * pagerank pass off the cached frame (the steady-state check — the
  * round join must still see the src clustering, or every round pays a
  * new exchange). Results recorded in BENCH_NOTES; the winner is wired
  * into bipartitePagerank.
  */
object Q142Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("q142-probe3", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val spillMem = new AtomicLong; val spillDisk = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    })
    def gb(b: Long): String = f"${b / 1e9}%.2f GB"
    Seq("legacy", "windowed").foreach { variant =>
      val (m0, d0) = (spillMem.get, spillDisk.get)
      val t0 = System.nanoTime()
      val edges = (variant match {
        case "legacy" => graft.operators.Clustering.pagerankEdgesLegacy(spark, sfDir)
        case _ => graft.operators.Clustering.pagerankEdgesWindowed(spark, sfDir)
      }).cache()
      val n = edges.count() // materialize the cache
      val buildS = (System.nanoTime() - t0) / 1e9
      val (bm, bd) = (spillMem.get - m0, spillDisk.get - d0)
      val t1 = System.nanoTime()
      graft.operators.Clustering.pagerankFromEdges(spark, edges, 5)
        .write.format("noop").mode("overwrite").save()
      val roundsS = (System.nanoTime() - t1) / 1e9
      val (rm, rd) = (spillMem.get - m0 - bm, spillDisk.get - d0 - bd)
      println(f"Q142BUILD $variant%-8s edges=$n%,d build=$buildS%.1f s " +
        f"spill(mem=${gb(bm)} disk=${gb(bd)}) rounds=$roundsS%.1f s " +
        f"spill(mem=${gb(rm)} disk=${gb(rd)})")
      edges.unpersist(true)
      ()
    }
    spark.stop()
  }
}
