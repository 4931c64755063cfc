package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Round-12 item 3, second spiller: q76's window-fingerprint cache
  * (0.8 GB sf10 spill, BENCH_NOTES round 11). Head-to-head at
  * SPARK_GRAFT_SF_DIR: the shipped (doc_id, pos, wh) wins frame vs the
  * packed (doc_id<<32|pos, wh) 2-long variant — full q76 run each,
  * cold (cache build) then steady. Results → BENCH_NOTES; adopt only
  * on a win.
  */
object Q76Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("q76-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
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
    val docs = Tables.table(spark, sfDir, "documents")
    Seq(false, true).foreach { packed =>
      val tag = if (packed) "packed" else "plain "
      Seq("cold", "steady").foreach { phase =>
        val (m0, d0) = (spillMem.get, spillDisk.get)
        val t0 = System.nanoTime()
        graft.operators.TextDedup.dupSubstringCoverageDf(docs, 8, 2,
            cacheKey = Some((sfDir, "8")), packed = packed)
          .write.format("noop").mode("overwrite").save()
        println(f"Q76BUILD $tag $phase%-6s wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"spill(mem=${gb(spillMem.get - m0)} disk=${gb(spillDisk.get - d0)})")
      }
      graft.operators.Similarity.releaseCaches() // drop this variant's cache
    }
    spark.stop()
  }
}
