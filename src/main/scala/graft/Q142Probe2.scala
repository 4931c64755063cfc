package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Round-11 follow-up to the round-10 q142 probes (localCheckpoint and
  * RELEASE_EVERY both negative): the bisect showed ANY ~20-query prefix
  * inflates q142's steady pass 3.0 → 6.3 s with IDENTICAL shuffle IO,
  * zero spill, and identical cold time — so the delta is JVM-level, not
  * plan- or cache-eviction-level. This probe attributes it: sum task
  * `jvmGCTime` + executor run/CPU time for 3 steady q142 passes run
  * SOLO, then again after executing the q120-q141 block once (the
  * bisect's smallest inflating prefix). If the wall delta shows up in
  * gcTime, the mechanism is old-gen pressure from accumulated
  * cache/broadcast tenancy — the round-9 heap lesson localized to one
  * query; if not, it's scheduler/driver-side.
  */
object Q142Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("q142-probe2", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val gc = new AtomicLong; val run = new AtomicLong; val cpu = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          gc.addAndGet(m.jvmGCTime)
          run.addAndGet(m.executorRunTime)
          cpu.addAndGet(m.executorCpuTime / 1000000)
        }
      }
    })
    def q142(): Unit =
      SparkEntry.queries("q142_bipartite_pagerank")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def settle(): Unit = { Thread.sleep(400) }
    def measure(tag: String): Unit = (1 to 3).foreach { i =>
      settle()
      val (g0, r0, c0) = (gc.get, run.get, cpu.get)
      val t0 = System.nanoTime()
      q142()
      settle()
      println(f"Q142GC $tag pass$i wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"taskGc=${gc.get - g0} ms taskRun=${run.get - r0} ms taskCpu=${cpu.get - c0} ms")
    }
    q142() // cold: build the memoized edge cache
    measure("solo ")
    // execute the bisect's inflating prefix once
    val block = SparkEntry.queries.keys.filter { n =>
      val num = n.drop(1).takeWhile(_.isDigit).toInt
      num >= 120 && num <= 141
    }.toSeq.sorted
    block.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    measure("after")
    // driver-side GC counters for the same window, for the non-task share
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala.foreach { b =>
      println(s"Q142GC jvm ${b.getName} count=${b.getCollectionCount} time=${b.getCollectionTime} ms")
    }
    spark.stop()
  }
}
