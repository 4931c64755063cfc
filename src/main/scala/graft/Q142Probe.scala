package graft

/** Measurement probe for q142's per-round lineage cost: the rank frame
  * is node-bounded (parts + suppliers), but without a checkpoint each
  * of the 5 PageRank rounds re-analyzes the whole unrolled plan. Runs
  * the registered shape and the per-round localCheckpoint variant
  * alternating in ONE JVM (the q148 probe discipline — no bench-order
  * bias) and prints wall seconds per pass. Values are identical by
  * construction (checkpointing changes materialization, not math); the
  * adopt/reject decision lives in BENCH_NOTES.
  */
object Q142Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.session("q142-probe", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String, ckpt: Boolean): Unit = {
      val t0 = System.nanoTime()
      val n = operators.Clustering.bipartitePagerank(spark, sfDir, ckptRounds = ckpt)
        .count()
      println(f"Q142PROBE $tag%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm the shared edge cache once so both variants measure the loop
    time("warmup", ckpt = false)
    for (_ <- 1 to 3) { time("plain", ckpt = false); time("ckpt", ckpt = true) }
    spark.stop()
  }
}
