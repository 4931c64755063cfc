package graft

/** Round-12 ladder for the persisted-ANN deployment claim: the SERVE
  * side must not pay the build. Times, at SPARK_GRAFT_SF_DIR:
  *   build+write  — codebook training + encode + artifact write
  *   load+serve   — fresh-session simulation (all memos dropped),
  *                  artifact load, pruned probe scan, exact refine
  * three serve passes so the steady serve cost is visible next to the
  * first (which re-warms only the raw-vector cache the refine needs).
  * Results → BENCH_NOTES.
  */
object AnnServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("ann-serve-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("annserve").toString
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"ANNSERVE $tag wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    timed("build+write") {
      graft.operators.AnnIndexStore.write(spark, sfDir, work)
    }
    graft.operators.Similarity.releaseCaches() // session boundary
    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(org.apache.spark.sql.functions.col("vec_id") % 100 === 0)
      .select("vec_id", "embedding")
    (1 to 3).foreach { i =>
      timed(s"load+serve pass$i") {
        val idx = graft.operators.AnnIndexStore.load(spark, work)
        graft.operators.AnnIndexStore.serve(spark, sfDir, idx, queries)
          .write.format("noop").mode("overwrite").save()
      }
    }
    graft.streaming.StreamOps.deleteRecursively(new java.io.File(work))
    spark.stop()
  }
}
