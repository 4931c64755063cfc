package graft

/** Focused per-query ladder (round 13): times the NAMED registered
  * queries with the Bench methodology — untimed sf0.001 warmup pass,
  * one cold pass at SPARK_GRAFT_SF_DIR, then median over
  * SPARK_GRAFT_BENCH_PASSES (default 3) steady passes, noop sink —
  * without paying the other ~180 queries per iteration. Usage:
  * `sbt "runMain graft.QProbe q144_entity_resolution q90_integrity_audit"`.
  * Same session config as Bench so the measured plans are the suite's.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "QProbe: name at least one registered query")
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"QProbe: not registered: ${unknown.mkString(",")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val spark = Tables.session("graft-qprobe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val queries = args.toSeq.map(n => n -> SparkEntry.queries(n))
    def runOne(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
               dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    queries.foreach { case (_, fn) =>
      try runOne(fn, warmupDir) catch { case _: Throwable => () }
    }
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    val cold = queries.map { case (n, fn) => n -> runOne(fn, sfDir) }.toMap
    val runs = (1 to passes).map(_ => queries.map { case (n, fn) => n -> runOne(fn, sfDir) })
    queries.foreach { case (n, _) =>
      val xs = runs.map(_.find(_._1 == n).get._2).sorted
      val med = if (xs.size % 2 == 1) xs(xs.size / 2)
        else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2
      println(f"QPROBE $n median=$med%.3f min=${xs.min}%.3f max=${xs.max}%.3f cold=${cold(n)}%.3f sf=$sfDir")
    }
    spark.stop()
  }
}
