package graft

/** Plan inspection: `sbt "runMain graft.Explain q03_revenue_by_priority ..."`
  * prints the formatted physical plan of each named query (all queries if
  * none named) over SPARK_GRAFT_SF_DIR — the `.explain("formatted")`
  * feedback loop for keeping pushdown/broadcast/partial-agg properties
  * visible while iterating.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // 32 = the harness contract (same default as Bench/Verify/Cli/Smoke
    // since the round-10 core-count correction): plans inspected here
    // should be the plans the measured runs execute
    val spark = Tables.session("graft-explain", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"=== $n ===")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, dir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
