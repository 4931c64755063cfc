package graft

/** Round-12 plan captures for the two adopted spill-tail variants whose
  * "before" no longer executes in the registered query: q142's edge
  * build (legacy groupBy+join+repartition vs adopted count-window) and
  * q76's wins cache ((doc_id, pos, wh) vs adopted packed 2-long rows).
  * Both variants stay live behind probe seams (Q142Probe3 / Q76Probe),
  * so the before/after `.explain("formatted")` in plans/r12 is captured
  * from the code that actually runs, not from a reverted tree.
  *
  *   sbt "runMain graft.R12Plans"   # SPARK_GRAFT_SF_DIR for the corpus
  */
object R12Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Tables.session("r12-plans", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    println("=== q142 edge build BEFORE (legacy: distinct -> groupBy deg -> join -> repartition(src)) ===")
    graft.operators.Clustering.pagerankEdgesLegacy(spark, dir).explain("formatted")
    println("=== q142 edge build AFTER (adopted: count window over src, one exchange) ===")
    graft.operators.Clustering.pagerankEdgesWindowed(spark, dir).explain("formatted")
    val docs = Tables.table(spark, dir, "documents")
    println("=== q76 BEFORE (plain (doc_id, pos, wh) wins cache) ===")
    graft.operators.TextDedup.dupSubstringCoverageDf(docs, 8, 2, cacheKey = None,
      packed = false).explain("formatted")
    println("=== q76 AFTER (packed (doc_id<<32|pos, wh) wins cache) ===")
    graft.operators.TextDedup.dupSubstringCoverageDf(docs, 8, 2, cacheKey = None,
      packed = true).explain("formatted")
    spark.stop()
  }
}
