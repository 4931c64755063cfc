package graft

import org.apache.spark.sql.functions._

/** Round-13 probe (round-12 verdict item 5): q142's Pregel rounds are the
  * largest single sf10 cost (~23 s). Head-to-head at SPARK_GRAFT_SF_DIR,
  * both over the SAME cached windowed edge frame:
  *
  *  - adopted       — each round joins the (node, r) rank frame into the
  *                    edge frame and computes contrib = r div deg per edge
  *                    row before the dst groupBy (partial-agg bounded);
  *  - contrib-first — each round first computes contrib on the NODE-sized
  *                    frame (ranks ⋈ nodeDeg), so the edge join ships
  *                    (dst, contrib) instead of (dst, r, deg) — the
  *                    "combiner before the round-join" shape. Costs one
  *                    extra node-sized join per round.
  *
  * Both run the identical integer update; the probe prints a checksum of
  * the final supplier ranks so a divergence is impossible to miss.
  * Results → BENCH_NOTES; adopt only on a win.
  */
object Q142Probe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.session("q142-probe4", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = graft.operators.Clustering.pagerankEdgesWindowed(spark, sfDir).cache()
    val nEdges = edges.count()
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum($"rank_ppm" * ($"s_suppkey" % 997 + 1))).head.getLong(0)
    Seq("adopted", "contrib-first").foreach { variant =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val out = variant match {
          case "adopted" =>
            graft.operators.Clustering.pagerankFromEdges(spark, edges, 5)
          case _ =>
            val nodeDeg = edges.select($"src".as("node"), $"deg").distinct()
            var ranks = nodeDeg.select($"node", lit(1000000L).as("r"))
            for (_ <- 1 to 5) {
              val contribs = ranks.join(nodeDeg.hint("SHUFFLE_HASH"), "node")
                .select($"node", expr("r div deg").as("contrib"))
              ranks = edges.join(contribs.hint("SHUFFLE_HASH"),
                  edges("src") === contribs("node"))
                .select($"dst", $"contrib")
                .groupBy($"dst").agg(sum($"contrib").as("c"))
                .select($"dst".as("node"),
                  (lit(150000L) + expr("(85 * c) div 100")).as("r"))
            }
            val sdeg = edges.select($"src", $"deg").distinct()
              .where($"src" % 2 === 1)
            ranks.where($"node" % 2 === 1)
              .join(sdeg, ranks("node") === sdeg("src"))
              .select(expr("(node - 1) div 2").as("s_suppkey"),
                $"deg".as("degree"), $"r".as("rank_ppm"))
              .orderBy($"s_suppkey")
        }
        val ck = checksum(out)
        println(f"Q142P4 $variant%-14s pass=$pass edges=$nEdges%,d " +
          f"rounds=${(System.nanoTime() - t0) / 1e9}%.1f s checksum=$ck")
      }
    }
    spark.stop()
  }
}
