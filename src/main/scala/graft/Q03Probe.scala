package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measurement probe for q03's fact-fact join strategy (the one known
  * spill in the suite: 617 MB sort-merge spill at sf10, flagged since
  * round 6). Runs the q03 shape three ways on SPARK_GRAFT_SF_DIR and
  * prints wall seconds + spill/shuffle bytes per variant:
  *   smj       — the registered plan (Catalyst+AQE default: sort-merge)
  *   shj       — ORDERS (the smaller, filtered side) carries a
  *               shuffle_hash hint: no sort, no sort spill; the hash
  *               build must fit per-task memory (hinting the lineitem
  *               side instead OOMs the hashed relation — measured)
  *   bucketed  — both sides pre-bucketed by orderkey into the warehouse
  *               (the write is timed separately; steady-state reads join
  *               with zero Exchange AND zero sort — the 100 TB answer
  *               when the join key is stable across queries)
  * Like IvfSweep, this is measurement tooling, not a registered query;
  * results and the adopt/reject decision live in BENCH_NOTES.
  */
object Q03Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfgen/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.session("q03-probe", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val spill = new AtomicLong; val shWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill.addAndGet(m.diskBytesSpilled)
          shWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def settle(): Unit = {
      var prev = (-1L, -1L); var cur = (spill.get, shWrite.get); var n = 0
      while (prev != cur && n < 40) { Thread.sleep(50); prev = cur; cur = (spill.get, shWrite.get); n += 1 }
    }
    def run(name: String, build: => DataFrame): Unit = {
      settle()
      val (s0, w0) = (spill.get, shWrite.get)
      val t0 = System.nanoTime()
      build.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      settle()
      val mb = 1.0 / (1 << 20)
      println(f"PROBE $name%-10s ${dt}%7.2f s  spill ${(spill.get - s0) * mb}%8.1f MB  shuffle_w ${(shWrite.get - w0) * mb}%8.1f MB")
    }

    def agg(joined: DataFrame): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
      joined.groupBy($"o_orderpriority")
        .agg(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec($"l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    }
    def orders = Tables.table(spark, sfDir, "orders").where($"o_orderstatus" =!= "F")
    def lineitem = Tables.table(spark, sfDir, "lineitem").where($"l_discount" > 0.0)

    // warm the page cache once, untimed
    orders.count(); lineitem.count(): Unit

    (1 to 2).foreach { _ =>
      run("smj", agg(orders.join(lineitem, $"o_orderkey" === $"l_orderkey")))
      run("shj", agg(orders.hint("shuffle_hash").join(lineitem, $"o_orderkey" === $"l_orderkey")))
    }

    // bucketed: one-time write (timed), then the steady-state join
    val nb = 32
    val t0 = System.nanoTime()
    Tables.table(spark, sfDir, "orders").write.mode("overwrite")
      .bucketBy(nb, "o_orderkey").sortBy("o_orderkey").saveAsTable("q03probe_orders")
    Tables.table(spark, sfDir, "lineitem").write.mode("overwrite")
      .bucketBy(nb, "l_orderkey").sortBy("l_orderkey").saveAsTable("q03probe_lineitem")
    println(f"PROBE bucket-write ${(System.nanoTime() - t0) / 1e9}%7.2f s (one-time)")
    def bo = spark.table("q03probe_orders").where($"o_orderstatus" =!= "F")
    def bl = spark.table("q03probe_lineitem").where($"l_discount" > 0.0)
    (1 to 2).foreach { _ =>
      run("bucketed", agg(bo.join(bl, $"o_orderkey" === $"l_orderkey")))
    }
    // cross-check: all three variants agree
    val a = agg(orders.join(lineitem, $"o_orderkey" === $"l_orderkey")).collect().toSeq
    val b = agg(orders.hint("shuffle_hash").join(lineitem, $"o_orderkey" === $"l_orderkey")).collect().toSeq
    val c = agg(bo.join(bl, $"o_orderkey" === $"l_orderkey")).collect().toSeq
    println(s"PROBE agree smj==shj:${a == b} smj==bucketed:${a == c}")
    spark.sql("DROP TABLE IF EXISTS q03probe_orders")
    spark.sql("DROP TABLE IF EXISTS q03probe_lineitem")
    spark.stop()
  }
}
