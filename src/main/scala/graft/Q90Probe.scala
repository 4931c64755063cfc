package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measurement probe for q90's fact-side audit strategy (the three
  * lineitem FK edges). Variants on SPARK_GRAFT_SF_DIR:
  *   peredge  — round-9 shape: one scan + narrow anti-join PER EDGE
  *              (3 fact scans)
  *   fusedshj — one wide scan through 3 sequential SHJ left joins
  *   pairs    — one scan, explode to (edge,key), map-side-combined
  *              distinct count, ONE anti-join against the tagged union
  *              of parent key sets, per-edge orphan sum
  * Prints wall seconds + spill/shuffle; all variants must agree.
  */
object Q90Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfgen/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.session("q90-probe", cpus)
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
    def run(name: String, build: => DataFrame): Seq[Seq[Any]] = {
      settle()
      val (s0, w0) = (spill.get, shWrite.get)
      val t0 = System.nanoTime()
      val rows = build.collect().map(_.toSeq).toSeq
      val dt = (System.nanoTime() - t0) / 1e9
      settle()
      val mb = 1.0 / (1 << 20)
      println(f"PROBE $name%-10s ${dt}%7.2f s  spill ${(spill.get - s0) * mb}%8.1f MB  shuffle_w ${(shWrite.get - w0) * mb}%8.1f MB")
      rows
    }

    def li = Tables.table(spark, sfDir, "lineitem").select(
      $"l_orderkey".cast("long").as("ok"),
      $"l_partkey".cast("long").as("pk"),
      $"l_suppkey".cast("long").as("sk"))
    def parentKeys(t: String, k: String) =
      Tables.table(spark, sfDir, t).select(col(k).cast("long").as("k")).distinct()

    def perEdge: DataFrame = perEdgeWith(identity)
    def perEdgeShj: DataFrame = perEdgeWith(_.hint("shuffle_hash"))
    def perEdgeWith(h: DataFrame => DataFrame): DataFrame = {
      def edge(childKey: String, parent: String, parentKey: String): DataFrame = {
        val c = Tables.table(spark, sfDir, "lineitem")
          .select(col(childKey).cast("long").as("k"))
        val p = h(parentKeys(parent, parentKey))
        val orphans = c.join(p, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        c.agg(count(lit(1)).as("n_child_rows")).crossJoin(orphans)
          .select(lit(childKey).as("edge"), $"n_child_rows", $"n_orphans")
      }
      edge("l_orderkey", "orders", "o_orderkey")
        .unionByName(edge("l_partkey", "part", "p_partkey"))
        .unionByName(edge("l_suppkey", "supplier", "s_suppkey"))
        .orderBy($"edge")
    }

    def fusedShj: DataFrame = {
      def keys(t: String, k: String, as: String) =
        parentKeys(t, k).withColumnRenamed("k", as)
          .withColumn(s"hit_$as", lit(1)).hint("shuffle_hash")
      li.join(keys("orders", "o_orderkey", "ok"), Seq("ok"), "left")
        .join(keys("part", "p_partkey", "pk"), Seq("pk"), "left")
        .join(keys("supplier", "s_suppkey", "sk"), Seq("sk"), "left")
        .agg(count(lit(1)).as("n"),
          coalesce(sum(when($"hit_ok".isNull, 1L)), lit(0L)).as("orph_ok"),
          coalesce(sum(when($"hit_pk".isNull, 1L)), lit(0L)).as("orph_pk"),
          coalesce(sum(when($"hit_sk".isNull, 1L)), lit(0L)).as("orph_sk"))
        .select(expr(
          "stack(3, 'l_orderkey', n, orph_ok, 'l_partkey', n, orph_pk, " +
            "'l_suppkey', n, orph_sk) as (edge, n_child_rows, n_orphans)"))
        .orderBy($"edge")
    }

    def pairs: DataFrame = {
      val nChild = li.count()
      val p = li.select(explode(array(
        struct(lit("l_orderkey").as("edge"), $"ok".as("k")),
        struct(lit("l_partkey").as("edge"), $"pk".as("k")),
        struct(lit("l_suppkey").as("edge"), $"sk".as("k")))).as("e"))
        .select($"e.edge", $"e.k")
        .groupBy($"edge", $"k").agg(count(lit(1)).as("cnt"))
      val parents = parentKeys("orders", "o_orderkey").withColumn("edge", lit("l_orderkey"))
        .unionByName(parentKeys("part", "p_partkey").withColumn("edge", lit("l_partkey")))
        .unionByName(parentKeys("supplier", "s_suppkey").withColumn("edge", lit("l_suppkey")))
        .hint("shuffle_hash")
      val orph = p.join(parents, Seq("edge", "k"), "left_anti")
        .groupBy($"edge").agg(sum($"cnt").as("orph"))
      Seq("l_orderkey", "l_partkey", "l_suppkey").toDF("edge")
        .join(orph, Seq("edge"), "left")
        .select($"edge", lit(nChild).as("n_child_rows"),
          coalesce($"orph", lit(0L)).as("n_orphans"))
        .orderBy($"edge")
    }

    li.count(): Unit // warm page cache
    var a: Seq[Seq[Any]] = null; var b: Seq[Seq[Any]] = null
    var c: Seq[Seq[Any]] = null; var d: Seq[Seq[Any]] = null
    (1 to 2).foreach { _ =>
      a = run("peredge", perEdge)
      b = run("fusedshj", fusedShj)
      c = run("pairs", pairs)
      d = run("peredgeshj", perEdgeShj)
    }
    println(s"PROBE agree peredge==fusedshj:${a == b} peredge==pairs:${a == c} peredge==peredgeshj:${a == d}")
    spark.stop()
  }
}
