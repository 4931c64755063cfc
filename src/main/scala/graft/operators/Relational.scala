package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables.table

/** Relational operator surface (SURVEY.md §2.5).
  *
  * The reference has only filter/sort/union/projection
  * (`/root/reference/triton/store_reader.go:54-111`); joins, aggregations,
  * windows, set ops and grouping sets are the engine's extension surface,
  * expressed purely through the DataFrame API so Catalyst plans them
  * (broadcast vs shuffle join, partial aggregation, AQE skew handling).
  *
  * Determinism discipline (DuckDB-oracle hash match): money doubles are cast
  * to DECIMAL before any arithmetic so sums are exact; outputs are only
  * BIGINT / DOUBLE / STRING / BOOLEAN; integer sums on the oracle side are
  * cast back to BIGINT (DuckDB widens to HUGEINT).
  */
object Relational {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Q1-style pricing summary: single shuffle, partial aggregation map-side.
    * At 100 TB this is the canonical "wide scan + low-cardinality groupBy" —
    * 6 groups, so partial agg reduces each task's output to a handful of
    * rows before the exchange.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec($"l_discount"))).cast("double").as("sum_disc_price"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Star-schema join: customer ⋈ nation ⋈ region with both dimension sides
    * explicitly broadcast — zero shuffle for the joins, one for the agg.
    */
  def customerByRegion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = table(s, dir, "customer")
    val nation = broadcast(table(s, dir, "nation"))
    val region = broadcast(table(s, dir, "region"))
    customer
      .join(nation, $"c_nationkey" === $"n_nationkey")
      .join(region, $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(dec($"c_acctbal")).cast("double").as("sum_acctbal"))
      .orderBy($"r_name")
  }

  /** Fact-fact join: orders ⋈ lineitem on orderkey. Both sides large → a
    * shuffle (sort-merge/shuffled-hash picked by Catalyst+AQE). Filters are
    * applied before the join so they push into the parquet scan.
    */
  def revenueByPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = table(s, dir, "orders").where($"o_orderstatus" =!= "F")
    val lineitem = table(s, dir, "lineitem").where($"l_discount" > 0.0)
    orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(12, 2)) - dec($"l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  /** Global top-k: orderBy+limit plans as TakeOrderedAndProject — per-
    * partition heap + driver merge, no full sort, no shuffle of the data.
    */
  def topOrders(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(k)
  }

  /** Per-group top-k via ranking window; one shuffle on the partition key.
    * Tie-broken on the unique order key so results are deterministic.
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    table(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= k)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk".cast("long").as("rk"))
  }

  /** Left-semi join (EXISTS): customers that have at least one 'O' order,
    * aggregated per market segment. Semi-join keeps only the probe side —
    * no row multiplication, broadcastable when the filtered build side is
    * small.
    */
  def activeCustomersBySegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = table(s, dir, "customer")
    val open = table(s, dir, "orders").where($"o_orderstatus" === "O").select($"o_custkey")
    customer.join(open, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no big-ticket order, per
    * nation. The filter shrinks the build side before the anti-join.
    */
  def idleCustomersByNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = table(s, dir, "customer")
    val nation = broadcast(table(s, dir, "nation"))
    val ordered = table(s, dir, "orders")
      .where($"o_totalprice" > 400000.0).select($"o_custkey")
    customer.join(ordered, $"c_custkey" === $"o_custkey", "left_anti")
      .join(nation, $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_idle"))
      .orderBy($"n_name")
  }

  /** Grouping sets via ROLLUP (region, nation): totals at every level in one
    * pass (Expand + single aggregation).
    */
  def customerRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val customer = table(s, dir, "customer")
    val nation = broadcast(table(s, dir, "nation"))
    val region = broadcast(table(s, dir, "region"))
    customer
      .join(nation, $"c_nationkey" === $"n_nationkey")
      .join(region, $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  /** Set ops beyond union: suppliers and customers sharing a nation —
    * intersect/except as distinct set semantics over projected keys.
    */
  def nationPresence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custNations = table(s, dir, "customer").select($"c_nationkey".cast("long").as("nationkey"))
    val suppNations = table(s, dir, "supplier").select($"s_nationkey".cast("long").as("nationkey"))
    val both = custNations.intersect(suppNations).withColumn("presence", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("presence", lit("customer_only"))
    both.unionByName(custOnly).orderBy($"presence", $"nationkey")
  }

  /** Referential-integrity audit (q90): every foreign-key edge of the
    * warehouse schema scored as (child rows, orphan rows) — the
    * data-quality gate a pipeline runs before its joins are trusted,
    * because an inner join silently DROPS orphaned children and an
    * audit is the only place that loss becomes a number. The
    * events.user_id → customer edge is intentionally included even
    * though the synthetic feed violates it: a non-zero orphan count on
    * a soft edge is the informative outcome, not an error.
    *
    * Shape: per-edge left-anti joins against DISTINCT parent keys for
    * the small children — EXCEPT the fact table: lineitem carries THREE
    * of the schema's FK edges, and auditing them as independent edges
    * scans the fact table three times (round 9 measured 3 scans +
    * 183 MB spill at sf10). The three edges fuse into ONE projection of
    * (l_orderkey, l_partkey, l_suppkey) flowing through three left
    * joins on deduplicated parent keys (null parent = orphan flag),
    * one 1-row aggregate, and a stack() unpivot back to edge rows —
    * at 100 TB that is one fact scan instead of three for identical
    * counts. Parent sides stay plain joins so AQE broadcasts the
    * dimension-sized ones and shuffles the fact-sized orders keys.
    * Output is one row per schema edge at any SF.
    */
  def integrityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def edge(child: String, childKey: String, parent: String,
             parentKey: String): DataFrame = {
      val c = table(s, dir, child).select(col(childKey).cast("long").as("k"))
      val p = table(s, dir, parent).select(col(parentKey).cast("long").as("k")).distinct()
      val orphans = c.join(p, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      c.agg(count(lit(1)).as("n_child_rows")).crossJoin(orphans)
        .select(
          lit(s"$child.$childKey").as("edge_child"),
          lit(s"$parent.$parentKey").as("edge_parent"),
          $"n_child_rows", $"n_orphans")
    }
    // fused fact-side audit: one lineitem scan scores all three edges
    val li = table(s, dir, "lineitem").select(
      $"l_orderkey".cast("long").as("ok"),
      $"l_partkey".cast("long").as("pk"),
      $"l_suppkey".cast("long").as("sk"))
    def keys(t: String, k: String, as: String) =
      table(s, dir, t).select(col(k).cast("long").as(as)).distinct()
        .withColumn(s"hit_$as", lit(1))
    val liAgg = li
      .join(keys("orders", "o_orderkey", "ok"), Seq("ok"), "left")
      .join(keys("part", "p_partkey", "pk"), Seq("pk"), "left")
      .join(keys("supplier", "s_suppkey", "sk"), Seq("sk"), "left")
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(when($"hit_ok".isNull, 1L)), lit(0L)).as("orph_ok"),
        coalesce(sum(when($"hit_pk".isNull, 1L)), lit(0L)).as("orph_pk"),
        coalesce(sum(when($"hit_sk".isNull, 1L)), lit(0L)).as("orph_sk"))
    val liEdges = liAgg.select(expr(
      "stack(3, " +
        "'lineitem.l_orderkey', 'orders.o_orderkey', n, orph_ok, " +
        "'lineitem.l_partkey', 'part.p_partkey', n, orph_pk, " +
        "'lineitem.l_suppkey', 'supplier.s_suppkey', n, orph_sk) " +
        "as (edge_child, edge_parent, n_child_rows, n_orphans)"))
    Seq(
      edge("orders", "o_custkey", "customer", "c_custkey"),
      liEdges,
      edge("customer", "c_nationkey", "nation", "n_nationkey"),
      edge("supplier", "s_nationkey", "nation", "n_nationkey"),
      edge("nation", "n_regionkey", "region", "r_regionkey"),
      edge("events", "user_id", "customer", "c_custkey"))
      .reduce(_ unionByName _)
      .orderBy($"edge_child", $"edge_parent")
  }
}
