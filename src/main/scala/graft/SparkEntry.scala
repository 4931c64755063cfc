package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{EventOps, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 that the engine implements registers
  * here: a DataFrame query over the driver testdata plus (where
  * SQL-expressible) an equivalent DuckDB oracle. Column names and types are
  * aligned on both sides (driver hashes values after sorting columns by
  * name); non-integer outputs are exact-decimal-derived doubles so the hash
  * is deterministic across engines.
  */
object SparkEntry {

  /** Flagship: the reference's `cat` archive range scan
    * (`/root/reference/triton.go:344-367`) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    EventOps.catRange(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q02_customer_by_region" -> ((s, d) => Relational.customerByRegion(s, d)),
    "q03_revenue_by_priority" -> ((s, d) => Relational.revenueByPriority(s, d)),
    "q04_top_orders" -> ((s, d) => Relational.topOrders(s, d)),
    "q05_top_orders_per_customer" -> ((s, d) => Relational.topOrdersPerCustomer(s, d)),
    "q06_active_customers_by_segment" -> ((s, d) => Relational.activeCustomersBySegment(s, d)),
    "q07_idle_customers_by_nation" -> ((s, d) => Relational.idleCustomersByNation(s, d)),
    "q08_customer_rollup" -> ((s, d) => Relational.customerRollup(s, d)),
    "q09_nation_presence" -> ((s, d) => Relational.nationPresence(s, d)),
    "q10_cat_range" -> ((s, d) => EventOps.catRange(s, d)),
    "q11_union_slices" -> ((s, d) => EventOps.unionSlices(s, d)),
    "q12_hourly_rollup" -> ((s, d) => EventOps.hourlyRollup(s, d)),
    "q13_lag_stats" -> ((s, d) => EventOps.lagStats(s, d)),
    "q14_decode_props" -> ((s, d) => EventOps.decodeProps(s, d)),
    "q15_sessionize" -> ((s, d) => EventOps.sessionize(s, d)),
    "q16_asof_last_click" -> ((s, d) => EventOps.asOfLastClick(s, d)),
    "q17_archive_keys" -> ((s, d) => EventOps.archiveKeys(s, d)),
    "q18_user_cardinality" -> ((s, d) => EventOps.userCardinality(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_customer_by_region" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q03_revenue_by_priority" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderstatus <> 'F' AND l_discount > 0.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q04_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q05_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
        |  FROM orders) t WHERE rk <= 3""".stripMargin,

    "q06_active_customers_by_segment" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q07_idle_customers_by_nation" ->
      """SELECT n_name, count(*) AS n_idle
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q08_customer_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q09_nation_presence" ->
      """WITH c AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
        |     s AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        |SELECT nationkey, 'both' AS presence FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s) t1
        |UNION ALL
        |SELECT nationkey, 'customer_only' AS presence FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s) t2
        |ORDER BY presence, nationkey""".stripMargin,

    "q10_cat_range" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM events
        |WHERE epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-05')
        |  AND epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-10')
        |  AND event_type = 'purchase'
        |ORDER BY ts_us, event_id""".stripMargin,

    "q11_union_slices" ->
      """WITH a AS (SELECT 'early' AS slice, event_type FROM events WHERE epoch_us(ts) < epoch_us(TIMESTAMP '2024-01-03')),
        |     b AS (SELECT 'late' AS slice, event_type FROM events WHERE epoch_us(ts) >= epoch_us(TIMESTAMP '2024-01-28'))
        |SELECT slice, event_type, count(*) AS n
        |FROM (SELECT * FROM a UNION ALL SELECT * FROM b) t
        |GROUP BY slice, event_type ORDER BY slice, event_type""".stripMargin,

    "q12_hourly_rollup" ->
      """SELECT CAST(epoch_us(date_trunc('hour', ts)) // 1000000 AS BIGINT) AS hour_epoch,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_lag_stats" ->
      """WITH per AS (SELECT event_type AS shard, max(epoch_us(ts)) AS last_us, count(*) AS n_records FROM events GROUP BY 1),
        |     h AS (SELECT max(epoch_us(ts)) AS head_us FROM events)
        |SELECT shard, n_records, CAST((head_us - last_us) // 1000000 AS BIGINT) AS age_sec
        |FROM per, h ORDER BY shard""".stripMargin,

    "q14_decode_props" ->
      """SELECT event_type,
        |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
        |  CAST(sum(COALESCE(k, 0)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM (SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q15_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |x AS (SELECT user_id, ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS d FROM e)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN d IS NULL OR d > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q16_asof_last_click" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type IN ('purchase', 'click')),
        |x AS (SELECT *,
        |  last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id,
        |  last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
        |  FROM e)
        |SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us, last_click_id, last_click_us
        |FROM x WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,

    "q17_archive_keys" ->
      """WITH k AS (SELECT strftime(ts, '%Y%m%d') || '/events-' || event_type || '-'
        |  || CAST(epoch_us(ts) // 1000000 AS BIGINT) || '.tri' AS key FROM events)
        |SELECT regexp_extract(key, '^([0-9]{8})/', 1) AS kdate,
        |  regexp_extract(key, '^[0-9]{8}/([a-z_]+)-', 1) AS stream,
        |  regexp_extract(key, '^[0-9]{8}/[a-z_]+-([a-z_]+)-', 1) AS client,
        |  count(*) AS n_files
        |FROM k GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,
    // q18_user_cardinality: approx_count_distinct column is engine-specific
    // → rows-only check (no oracle) by design.
  )
}
