package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Queries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_pricing_summary" -> ((s, d) => analytics.Queries.pricingSummary(s, d)),
    "a2_topk_revenue" -> ((s, d) => analytics.Queries.topkRevenue(s, d)),
    "a3_multi_join" -> ((s, d) => analytics.Queries.multiJoinVolume(s, d)),
    "a4_window_rank" -> ((s, d) => analytics.Queries.windowRank(s, d)),
    "a5_distinct_stats" -> ((s, d) => analytics.Queries.distinctStats(s, d)),
    "a6_semi_anti" -> ((s, d) => analytics.Queries.semiAnti(s, d)),
    "a7_rollup" -> ((s, d) => analytics.Queries.rollupStats(s, d)),
    "p1_bronze_decode" -> ((s, d) => pipeline.Medallion.p1BronzeDecode(s, d)),
    "p2_silver_clean" -> ((s, d) => pipeline.Medallion.p2SilverClean(s, d)),
    "p3_gold_window15m" -> ((s, d) => pipeline.Medallion.p3GoldWindow(s, d)),
    "p4_gold_sliding" -> ((s, d) => pipeline.Medallion.p4GoldSliding(s, d)),
    "p5_dq_checks" -> ((s, d) => quality.Checks.p5EventChecks(s, d)),
    "p6_stream_gold" -> ((s, d) => streaming.Streams.p6StreamGold(s, d)),
    "p7_backfill_silver" -> ((s, d) => pipeline.Medallion.p7Backfill(s, d)),
  )

  /** DuckDB-runnable ANSI SQL oracle per query key (same parquet
    * tables, registered by table name). Column aliases MUST match the
    * Spark side exactly.
    */
  def oracleSql: Map[String, String] = Map(
    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a2_topk_revenue" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin,
    "a3_multi_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "a4_window_rank" ->
      """SELECT * FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        | FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "a5_distinct_stats" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_custkey) AS n_customers,
        | count(*) AS n_orders,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END),4) AS finished_value,
        | round(avg(o_totalprice),4) AS avg_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "a6_semi_anti" ->
      """SELECT c_custkey,
        | EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "a7_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "p1_bronze_decode" ->
      """SELECT event_id, event_type,
        | CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "p2_silver_clean" ->
      """SELECT event_id, user_id, event_type,
        | date_trunc('minute', ts) AS event_minute,
        | (event_type = 'error') AS is_error,
        | CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events)
        |ORDER BY event_id""".stripMargin,
    "p3_gold_window15m" ->
      """SELECT event_type,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(avg(value),4) AS avg_value,
        | count(*) AS n_events,
        | time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY event_type, time_bucket(INTERVAL '15 minutes', ts)
        |ORDER BY window_start, event_type""".stripMargin,
    "p4_gold_sliding" ->
      """SELECT user_id,
        | round(avg(value),4) AS avg_value,
        | count(*) AS n_events,
        | window_start,
        | window_start + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *, time_bucket(INTERVAL '5 minutes', ts) - (o.i * INTERVAL '5 minutes') AS window_start
        |      FROM events CROSS JOIN (VALUES (0),(1),(2)) o(i))
        |GROUP BY user_id, window_start
        |ORDER BY window_start, user_id""".stripMargin,
    "p5_dq_checks" ->
      """SELECT * FROM (
        | SELECT 'avg_value' AS check_name, round(avg(value),6) AS value,
        |   round(avg(value),6) BETWEEN 0 AND 1000 AS passed FROM events
        | UNION ALL
        | SELECT 'duplicate_count_event_id', CAST(count(event_id) - count(DISTINCT event_id) AS DOUBLE) AS v,
        |   (count(event_id) - count(DISTINCT event_id)) <= 0 FROM events
        | UNION ALL
        | SELECT 'min_value', round(min(value),6) AS v, round(min(value),6) >= 0 FROM events
        | UNION ALL
        | SELECT 'missing_count_user_id', CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS v,
        |   sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) <= 0 FROM events
        | UNION ALL
        | SELECT 'row_count', CAST(count(*) AS DOUBLE) AS v, count(*) > 0 FROM events
        |) ORDER BY check_name""".stripMargin,
    "p6_stream_gold" ->
      """SELECT event_type,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(avg(value),4) AS avg_value,
        | count(*) AS n_events,
        | time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY event_type, time_bucket(INTERVAL '15 minutes', ts)
        |ORDER BY window_start, event_type""".stripMargin,
    "p7_backfill_silver" ->
      """SELECT user_id, count(*) AS n_events,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(sum(value),4) AS total_value,
        | max(date_trunc('minute', ts)) AS last_seen_minute
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
  )
}
