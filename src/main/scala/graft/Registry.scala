package graft

import graft.operators._

/** Central declaration list: every implemented operator from SURVEY.md §2
  * with its DuckDB oracle twin (None → driver records rows-only check).
  *
  * Oracle-authoring rules (keep both sides in lock-step):
  *  - column names identical to the Spark result (driver sorts by name);
  *  - money sums via Det.dsumSql (exact DECIMAL, order-independent);
  *  - timestamps surfaced as `epoch_us(..)` BIGINT (Spark: `unix_micros`);
  *  - `events.ts` is TIMESTAMP_NS in DuckDB → `ts::TIMESTAMP` truncates to
  *    µs exactly like Spark's `ts DIV 1000` (both toward zero, data > 0);
  *  - window-function ints cast to INT (Spark row_number is 32-bit);
  *  - conditional sums cast to BIGINT (DuckDB SUM(int) is HUGEINT);
  *  - full tie-break ORDER BY everywhere.
  */
object Registry {
  private val ds = Det.dsumSql _
  private val da = Det.davgSql _

  val relational: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", Relational.q1PricingSummary, Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${ds("l_quantity", 2)} AS sum_qty,
        ${ds("l_extendedprice", 2)} AS sum_base_price,
        ${ds("l_extendedprice * (1.0 - l_discount)", 2)} AS sum_disc_price,
        ${da("l_quantity", 4)} AS avg_qty,
        ${da("l_extendedprice", 4)} AS avg_price,
        ${da("l_discount", 4)} AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    QueryDef("q3_join_agg", Relational.q3JoinAgg, Some(s"""
      SELECT l_orderkey,
        ${ds("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue,
        epoch_us(o_orderdate) AS o_orderdate_us,
        o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-03-15'
        AND l_shipdate > TIMESTAMP '1995-03-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")),

    QueryDef("q5_local_supplier", Relational.q5LocalSupplier, Some(s"""
      SELECT n_name,
        ${ds("l_extendedprice * (1.0 - l_discount)", 2)} AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1994-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")),

    QueryDef("p2_filter_predicates", Relational.p2FilterPredicates, Some(s"""
      SELECT o_orderstatus, o_orderpriority,
        COUNT(*) AS n,
        ${ds("o_totalprice", 2)} AS total
      FROM orders
      WHERE o_orderstatus IN ('O','F')
        AND o_totalprice BETWEEN 1000.0 AND 200000.0
        AND (o_orderpriority LIKE '%URGENT%' OR o_orderpriority LIKE '3%')
        AND o_custkey IS NOT NULL
      GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus, o_orderpriority""")),

    QueryDef("p3_case_when", Relational.p3CaseWhen, Some(s"""
      SELECT qty_band, COUNT(*) AS n,
        CAST(SUM(CASE WHEN disc_flag = -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS no_discount,
        ${da("l_extendedprice", 4)} AS avg_price
      FROM (
        SELECT l_extendedprice,
          CASE WHEN l_quantity < 10 THEN 'low'
               WHEN l_quantity < 30 THEN 'mid'
               ELSE 'high' END AS qty_band,
          COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_flag
        FROM lineitem)
      GROUP BY qty_band
      ORDER BY qty_band""")),

    QueryDef("j2_outer_join", Relational.j2OuterJoin, Some("""
      SELECT c_mktsegment,
        COUNT(o_orderkey) AS n_orders,
        CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customers_no_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")),

    QueryDef("j3_semi_anti", Relational.j3SemiAnti, Some("""
      SELECT c_mktsegment,
        CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
        CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
      FROM customer c
      GROUP BY c_mktsegment
      HAVING SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) > 0
          OR SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) > 0
      ORDER BY c_mktsegment""")),

    QueryDef("j5_range_join", Relational.j5RangeJoin, Some(s"""
      SELECT s_nationkey, COUNT(*) AS n_pairs,
        ${da("s_acctbal - c_acctbal", 4)} AS avg_gap
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      GROUP BY s_nationkey
      ORDER BY s_nationkey""")),

    QueryDef("j6_cross", Relational.j6Cross, Some("""
      SELECT r_name, n_name,
        CAST(r_regionkey = n_regionkey AS INT) AS is_home
      FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""")),

    QueryDef("a2_distinct", Relational.a2Distinct, Some("""
      SELECT o_orderstatus,
        COUNT(DISTINCT o_custkey) AS n_custs,
        COUNT(DISTINCT o_orderpriority) AS n_prios,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")),

    QueryDef("a3_approx_distinct", Relational.a3ApproxDistinct, None),

    QueryDef("a4_rollup", Relational.a4Rollup, Some(s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        COALESCE(l_linestatus, 'ALL') AS linestatus,
        ${ds("l_quantity", 2)} AS sum_qty,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""")),

    QueryDef("a5_collect_set", Relational.a5CollectSet, Some("""
      SELECT user_id,
        array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        COUNT(*) AS n_events
      FROM events
      GROUP BY user_id
      ORDER BY user_id""")),

    QueryDef("a6_stats", Relational.a6Stats, Some("""
      SELECT l_returnflag,
        ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),

    QueryDef("w1_rank", Relational.w1Rank, Some("""
      SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal,
        CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk, CAST(drk AS INT) AS drk
      FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
      WHERE rn <= 5
      ORDER BY c_mktsegment, rn""")),

    QueryDef("w2_lag_lead", Relational.w2LagLead, Some(s"""
      SELECT user_id,
        ${da("gap_us", 2)} AS avg_gap_us,
        CAST(SUM(CASE WHEN prev_type = event_type THEN 1 ELSE 0 END) AS BIGINT) AS n_repeats
      FROM (
        SELECT user_id, event_type,
          LAG(event_type) OVER w AS prev_type,
          epoch_us(ts::TIMESTAMP) - LAG(epoch_us(ts::TIMESTAMP)) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id))
      GROUP BY user_id
      ORDER BY user_id""")),

    QueryDef("w3_moving_agg", Relational.w3MovingAgg, Some("""
      SELECT user_id, event_id,
        ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
        ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
      FROM events
      ORDER BY user_id, event_id""")),

    QueryDef("window_topk", Relational.windowTopK, Some("""
      SELECT user_id, event_id, ROUND(value, 4) AS value, CAST(rn AS INT) AS rn
      FROM (
        SELECT user_id, event_id, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        FROM events)
      WHERE rn <= 3
      ORDER BY user_id, rn""")),

    QueryDef("tumbling_window", Relational.tumblingWindow, Some(s"""
      SELECT epoch_us(date_trunc('hour', ts::TIMESTAMP)) AS window_start_us,
        event_type, COUNT(*) AS n, ${da("value", 4)} AS avg_value
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2""")),

    QueryDef("o1_sort_limit", Relational.o1SortLimit, Some("""
      SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice, o_orderstatus
      FROM orders
      ORDER BY totalprice DESC, o_orderkey
      LIMIT 25""")),

    QueryDef("o3_union", Relational.o3Union, Some("""
      SELECT nk, COUNT(*) AS n_all, COUNT(DISTINCT src) AS n_sources
      FROM (
        SELECT c_nationkey AS nk, 'c' AS src FROM customer
        UNION ALL
        SELECT s_nationkey AS nk, 's' AS src FROM supplier)
      GROUP BY nk
      ORDER BY nk""")),

    QueryDef("o4_set_ops", Relational.o4SetOps, Some("""
      SELECT nk, 'both' AS side FROM
        (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      UNION ALL
      SELECT nk, 'customer_only' AS side FROM
        (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      ORDER BY side, nk""")),
  )

  def all: Seq[QueryDef] = relational

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(o => d.name -> o.stripMargin.trim.replaceAll("\\s+", " "))).toMap
}
