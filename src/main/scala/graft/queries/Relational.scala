package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The relational/analytics surface (SURVEY.md §2.3-§2.5) over the driver
 * testdata, each query paired with DuckDB oracle SQL.
 *
 * Numeric policy for oracle-stable results:
 *  - monetary doubles are cast to DECIMAL before aggregation (decimal
 *    sums are exact and order-independent → bit-identical across
 *    engines and shuffle schedules);
 *  - final OUTPUT columns are never DECIMAL and never a DuckDB
 *    integer-sum (HUGEINT): the harness reads the Spark side via
 *    arrow (python Decimal) and the oracle side via pandas (float64),
 *    so a DECIMAL output hash-mismatches on trailing zeros and a
 *    HUGEINT renders as '123.0' vs '123'. Exact decimal sums are cast
 *    to DOUBLE at the very end on BOTH sides (same exact value → same
 *    IEEE double), and DuckDB integer sums are CAST(... AS BIGINT);
 *  - ratios/averages divide exact decimals cast to double and round —
 *    both engines perform the identical IEEE division;
 *  - date anchors are fixed literals, never CURRENT_DATE (SURVEY §7
 *    risk 3: no nondeterminism in oracle comparisons).
 *
 * Scale notes: every aggregation here is a partial-agg → shuffle →
 * final-agg plan on the group keys; dimension tables in joins are
 * broadcast explicitly; sorts happen after aggregation (post-shuffle
 * cardinality, not input cardinality).
 */
object Relational {

  private val D18_2 = DecimalType(18, 2)

  private def dec(c: org.apache.spark.sql.Column) = c.cast(D18_2)

  /** exact decimal → final double output (see numeric policy above) */
  private def asDbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // Reference README flagship: "Risk Analysis by Region and Merchant
    // Category" (kfs/README.md:169-185) — grouped conditional
    // aggregation + interval date filter + HAVING + ORDER BY, mapped to
    // the orders table (region→o_orderpriority, category→o_orderstatus,
    // HIGH-risk→price bands). Q1-Q10 of SURVEY §2.3 in one query.
    Q("flagship_risk_analysis", bench = true, fn = (s, dir) => {
      Td.orders(s, dir)
        .filter(col("o_orderdate") >= expr("DATE '1998-08-01' - INTERVAL '400' DAY"))
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("total_orders"),
          asDbl(sum(dec(col("o_totalprice")))).as("total_amount"),
          count(when(col("o_totalprice") > 200000, 1)).as("high_value_count"),
          count(when(col("o_totalprice") < 50000, 1)).as("low_value_count"),
          countDistinct(col("o_custkey")).as("unique_customers"))
        .filter(col("high_value_count") > 0)
        .orderBy(col("high_value_count").desc, col("o_orderpriority").asc,
          col("o_orderstatus").asc)
    }, oracle = Some("""
      SELECT o_orderpriority, o_orderstatus,
             count(*) AS total_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
             count(CASE WHEN o_totalprice > 200000 THEN 1 END) AS high_value_count,
             count(CASE WHEN o_totalprice < 50000 THEN 1 END) AS low_value_count,
             count(DISTINCT o_custkey) AS unique_customers
      FROM orders
      WHERE o_orderdate >= DATE '1998-08-01' - INTERVAL '400' DAY
      GROUP BY o_orderpriority, o_orderstatus
      HAVING count(CASE WHEN o_totalprice > 200000 THEN 1 END) > 0
      ORDER BY high_value_count DESC, o_orderpriority ASC, o_orderstatus ASC""")),

    // Reference README: "Hourly Transaction Pattern Analysis"
    // (kfs/README.md:189-205) on the events stream table: per-hour
    // grouped aggregation, COUNT(DISTINCT), conditional counts.
    Q("hourly_pattern", bench = true, fn = (s, dir) => {
      Td.events(s, dir)
        .groupBy(to_date(col("ts")).as("event_date"), hour(col("ts")).as("event_hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("event_count"),
          countDistinct(col("user_id")).as("unique_users"),
          asDbl(sum(dec(col("value")))).as("total_value"),
          count(when(col("value") > 150, 1)).as("high_value_events"))
        .orderBy(col("event_date").asc, col("event_hour").asc,
          col("event_type").asc)
    }, oracle = Some("""
      SELECT CAST(ts AS DATE) AS event_date, hour(ts::TIMESTAMP) AS event_hour, event_type,
             count(*) AS event_count,
             count(DISTINCT user_id) AS unique_users,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             count(CASE WHEN value > 150 THEN 1 END) AS high_value_events
      FROM events
      GROUP BY 1, 2, 3
      ORDER BY event_date ASC, event_hour ASC, event_type ASC""")),

    // Full-table scan + deterministic ORDER BY + LIMIT (kfs/README.md:144)
    Q("scan_orderby_limit", fn = (s, dir) =>
      Td.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          asDbl(dec(col("o_totalprice"))).as("o_totalprice_dec"))
        .orderBy(col("o_orderkey")).limit(100),
      oracle = Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice_dec
      FROM orders ORDER BY o_orderkey LIMIT 100""")),

    // TPC-H Q1 shape: the canonical multi-aggregate hash aggregation.
    Q("agg_pricing_summary", bench = true, fn = (s, dir) => {
      val li = Td.lineitem(s, dir)
        .filter(col("l_shipdate") <= expr("DATE '1998-09-02'"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asDbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          asDbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(D18_2) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          round(dec(sum(dec(col("l_quantity")))).cast(DoubleType) / count(lit(1)), 4)
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, oracle = Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*), 4) AS avg_qty,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= DATE '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // Conditional aggregation variants (SURVEY Q4): CASE WHEN inside
    // count/sum, plus a projection-level CASE bucket.
    Q("conditional_agg", fn = (s, dir) =>
      Td.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
          asDbl(sum(when(col("o_totalprice") > 100000, dec(col("o_totalprice")))
            .otherwise(lit(0).cast(D18_2)))).as("big_total"))
        .orderBy(col("o_orderpriority")),
      oracle = Some("""
      SELECT o_orderpriority, count(*) AS n,
             count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
             CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
             CAST(sum(CASE WHEN o_totalprice > 100000 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // CASE-bucketed projection + group on the computed column.
    Q("case_when_buckets", fn = (s, dir) =>
      Td.orders(s, dir)
        .select(when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      oracle = Some("""
      SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 150000 THEN 'medium'
                  ELSE 'large' END AS bucket,
             count(*) AS n
      FROM orders GROUP BY 1 ORDER BY bucket""")),

    // Exact distinct counting per group (SURVEY Q5).
    Q("distinct_count", fn = (s, dir) =>
      Td.orders(s, dir).groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("unique_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus")),
      oracle = Some("""
      SELECT o_orderstatus, count(DISTINCT o_custkey) AS unique_customers,
             count(*) AS n_orders
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Interval date arithmetic in the predicate (SURVEY Q6/F2/F3) —
    // fixed anchor, constant-folded by Catalyst, prunes at the scan.
    Q("date_interval_filter", fn = (s, dir) =>
      Td.orders(s, dir)
        .filter(col("o_orderdate") >= expr("DATE '1998-08-01' - INTERVAL '90' DAY") &&
          col("o_orderdate") < expr("DATE '1998-08-01'"))
        .agg(count(lit(1)).as("n"),
          asDbl(sum(dec(col("o_totalprice")))).as("total"),
          min(to_date(col("o_orderdate"))).as("first_date"),
          max(to_date(col("o_orderdate"))).as("last_date")),
      oracle = Some("""
      SELECT count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             min(CAST(o_orderdate AS DATE)) AS first_date,
             max(CAST(o_orderdate AS DATE)) AS last_date
      FROM orders
      WHERE o_orderdate >= DATE '1998-08-01' - INTERVAL '90' DAY
        AND o_orderdate < DATE '1998-08-01'""")),

    // HAVING on an aggregate alias (SURVEY Q7) + multi-direction sort (Q8).
    Q("having_orderby", fn = (s, dir) =>
      Td.lineitem(s, dir).groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"),
          asDbl(sum(dec(col("l_extendedprice")))).as("supplier_revenue"))
        .filter(col("n_items") > 20)
        .orderBy(col("supplier_revenue").desc, col("l_suppkey").asc)
        .limit(50),
      oracle = Some("""
      SELECT l_suppkey, count(*) AS n_items,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS supplier_revenue
      FROM lineitem GROUP BY l_suppkey
      HAVING count(*) > 20
      ORDER BY supplier_revenue DESC, l_suppkey ASC LIMIT 50""")),

    // Variance/stddev from exact decimal sums (order-independent), final
    // arithmetic in IEEE double — engine-portable statistical moments.
    Q("stats_moments", fn = (s, dir) => {
      val li = Td.lineitem(s, dir)
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("s1"),
          sum((dec(col("l_quantity")) * dec(col("l_quantity"))).cast(DecimalType(38, 4)))
            .cast(DecimalType(38, 4)).as("s2"))
        .select(col("l_returnflag"), col("n"),
          round(col("s1").cast(DoubleType) / col("n"), 4).as("mean_qty"),
          round((col("s2").cast(DoubleType) - col("s1").cast(DoubleType) *
            col("s1").cast(DoubleType) / col("n")) / (col("n") - 1), 4).as("var_qty"))
        .orderBy(col("l_returnflag"))
    }, oracle = Some("""
      WITH t AS (
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s1,
               CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS s2
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             round(CAST(s1 AS DOUBLE) / n, 4) AS mean_qty,
             round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1), 4) AS var_qty
      FROM t ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    // Joins (SURVEY §2.5): star join with broadcast dims; semi; anti;
    // outer; non-equi range.

    Q("join_star_revenue", bench = true, fn = (s, dir) => {
      val li = Td.lineitem(s, dir)
      val o = Td.orders(s, dir)
      val c = Td.customer(s, dir)
      val n = Td.nation(s, dir)
      // nation/customer are small dims → broadcast both; the only
      // shuffle left is lineitem⋈orders on orderkey.
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(D18_2) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }, oracle = Some("""
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             count(*) AS n_lineitems
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY revenue DESC, n_name ASC""")),

    Q("join_semi", fn = (s, dir) => {
      val o = Td.orders(s, dir)
      val big = Td.lineitem(s, dir).filter(col("l_quantity") >= 48)
      o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }, oracle = Some("""
      SELECT o_orderstatus, count(*) AS n FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    Q("join_anti", fn = (s, dir) => {
      val c = Td.customer(s, dir)
      val o = Td.orders(s, dir)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("customers_without_orders"))
    }, oracle = Some("""
      SELECT count(*) AS customers_without_orders FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    Q("join_left_outer", fn = (s, dir) => {
      val c = Td.customer(s, dir)
      val o = Td.orders(s, dir)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          count(when(col("o_orderkey").isNull, 1)).as("n_no_order_rows"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }, oracle = Some("""
      SELECT c_mktsegment, count(o_orderkey) AS n_orders,
             count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_no_order_rows,
             count(DISTINCT c_custkey) AS n_customers
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Equi + range predicate (theta) join: lineitems shipped within 60
    // days of their order date.
    Q("join_range", bench = true, fn = (s, dir) => {
      val li = Td.lineitem(s, dir)
      val o = Td.orders(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= date_add(col("o_orderdate"), 60))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("fast_shipped"))
        .orderBy(col("o_orderpriority"))
    }, oracle = Some("""
      SELECT o_orderpriority, count(*) AS fast_shipped
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey
       AND l_shipdate >= o_orderdate
       AND l_shipdate <= o_orderdate + INTERVAL '60' DAY
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // Window functions (SURVEY §2.5): top-k per group, running totals,
    // lag/lead, rank family.

    Q("window_topk_per_group", fn = (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Td.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          asDbl(dec(col("o_totalprice"))).as("price"))
        .orderBy(col("o_custkey"), col("rk"))
    }, oracle = Some("""
      SELECT o_custkey, rk, o_orderkey, price FROM (
        SELECT o_custkey, o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders) t
      WHERE rk <= 3 ORDER BY o_custkey, rk""")),

    Q("window_running_total", fn = (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Td.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          asDbl(sum(dec(col("o_totalprice"))).over(w)).as("running_total"))
        .filter(col("o_custkey") < 50)
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }, oracle = Some("""
      SELECT o_custkey, o_orderkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
      FROM orders WHERE o_custkey < 50
      ORDER BY o_custkey, o_orderkey""")),

    Q("window_lag_lead", fn = (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Td.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("odate"),
          to_date(lag(col("o_orderdate"), 1).over(w)).as("prev_date"),
          to_date(lead(col("o_orderdate"), 1).over(w)).as("next_date"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
            .as("days_since_prev"))
        .filter(col("o_custkey") < 30)
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }, oracle = Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
             CAST(lag(o_orderdate, 1) OVER w AS DATE) AS prev_date,
             CAST(lead(o_orderdate, 1) OVER w AS DATE) AS next_date,
             datediff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS days_since_prev
      FROM orders WHERE o_custkey < 30
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
      ORDER BY o_custkey, o_orderkey""")),

    Q("window_rank_family", fn = (s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc)
      // ntile assigns by row position, so its window needs a total
      // order (ties would be engine-dependent otherwise)
      val wTotal = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      Td.lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(wTotal).as("quartile"))
        .orderBy(col("l_returnflag"), col("rnk"),
          col("l_orderkey"), col("l_linenumber"))
    }, oracle = Some("""
      SELECT l_returnflag, l_orderkey, l_linenumber,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             ntile(4) OVER wt AS quartile
      FROM lineitem WHERE l_orderkey < 100
      WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC),
             wt AS (PARTITION BY l_returnflag
                    ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber ASC)
      ORDER BY l_returnflag, rnk, l_orderkey, l_linenumber""")),

    // ------------------------------------------------------------------
    // Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS.

    Q("rollup_agg", fn = (s, dir) =>
      Td.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), asDbl(sum(dec(col("l_quantity")))).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy(col("returnflag"), col("linestatus")),
      oracle = Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus""")),

    Q("cube_agg", fn = (s, dir) =>
      Td.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("n"))
        .orderBy(col("status"), col("priority")),
      oracle = Some("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""")),

    // GROUPING SETS through the SQL surface: the *same* SQL text runs on
    // spark.sql and DuckDB (SURVEY §3.3 — our Athena-equivalent path).
    Q("grouping_sets_sql", fn = (s, dir) => {
      Td.orders(s, dir).createOrReplaceTempView("orders")
      s.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority""")
    }, oracle = Some("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority""")),

    // ------------------------------------------------------------------
    // Set operations.

    Q("union_all_counts", fn = (s, dir) => {
      val a = Td.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey"))
      val b = Td.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1998)
        .select(col("o_custkey"))
      a.unionAll(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey")).limit(200)
    }, oracle = Some("""
      SELECT o_custkey, count(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        UNION ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998) t
      GROUP BY o_custkey ORDER BY o_custkey LIMIT 200""")),

    Q("intersect_keys", fn = (s, dir) => {
      val a = Td.orders(s, dir).filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey"))
      val b = Td.orders(s, dir).filter(year(col("o_orderdate")) === 1998)
        .select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    }, oracle = Some("""
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      ORDER BY o_custkey""")),

    Q("except_keys", fn = (s, dir) => {
      val a = Td.customer(s, dir).select(col("c_custkey"))
      val b = Td.orders(s, dir).select(col("o_custkey").as("c_custkey"))
      a.except(b).orderBy(col("c_custkey"))
    }, oracle = Some("""
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders
      ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // Arrays / JSON / semi-structured (SURVEY §2.5 array row + F11).

    Q("explode_tokens", fn = (s, dir) =>
      Td.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc).limit(25),
      oracle = Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY word ORDER BY n DESC, word ASC LIMIT 25""")),

    Q("json_extract", fn = (s, dir) =>
      Td.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          count(when(col("k") > 50, 1)).as("n_high"))
        .orderBy(col("event_type")),
      oracle = Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_high
      FROM events GROUP BY event_type ORDER BY event_type""")),

    Q("array_agg_sorted", fn = (s, dir) =>
      Td.documents(s, dir)
        .groupBy(col("lang"))
        .agg(array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang")),
      oracle = Some("""
      SELECT lang,
             array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
             count(*) AS n_docs
      FROM documents GROUP BY lang ORDER BY lang""")),

    // ------------------------------------------------------------------
    // Exact + approximate percentiles / distinct (SURVEY §2.5 approx row).

    Q("percentile_exact", fn = (s, dir) =>
      Td.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy(col("l_returnflag")),
      oracle = Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS median_qty,
             quantile_cont(l_quantity, 0.9) AS p90_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // HLL sketch values differ across engines by construction, so the
    // checkable contract is "within the sketch's error envelope of the
    // exact count": the query emits the exact count (cross-engine
    // verifiable) plus a tolerance flag computed against Spark's HLL;
    // the oracle recomputes the exact count and asserts the flag.
    Q("approx_count_distinct", fn = (s, dir) =>
      Td.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx") - col("exact_parts")).cast(DoubleType) /
            col("exact_parts") <= 0.05).as("hll_within_5pct"))
        .orderBy(col("l_returnflag")),
      oracle = Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             true AS hll_within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Same contract for the quantile sketch: exact percentiles are the
    // verifiable values; the sketch must land within 1% relative error.
    Q("approx_percentile", fn = (s, dir) => {
      val li = Td.lineitem(s, dir)
        .select(col("l_extendedprice").cast(DoubleType).as("p"))
      val agged = li.agg(
        expr("percentile(p, array(0.5, 0.95, 0.99))").as("exact"),
        expr("approx_percentile(p, array(0.5, 0.95, 0.99), 10000)").as("approx"))
      def ok(i: Int) = (abs(element_at(col("approx"), i) - element_at(col("exact"), i)) /
        element_at(col("exact"), i) <= 0.01)
      agged.select(
        round(element_at(col("exact"), 1), 4).as("exact_p50"),
        round(element_at(col("exact"), 2), 4).as("exact_p95"),
        round(element_at(col("exact"), 3), 4).as("exact_p99"),
        ok(1).as("p50_within_1pct"), ok(2).as("p95_within_1pct"),
        ok(3).as("p99_within_1pct"))
    }, oracle = Some("""
      SELECT round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS exact_p50,
             round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95), 4) AS exact_p95,
             round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 4) AS exact_p99,
             true AS p50_within_1pct, true AS p95_within_1pct,
             true AS p99_within_1pct
      FROM lineitem""")),

    // ------------------------------------------------------------------
    // Event-time windows (streaming semantics, batch-checkable oracle).

    Q("event_tumbling_window", fn = (s, dir) =>
      Td.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), asDbl(sum(dec(col("value")))).as("total_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"),
          col("total_value"))
        .orderBy(col("wstart"), col("event_type")),
      oracle = Some("""
      SELECT date_trunc('hour', ts::TIMESTAMP) AS wstart, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""")),

    // Session windows (30-min gap) per user — oracle via the classic
    // gaps-and-islands rewrite.
    Q("event_session_window", fn = (s, dir) =>
      Td.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
        .orderBy(col("user_id"), col("session_start")),
      oracle = Some("""
      WITH marked AS (
        SELECT user_id, ts::TIMESTAMP AS ts,
               CASE WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER (
                 PARTITION BY user_id ORDER BY ts) > INTERVAL '30' MINUTE
                 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked)
      SELECT user_id, min(ts) AS session_start, count(*) AS n_events
      FROM sessions GROUP BY user_id, session_id
      ORDER BY user_id, session_start"""))
  )
}
