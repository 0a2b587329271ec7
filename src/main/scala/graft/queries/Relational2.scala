package graft.queries

import graft.operators.Aggregators
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Coverage batch 2: scalar-function battery (string/math/date), null
 * semantics, DISTINCT/OFFSET, pivot, subqueries (scalar / IN /
 * correlated EXISTS through the shared SQL surface), value-based
 * window frames, min_by/max_by, bitwise ops, regexp functions, and the
 * typed-Aggregator UDAF surface.
 */
object Relational2 {

  private val D18_2 = DecimalType(18, 2)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(D18_2)

  val all: Seq[Q] = Seq(

    Q("scalar_string_funcs", fn = (s, dir) =>
      Td.part(s, dir).orderBy(col("p_partkey")).limit(50)
        .select(col("p_partkey"),
          upper(col("p_name")).as("u"),
          lower(col("p_type")).as("l"),
          length(col("p_name")).as("len"),
          substring(col("p_name"), 1, 6).as("sub6"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          expr("replace(p_name, ' ', '_')").as("replaced"),
          reverse(col("p_brand")).as("rev"),
          concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
          element_at(split(col("p_name"), " "), 1).as("first_word")),
      oracle = Some("""
      SELECT p_partkey, upper(p_name) AS u, lower(p_type) AS l,
             length(p_name) AS len, substring(p_name, 1, 6) AS sub6,
             lpad(p_brand, 12, '*') AS padded,
             replace(p_name, ' ', '_') AS replaced,
             reverse(p_brand) AS rev,
             concat_ws('-', p_brand, p_type) AS joined,
             string_split(p_name, ' ')[1] AS first_word
      FROM part ORDER BY p_partkey LIMIT 50""")),

    Q("scalar_math_funcs", fn = (s, dir) =>
      Td.lineitem(s, dir).filter(col("l_orderkey") < 20)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(-col("l_quantity")).as("abs_q"),
          round(dec(col("l_extendedprice")) / 7, 2).cast(DoubleType).as("div7"),
          floor(col("l_extendedprice")).as("flr"),
          ceil(col("l_extendedprice")).as("cl"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          pow(col("l_quantity"), 2).as("p2"),
          pmod(col("l_orderkey"), lit(7)).as("m7"),
          signum(col("l_discount") - 0.05).cast(IntegerType).as("sgn"),
          greatest(col("l_discount"), col("l_tax")).as("g"),
          least(col("l_discount"), col("l_tax")).as("lst"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      oracle = Some("""
      SELECT l_orderkey, l_linenumber,
             abs(-l_quantity) AS abs_q,
             CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) / 7, 2) AS DOUBLE) AS div7,
             CAST(floor(l_extendedprice) AS BIGINT) AS flr,
             CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
             round(sqrt(l_quantity), 6) AS sq,
             pow(l_quantity, 2) AS p2,
             l_orderkey % 7 AS m7,
             CAST(sign(l_discount - 0.05) AS INTEGER) AS sgn,
             greatest(l_discount, l_tax) AS g,
             least(l_discount, l_tax) AS lst
      FROM lineitem WHERE l_orderkey < 20
      ORDER BY l_orderkey, l_linenumber""")),

    Q("scalar_date_funcs", fn = (s, dir) =>
      Td.orders(s, dir).orderBy(col("o_orderkey")).limit(100)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          (weekday(col("o_orderdate")) + 1).as("isodow"),
          dayofyear(col("o_orderdate")).as("doy"),
          last_day(col("o_orderdate")).as("eom"),
          to_date(date_trunc("month", col("o_orderdate"))).as("som"),
          date_add(to_date(col("o_orderdate")), 30).as("plus30"),
          add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
          datediff(lit("1998-08-01").cast(DateType), col("o_orderdate")).as("days_to_anchor")),
      oracle = Some("""
      SELECT o_orderkey,
             year(o_orderdate) AS y, month(o_orderdate) AS m,
             day(o_orderdate) AS d, quarter(o_orderdate) AS q,
             isodow(o_orderdate) AS isodow,
             dayofyear(o_orderdate) AS doy,
             last_day(CAST(o_orderdate AS DATE)) AS eom,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
             CAST(o_orderdate AS DATE) + 30 AS plus30,
             CAST(o_orderdate + INTERVAL '2' MONTH AS DATE) AS plus2m,
             datediff('day', CAST(o_orderdate AS DATE), DATE '1998-08-01') AS days_to_anchor
      FROM orders ORDER BY o_orderkey LIMIT 100""")),

    Q("null_handling", fn = (s, dir) =>
      Td.lineitem(s, dir)
        .select(col("l_linestatus"),
          nullif(col("l_returnflag"), lit("N")).as("rf_null"),
          col("l_quantity"))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("rf_null")).as("n_nonnull"),
          countDistinct(col("rf_null")).as("n_distinct_nonnull"),
          max(coalesce(col("rf_null"), lit("ZZZ"))).as("max_coalesced"),
          sum(when(col("rf_null").isNull, dec(col("l_quantity")))).cast(DoubleType).as("sum_where_null"))
        .orderBy(col("l_linestatus")),
      oracle = Some("""
      SELECT l_linestatus, count(*) AS n_rows,
             count(nullif(l_returnflag, 'N')) AS n_nonnull,
             count(DISTINCT nullif(l_returnflag, 'N')) AS n_distinct_nonnull,
             max(coalesce(nullif(l_returnflag, 'N'), 'ZZZ')) AS max_coalesced,
             CAST(sum(CASE WHEN nullif(l_returnflag, 'N') IS NULL
                  THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_where_null
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    Q("distinct_rows", fn = (s, dir) =>
      Td.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      oracle = Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""")),

    Q("limit_offset", fn = (s, dir) =>
      Td.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .offset(40).limit(20),
      oracle = Some("""
      SELECT o_orderkey, o_custkey FROM orders
      ORDER BY o_orderkey LIMIT 20 OFFSET 40""")),

    Q("pivot_counts", fn = (s, dir) =>
      Td.documents(s, dir)
        .groupBy(col("lang"))
        .pivot("source", Seq("src0", "src1", "src2", "src3"))
        .agg(count(lit(1)))
        .select(col("lang"),
          coalesce(col("src0"), lit(0L)).as("src0"),
          coalesce(col("src1"), lit(0L)).as("src1"),
          coalesce(col("src2"), lit(0L)).as("src2"),
          coalesce(col("src3"), lit(0L)).as("src3"))
        .orderBy(col("lang")),
      oracle = Some("""
      SELECT lang,
             count(CASE WHEN source = 'src0' THEN 1 END) AS src0,
             count(CASE WHEN source = 'src1' THEN 1 END) AS src1,
             count(CASE WHEN source = 'src2' THEN 1 END) AS src2,
             count(CASE WHEN source = 'src3' THEN 1 END) AS src3
      FROM documents GROUP BY lang ORDER BY lang""")),

    // Subqueries exercised through the shared SQL surface — the same
    // SQL text runs on spark.sql (Catalyst decorrelates) and DuckDB.
    Q("subquery_scalar_sql", fn = (s, dir) => {
      Td.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(Sql.subqueryScalar)
    }, oracle = Some(Sql.subqueryScalar)),

    Q("subquery_in_sql", fn = (s, dir) => {
      Td.orders(s, dir).createOrReplaceTempView("orders")
      Td.customer(s, dir).createOrReplaceTempView("customer")
      s.sql(Sql.subqueryIn)
    }, oracle = Some(Sql.subqueryIn)),

    Q("subquery_exists_sql", fn = (s, dir) => {
      Td.orders(s, dir).createOrReplaceTempView("orders")
      Td.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql(Sql.subqueryExists)
    }, oracle = Some(Sql.subqueryExists)),

    Q("window_first_last", fn = (s, dir) => {
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Td.orders(s, dir).filter(col("o_custkey") < 40)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(full).as("first_order"),
          last(col("o_orderkey")).over(full).as("last_order"),
          count(lit(1)).over(full).as("n_orders"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }, oracle = Some("""
      SELECT o_custkey, o_orderkey,
             first_value(o_orderkey) OVER w AS first_order,
             last_value(o_orderkey) OVER w AS last_order,
             count(*) OVER w AS n_orders
      FROM orders WHERE o_custkey < 40
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")),

    Q("window_percent_rank", fn = (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderkey").asc)
      Td.orders(s, dir).filter(col("o_orderkey") < 200)
        .select(col("o_orderstatus"), col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    }, oracle = Some("""
      SELECT o_orderstatus, o_orderkey,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd
      FROM orders WHERE o_orderkey < 200
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC)
      ORDER BY o_orderstatus, o_orderkey""")),

    Q("agg_minmax_by", fn = (s, dir) =>
      Td.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(min(col("o_orderpriority")).as("min_prio"),
          max(col("o_orderpriority")).as("max_prio"),
          max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_prio"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("earliest_prio"))
        .orderBy(col("o_orderstatus")),
      oracle = Some("""
      SELECT o_orderstatus,
             min(o_orderpriority) AS min_prio,
             max(o_orderpriority) AS max_prio,
             arg_max(o_orderpriority, o_orderkey) AS latest_prio,
             arg_min(o_orderpriority, o_orderkey) AS earliest_prio
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    Q("bitwise_ops", fn = (s, dir) =>
      Td.lineitem(s, dir).filter(col("l_orderkey") < 50)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(col("l_partkey")).as("band"),
          col("l_orderkey").bitwiseOR(col("l_partkey")).as("bor"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("bxor"),
          shiftleft(col("l_linenumber"), 3).as("shl"),
          shiftright(col("l_orderkey"), 1).as("shr"),
          bit_count(col("l_orderkey")).as("bits"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      oracle = Some("""
      SELECT l_orderkey, l_linenumber,
             l_orderkey & l_partkey AS band,
             l_orderkey | l_partkey AS bor,
             xor(l_orderkey, l_partkey) AS bxor,
             l_linenumber << 3 AS shl,
             l_orderkey >> 1 AS shr,
             bit_count(l_orderkey) AS bits
      FROM lineitem WHERE l_orderkey < 50
      ORDER BY l_orderkey, l_linenumber""")),

    Q("regexp_funcs", fn = (s, dir) =>
      Td.documents(s, dir)
        .select(col("doc_id"),
          regexp_extract(col("source"), "src(\\d+)", 1).cast(LongType).as("src_num"),
          col("source").rlike("^src1\\d$").as("is_teens"),
          regexp_replace(col("source"), "\\d+", "#").as("masked"))
        .orderBy(col("doc_id")),
      oracle = Some("""
      SELECT doc_id,
             CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) AS src_num,
             regexp_matches(source, '^src1\d$') AS is_teens,
             regexp_replace(source, '\d+', '#', 'g') AS masked
      FROM documents ORDER BY doc_id""")),

    Q("union_distinct", fn = (s, dir) => {
      val a = Td.orders(s, dir).filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey"))
      val b = Td.orders(s, dir).filter(year(col("o_orderdate")) === 1998)
        .select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    }, oracle = Some("""
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      UNION
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      ORDER BY o_custkey""")),

    // Typed Aggregator UDAF (partial+final planned like built-ins):
    // exact weighted mean over integer cents.
    Q("agg_weighted_udaf", fn = (s, dir) => {
      val wm = udaf(new Aggregators.WeightedMean())
      Td.lineitem(s, dir)
        .select(col("l_returnflag"),
          (dec(col("l_extendedprice")) * 100).cast(LongType).as("pc"),
          (dec(col("l_quantity")) * 100).cast(LongType).as("qc"))
        .groupBy(col("l_returnflag"))
        .agg(round(wm(col("pc"), col("qc")), 4).as("weighted_avg_price_cents"))
        .orderBy(col("l_returnflag"))
    }, oracle = Some("""
      WITH t AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc
        FROM lineitem)
      SELECT l_returnflag,
             round(CAST(sum(pc * qc) AS DOUBLE) / sum(qc), 4) AS weighted_avg_price_cents
      FROM t GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Scalar Scala UDF surface (SURVEY §2.5 UDF row): registered and
    // invoked through SQL; the oracle states the same logic as a CASE.
    // (Prefer native expressions for hot paths — this pins the API.)
    Q("udf_scalar", fn = (s, dir) => {
      s.udf.register("price_band", (p: Double) =>
        if (p < 50000) "low" else if (p < 150000) "mid" else "high")
      Td.orders(s, dir).createOrReplaceTempView("orders")
      s.sql("""
        SELECT price_band(o_totalprice) AS band, count(*) AS n
        FROM orders GROUP BY 1 ORDER BY band""")
    }, oracle = Some("""
      SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                  WHEN o_totalprice < 150000 THEN 'mid'
                  ELSE 'high' END AS band, count(*) AS n
      FROM orders GROUP BY 1 ORDER BY band""")),

    // KMV sketch values have no SQL equivalent, so the checkable
    // contract mirrors approx_count_distinct: exact counts (verified
    // cross-engine) plus a sketch-accuracy flag (k=256 => sigma ~ 6%;
    // 15% is the same envelope OperatorsSpec pins).
    Q("agg_kmv_distinct", fn = (s, dir) =>
      Td.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.VectorFunctions.kmvDistinct(col("l_partkey")).as("kmv"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("kmv") - col("exact_parts")).cast(DoubleType) /
            col("exact_parts") <= 0.15).as("kmv_within_15pct"))
        .orderBy(col("l_returnflag")),
      oracle = Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             true AS kmv_within_15pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Mergeable-moments Aggregator (Welford/Chan): its float merge order
    // can't be replayed in SQL, but the decimal-exact two-pass variance
    // CAN (stats_moments arithmetic) — so the query emits that exact
    // value and a flag that the Welford stream agrees to 1e-9 relative.
    Q("agg_variance_udaf", fn = (s, dir) => {
      val va = udaf(new Aggregators.VarianceAgg())
      val q = dec(col("l_quantity"))
      val s1d = col("s1").cast(DoubleType)
      val s2d = col("s2").cast(DoubleType)
      val exactVar = (s2d - s1d * s1d / col("n")) / (col("n") - 1)
      Td.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(va(col("l_quantity").cast(DoubleType)).as("welford"),
          count(lit(1)).as("n"),
          sum(q).cast(DecimalType(38, 2)).as("s1"),
          sum((q * q).cast(DecimalType(38, 4))).cast(DecimalType(38, 4)).as("s2"))
        .select(col("l_returnflag"), col("n"),
          round(exactVar, 4).as("var_qty"),
          // absolute-or-relative tolerance: a zero-variance or n=1 group
          // would make a pure relative test null/indeterminate
          (col("n") > 1 && abs(col("welford") - exactVar) <=
            greatest(abs(exactVar) * 1e-9, lit(1e-12)))
            .as("welford_matches_exact"))
        .orderBy(col("l_returnflag"))
    }, oracle = Some("""
      WITH t AS (
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s1,
               CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS s2
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1), 4) AS var_qty,
             n > 1 AS welford_matches_exact
      FROM t ORDER BY l_returnflag"""))
  )
}

/** SQL texts shared verbatim between spark.sql and the DuckDB oracle. */
private object Sql {
  val subqueryScalar: String = """
      SELECT o_orderstatus, count(*) AS n_above_avg
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  val subqueryIn: String = """
      SELECT count(*) AS n_rich_orders
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)"""

  val subqueryExists: String = """
      SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""
}
