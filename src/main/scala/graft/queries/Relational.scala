package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The relational (batch) query surface: joins of every flavor,
  * aggregations, grouping sets/rollup/cube, window functions, sorts/top-k,
  * set ops, scalar function families, subqueries, pivot, time bucketing.
  *
  * Every query is declarative DataFrame code — Catalyst supplies pushdown,
  * pruning, partial aggregation and join selection; explicit `broadcast`
  * hints mark the dimension sides that must never shuffle at scale.
  *
  * Doubles in outputs are rounded (4-6 dp) IN BOTH ENGINES so IEEE-754
  * accumulation-order noise cannot flip the driver's hash comparison.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)
  private def r4(c: Column): Column = round(c, 4)

  val queries: Seq[(String, Q)] = Seq(

    // ---------------------------------------------------------- aggregation
    "q01_pricing_summary" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-01"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            r4(sum(col("l_quantity"))).as("sum_qty"),
            r4(sum(col("l_extendedprice"))).as("sum_base_price"),
            r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
            r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
            r4(avg(col("l_quantity"))).as("avg_qty"),
            r4(avg(col("l_extendedprice"))).as("avg_price"),
            r4(avg(col("l_discount"))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 4) AS sum_qty,
             |  round(sum(l_extendedprice), 4) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      "TPC-H Q1 style pricing summary: hash aggregate w/ map-side partials"),

    // --------------------------------------------------- filter + projection
    "q02_filter_project" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity").between(30, 32) && col("l_returnflag") === "R")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice * (1 - l_discount), 4) AS net_price,
             |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
             |FROM lineitem
             |WHERE l_quantity BETWEEN 30 AND 32 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "predicate + projection pushed to the parquet scan (PushedFilters)"),

    // ------------------------------------------------------------- 3-way join
    "q03_top_orders" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("o_orderkey"))
          .agg(r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      "TPC-H Q3 style: fact-fact shuffle join + broadcast dimension + top-k"),

    // -------------------------------------------------- 5-way join, broadcast
    "q04_nation_revenue" -> Q(
      (s, dir) => {
        val re = t(s, dir, "region").filter(col("r_name") =!= "NOWHERE")
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(re), n("n_regionkey") === re("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            r4(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),
      "star join: all dimensions broadcast, single fact-fact shuffle"),

    // ---------------------------------------------------------- semi/anti join
    "q05_semi_join" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
        c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
             |ORDER BY c_custkey""".stripMargin),
      "left-semi join = EXISTS; builds hash set, never duplicates probe rows"),

    "q06_anti_join" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"), r4(sum(col("c_acctbal"))).as("total_bal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers,
             |  round(sum(c_acctbal), 4) AS total_bal
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      "left-anti join = NOT EXISTS"),

    // ------------------------------------------------------- window functions
    "q07_top_order_per_cust" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey"), r4(col("o_totalprice")).as("best_price"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS best_price
             |FROM (SELECT *, row_number() OVER
             |    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn = 1 AND o_custkey < 200
             |ORDER BY o_custkey""".stripMargin),
      "ranking window function (row_number) for per-group top-1"),

    "q08_running_totals" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        t(s, dir, "lineitem")
          .filter(col("l_suppkey") < 5)
          .withColumn("running_qty", sum(col("l_quantity")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
          .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
          .select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            r4(col("running_qty")).as("running_qty"),
            r4(coalesce(col("prev_qty"), lit(-1.0))).as("prev_qty"),
            r4(coalesce(col("next_qty"), lit(-1.0))).as("next_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  round(sum(l_quantity) OVER w, 4) AS running_qty,
             |  round(coalesce(lag(l_quantity, 1) OVER w2, -1.0), 4) AS prev_qty,
             |  round(coalesce(lead(l_quantity, 1) OVER w2, -1.0), 4) AS next_qty
             |FROM lineitem WHERE l_suppkey < 5
             |WINDOW w AS (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  w2 AS (PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber)
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin),
      "analytic window frame: running sum + lag/lead over a pinned order"),

    // -------------------------------------------------- rollup / cube / sets
    "q09_rollup" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(r4(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("sum_qty"), col("n"))
          .orderBy(col("returnflag"), col("linestatus")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin),
      "ROLLUP hierarchy totals"),

    "q10_cube" -> Q(
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), r4(sum(col("o_totalprice"))).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("total"))
          .orderBy(col("status"), col("priority")),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  count(*) AS n, round(sum(o_totalprice), 4) AS total
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin),
      "CUBE: all grouping combinations"),

    "q11_grouping_sets" -> Q(
      (s, dir) => {
        Tables.register(s, dir, "lineitem")
        s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                |  coalesce(l_linestatus, 'ALL') AS linestatus,
                |  round(sum(l_extendedprice), 4) AS sum_price
                |FROM lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
                |ORDER BY returnflag, linestatus""".stripMargin)
      },
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  round(sum(l_extendedprice), 4) AS sum_price
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY returnflag, linestatus""".stripMargin),
      "explicit GROUPING SETS via the SQL front end"),

    // ------------------------------------------------------- sort/limit/top-k
    "q12_topk_orders" -> Q(
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), r4(col("o_totalprice")).as("o_totalprice"), col("o_orderstatus"))
          .limit(10),
      Some("""SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice, o_orderstatus
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      "global top-k -> TakeOrderedAndProject (no full sort at scale)"),

    // ---------------------------------------------------------------- set ops
    "q13_set_ops" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
        val both = y95.intersect(y96).withColumn("tag", lit("both"))
        val only95 = y95.except(y96).withColumn("tag", lit("only95"))
        both.unionAll(only95)
          .groupBy(col("tag")).agg(count(lit(1)).as("n_customers"))
          .orderBy(col("tag"))
      },
      Some("""WITH y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
             |y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
             |tagged AS (
             |  SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
             |  UNION ALL
             |  SELECT o_custkey, 'only95' AS tag FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96))
             |SELECT tag, count(*) AS n_customers FROM tagged
             |GROUP BY tag ORDER BY tag""".stripMargin),
      "INTERSECT / EXCEPT / UNION ALL"),

    // ------------------------------------------------------------ distinct agg
    "q14_distinct_agg" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            r4(sum(col("l_quantity"))).as("sum_qty"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  round(sum(l_quantity), 4) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "multiple DISTINCT aggregates (expand + two-phase agg)"),

    // --------------------------------------------------------- scalar: string
    "q15_string_funcs" -> Q(
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") <= 100)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            length(col("p_name")).cast("bigint").as("name_len"),
            substring(col("p_type"), 1, 5).as("type_prefix"),
            concat(col("p_brand"), lit("#"), lpad(col("p_size").cast("string"), 3, "0")).as("brand_size"),
            regexp_extract(col("p_type"), "([a-z]+)", 1).as("first_word"),
            replace(col("p_name"), lit(" "), lit("_")).as("name_snake"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_name) AS name_upper,
             |  CAST(length(p_name) AS BIGINT) AS name_len,
             |  substring(p_type, 1, 5) AS type_prefix,
             |  p_brand || '#' || lpad(p_size::VARCHAR, 3, '0') AS brand_size,
             |  regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
             |  replace(p_name, ' ', '_') AS name_snake
             |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin),
      "string function family (codegen'd, no UDFs)"),

    // ------------------------------------------------------- scalar: datetime
    "q16_date_funcs" -> Q(
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).cast("bigint").as("y"),
            quarter(col("o_orderdate")).cast("bigint").as("q"))
          .agg(
            count(lit(1)).as("n_orders"),
            r4(sum(col("o_totalprice"))).as("total"),
            min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("first_day"))
          .orderBy(col("y"), col("q")),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
             |  count(*) AS n_orders, round(sum(o_totalprice), 4) AS total,
             |  min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day
             |FROM orders GROUP BY 1, 2 ORDER BY y, q""".stripMargin),
      "date/time extraction + formatting"),

    // ----------------------------------------------------------- scalar: math
    "q17_math_funcs" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 50)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            r4(sqrt(col("l_extendedprice"))).as("root_price"),
            r4(pow(col("l_quantity"), 2)).as("qty_sq"),
            r4(exp(col("l_discount"))).as("exp_disc"),
            r4(log(col("l_extendedprice") + 1)).as("ln_price"),
            ceil(col("l_quantity")).cast("bigint").as("qty_ceil"),
            floor(col("l_tax") * 100).cast("bigint").as("tax_pct"),
            abs(col("l_quantity") - 25).cast("double").as("qty_dev"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(sqrt(l_extendedprice), 4) AS root_price,
             |  round(pow(l_quantity, 2), 4) AS qty_sq,
             |  round(exp(l_discount), 4) AS exp_disc,
             |  round(ln(l_extendedprice + 1), 4) AS ln_price,
             |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
             |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct,
             |  CAST(abs(l_quantity - 25) AS DOUBLE) AS qty_dev
             |FROM lineitem WHERE l_orderkey <= 50
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      "math function family"),

    // -------------------------------------------------------------- case/when
    "q18_case_buckets" -> Q(
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 150000, "medium")
              .when(col("o_totalprice") < 300000, "large")
              .otherwise("jumbo").as("bucket"),
            col("o_totalprice"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), r4(avg(col("o_totalprice"))).as("avg_price"))
          .orderBy(col("bucket")),
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
             |  WHEN o_totalprice < 150000 THEN 'medium'
             |  WHEN o_totalprice < 300000 THEN 'large'
             |  ELSE 'jumbo' END AS bucket,
             |  count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin),
      "CASE WHEN bucketing"),

    // ------------------------------------------------------------- range join
    "q19_range_join" -> Q(
      (s, dir) => {
        import s.implicits._
        val buckets = Seq(
          ("b0_low", 0.0, 100.0), ("b1_mid", 100.0, 250.0), ("b2_high", 250.0, 500.0))
          .toDF("bucket", "lo", "hi")
        graft.Tables.events(s, dir)
          .join(broadcast(buckets), col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_value"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT bucket, count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM events JOIN (VALUES ('b0_low', 0.0, 100.0),
             |  ('b1_mid', 100.0, 250.0), ('b2_high', 250.0, 500.0)) AS b(bucket, lo, hi)
             |  ON value >= lo AND value < hi
             |GROUP BY bucket ORDER BY bucket""".stripMargin),
      "non-equi (range) join via broadcast nested loop on a tiny build side"),

    // -------------------------------------------------------------- asof join
    "q20_asof_join" -> Q(
      (s, dir) => {
        // As-of via ONE windowed pass, not join-then-aggregate: a theta
        // join purchases x earlier-clicks explodes quadratically per user
        // at scale; instead union both event kinds, shuffle once by user,
        // and carry the latest click timestamp forward with a running
        // `max over (rows unbounded preceding)`. Clicks sort before a
        // simultaneous purchase (is_click desc) to honor c_ts <= p_ts.
        val ev = graft.Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "click"))
          .select(
            col("event_id"), col("user_id"), col("ts"),
            (col("event_type") === "click").as("is_click"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("is_click").desc, col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev
          .withColumn("last_click_ts",
            max(when(col("is_click"), col("ts"))).over(w))
          .filter(!col("is_click"))
          .select(
            col("event_id").as("p_id"), col("user_id").as("p_user"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
            coalesce(date_format(col("last_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("none")).as("last_click"))
          .orderBy(col("p_id"))
      },
      Some("""SELECT p.event_id AS p_id, p.user_id AS p_user,
             |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
             |  coalesce(strftime(max(c.ts), '%Y-%m-%d %H:%M:%S.%f'), 'none') AS last_click
             |FROM events p LEFT JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
             |WHERE p.event_type = 'purchase'
             |GROUP BY p.event_id, p.user_id, p.ts ORDER BY p_id""".stripMargin),
      "as-of join (latest matching row at or before each event time)"),

    // -------------------------------------------------------- scalar subquery
    "q21_scalar_subquery" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val stats = o.agg(avg(col("o_totalprice")).as("avg_price"))
        o.join(broadcast(stats), lit(true))
          .filter(col("o_totalprice") > col("avg_price") * 2)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_big"), r4(max(col("o_totalprice"))).as("max_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n_big,
             |  round(max(o_totalprice), 4) AS max_price
             |FROM orders
             |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 2
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      "scalar subquery (broadcast single-row join; no driver collect)"),

    // ------------------------------------------------------------------ pivot
    "q22_pivot" -> Q(
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(r4(sum(col("l_quantity"))))
          .na.fill(0.0, Seq("A", "N", "R"))
          .orderBy(col("l_linestatus")),
      Some("""SELECT l_linestatus,
             |  round(coalesce(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0), 4) AS "A",
             |  round(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0), 4) AS "N",
             |  round(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0), 4) AS "R"
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
      "pivot = conditional aggregation"),

    // ----------------------------------------------------------------- listagg
    "q23_listagg" -> Q(
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(
            array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
             |  string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),
      "ordered string aggregation (collect_set + array_sort + array_join)"),

    // -------------------------------------------------------------- json funcs
    "q24_json_extract" -> Q(
      (s, dir) =>
        graft.Tables.events(s, dir)
          .select(col("event_type"), get_json_object(col("props"), "$.k").cast("bigint").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      "JSON field extraction"),

    // --------------------------------------------------------- time bucketing
    "q25_time_buckets" -> Q(
      (s, dir) =>
        graft.Tables.events(s, dir)
          .filter(col("ts") < lit("2024-01-03"))
          .groupBy(
            window(col("ts"), "5 minutes").getField("start").as("bucket_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_value"))
          .select(
            date_format(col("bucket_start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy(col("bucket"), col("event_type")),
      Some("""SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS bucket,
             |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
             |FROM events WHERE ts < TIMESTAMP '2024-01-03'
             |GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin),
      "tumbling time-window bucketing (batch form of the streaming window)"),

    // --------------------------------------------------------------- union all
    "q26_union_all" -> Q(
      (s, dir) => {
        val ev = graft.Tables.events(s, dir)
          .groupBy(col("event_type").as("dim")).agg(count(lit(1)).as("n"))
          .withColumn("src", lit("events"))
        val docs = t(s, dir, "documents")
          .groupBy(col("lang").as("dim")).agg(count(lit(1)).as("n"))
          .withColumn("src", lit("documents"))
        ev.unionAll(docs).orderBy(col("src"), col("dim"))
      },
      Some("""SELECT * FROM (
             |  SELECT event_type AS dim, count(*) AS n, 'events' AS src
             |  FROM events GROUP BY event_type
             |  UNION ALL
             |  SELECT lang AS dim, count(*) AS n, 'documents' AS src
             |  FROM documents GROUP BY lang)
             |ORDER BY src, dim""".stripMargin),
      "UNION ALL across heterogeneous sources"))
}
