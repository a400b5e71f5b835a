package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Portable.round

/** Relational query surface over the driver's TPC-H-ish tables (SURVEY.md
  * §7.6): the capabilities the reference lacks entirely (§2.5) supplied by
  * vanilla Spark — aggregation, joins of every flavor, windows, rollup/cube,
  * set ops, sessionization, as-of & range joins, snapshot change detection.
  *
  * Conventions shared with the DuckDB oracles (the driver hash-compares):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates are `round(…, 2..4)` on both sides so last-ulp
  *    non-associativity of distributed summation can't flip the hash;
  *  - timestamps leave the query as `unix_micros` BIGINTs or DATEs (parquet
  *    timestamp-zone round-trips differ between writers; integers don't);
  *  - every query has a total ORDER BY with a unique tiebreak column.
  *
  * Scale notes are per-query. Broadcast-hint policy: a `broadcast()` hint
  * FORCES the build side past `autoBroadcastJoinThreshold`, so hints mark
  * only dimensions whose cardinality is bounded by the schema at any SF
  * (region = 5 rows, nation = 25). Tables that scale with the data
  * (customer/supplier/part — small next to lineitem but unbounded) carry no
  * hint: the planner broadcasts them below the threshold (pinned at test
  * scale by PlanQualitySpec) and falls back to a shuffled join at 100×
  * instead of OOMing on a forced build.
  */
object Relational {

  /** (name, spark query, optional oracle) triples — single source of truth. */
  private def defs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ---- Q1-style pricing summary: full-scan partial+final agg, no shuffle
    // beyond 3-group exchange; the canonical map-side-combine showcase.
    ("q01_pricing_summary", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 2).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(CAST((sum(l_quantity)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(CAST((sum(l_extendedprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(CAST((sum(l_extendedprice*(1.0-l_discount))) AS DECIMAL(28,8)), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(CAST((avg(l_quantity)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS avg_qty,
        |  CAST(round(CAST((avg(l_discount)) AS DECIMAL(28,8)), 4) AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- Q6-style selective scan: predicate pushdown straight to parquet.
    ("q02_selective_revenue", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
    }, Some(
      """SELECT CAST(round(CAST((sum(l_extendedprice*l_discount)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS revenue, count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // ---- Q3-style: 3-way join, top-k by computed revenue. customer SCALES
    // with the data (unlike nation/region), so it carries no broadcast hint —
    // the planner broadcasts it below the threshold (pinned at test scale by
    // PlanQualitySpec) and shuffles it at 100× instead of OOMing on a forced
    // build side.
    ("q03_top_orders", (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderkey", $"o_orderpriority")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    }, Some(
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(round(CAST((sum(l_extendedprice*(1.0-l_discount))) AS DECIMAL(28,8)), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- Q4-style correlated EXISTS: orders with any late-shipped line
    // (ship date > order date + 3 months). The correlated subquery plans as
    // a left-semi join whose date predicate is a residual condition on the
    // equi-keyed match — no nested loop, one shuffle pair.
    ("q04_late_ship_priority", (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1995-07-01").cast("timestamp"))
        .join(Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate"),
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 3 MONTH"),
          "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    }, Some(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 3 MONTH)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- Q5-style: 6-table star join; the one real shuffle is the lineitem
    // aggregation. Broadcast hints mark ONLY the schema-bounded dimensions
    // (nation is 25 rows and region 5, at any SF — a hint there is a fact,
    // not a bet); customer/supplier scale with the data, so their joins are
    // left to the planner's threshold: broadcast at test scale (pinned by
    // PlanQualitySpec), shuffled-hash/sort-merge at 100× with no code change.
    ("q05_nation_revenue", (s, d) => {
      import s.implicits._
      val r = Tables.region(s, d).filter($"r_name" === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"n_name")
    }, Some(
      """SELECT n_name,
        |  CAST(round(CAST((sum(l_extendedprice*(1.0-l_discount))) AS DECIMAL(28,8)), 2) AS DOUBLE) AS revenue, count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ---- (numbering note: there is deliberately no q06 — an early-round
    // draft was folded into q05's region join before it ever shipped, and
    // renumbering the q07+ surface would churn every CORRECTNESS/BENCH
    // history key for zero semantic gain. The gap is cosmetic.)

    // ---- window functions: top-3 orders per customer by price.
    ("q07_window_topk_per_customer", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("price"),
          $"rn".cast("long").as("rn"))
        .orderBy($"o_custkey", $"rn")
    }, Some(
      """SELECT o_custkey, o_orderkey, CAST(round(CAST((o_totalprice) AS DECIMAL(28,8)), 2) AS DOUBLE) AS price, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // ---- rollup with subtotal rows made hash-stable via coalesce.
    ("q08_rollup_orders", (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n_orders", $"total")
        .orderBy($"status", $"priority")
    }, Some(
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        |       coalesce(o_orderpriority,'ALL') AS priority,
        |       count(*) AS n_orders, CAST(round(CAST((sum(o_totalprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin)),

    // ---- cube.
    ("q09_cube_lineitem", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n", $"qty")
        .orderBy($"returnflag", $"linestatus")
    }, Some(
      """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
        |       coalesce(l_linestatus,'ALL') AS linestatus,
        |       count(*) AS n, CAST(round(CAST((sum(l_quantity)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin)),

    // ---- left-semi join (EXISTS).
    ("q10_semi_join", (s, d) => {
      import s.implicits._
      val active = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      Tables.customer(s, d)
        .join(active, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY c_custkey""".stripMargin)),

    // ---- left-anti join (NOT EXISTS): customers dormant since 2000.
    ("q11_anti_join", (s, d) => {
      import s.implicits._
      val recent = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      Tables.customer(s, d)
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", round($"c_acctbal", 2).as("acctbal"))
        .orderBy($"c_custkey")
    }, Some(
      """SELECT c_custkey, c_name, CAST(round(CAST((c_acctbal) AS DECIMAL(28,8)), 2) AS DOUBLE) AS acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin)),

    // ---- set ops: INTERSECT and EXCEPT over half-year active customers.
    ("q12_intersect", (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val h1 = o.filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-01-01").cast("timestamp")).select($"o_custkey")
      val h2 = o.filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp")).select($"o_custkey")
      h1.intersect(h2).orderBy($"o_custkey")
    }, Some(
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_custkey""".stripMargin)),

    ("q13_except", (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val h1 = o.filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-01-01").cast("timestamp")).select($"o_custkey")
      val h2 = o.filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp")).select($"o_custkey")
      h1.except(h2).orderBy($"o_custkey")
    }, Some(
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_custkey""".stripMargin)),

    // ---- exact distinct aggregation (expand-based in Spark).
    ("q14_distinct_parts_per_supplier", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_suppkey")
        .agg(countDistinct($"l_partkey").as("n_parts"),
          round(sum($"l_quantity"), 2).as("qty"))
        .orderBy($"l_suppkey")
    }, Some(
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, CAST(round(CAST((sum(l_quantity)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // ---- conditional aggregation (Q12-style CASE counting).
    ("q15_priority_split", (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"l_returnflag")
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_count"),
          sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("low_count"))
        .orderBy($"l_returnflag")
    }, Some(
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- scalar-function showcase: string/math per brand.
    ("q16_brand_stats", (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .groupBy($"p_brand")
        .agg(
          count(lit(1)).as("n"),
          round(avg($"p_retailprice"), 2).as("avg_price"),
          min($"p_size").as("min_size"),
          max(length($"p_name")).cast("long").as("max_name_len"),
          countDistinct($"p_type").as("n_types"))
        .orderBy($"p_brand")
    }, Some(
      """SELECT p_brand, count(*) AS n, CAST(round(CAST((avg(p_retailprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS avg_price,
        |  min(p_size) AS min_size, max(length(p_name)) AS max_name_len,
        |  count(DISTINCT p_type) AS n_types
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // ---- time bucketing to DATE (writer-neutral, unlike raw timestamps).
    ("q17_orders_by_month", (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy(to_date(date_trunc("month", $"o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"month")
    }, Some(
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_orders, CAST(round(CAST((sum(o_totalprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin)),

    // ---- HAVING.
    ("q18_frequent_customers", (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
        .filter($"n_orders" >= 15)
        .orderBy($"o_custkey")
    }, Some(
      """SELECT o_custkey, count(*) AS n_orders, CAST(round(CAST((sum(o_totalprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey""".stripMargin)),

    // ---- scalar subquery / join-with-aggregate: parts 5% above brand mean
    // (retail prices cluster tightly per brand, so 5% is the selective band).
    ("q19_above_brand_avg", (s, d) => {
      import s.implicits._
      val p = Tables.part(s, d)
      val avgs = p.groupBy($"p_brand".as("b")).agg(avg($"p_retailprice").as("brand_avg"))
      p.join(broadcast(avgs), $"p_brand" === $"b")
        .filter($"p_retailprice" > $"brand_avg" * 1.05)
        .select($"p_partkey", $"p_brand", round($"p_retailprice", 2).as("price"))
        .orderBy($"p_partkey")
    }, Some(
      """SELECT p_partkey, p_brand, CAST(round(CAST((p_retailprice) AS DECIMAL(28,8)), 2) AS DOUBLE) AS price
        |FROM part p
        |WHERE p_retailprice > 1.05 * (SELECT avg(p_retailprice) FROM part q WHERE q.p_brand = p.p_brand)
        |ORDER BY p_partkey""".stripMargin)),

    // ---- sessionization: 30-min inactivity gap → session ids per user
    // (lag + running sum; the standard streaming-analytics shape run batch).
    ("q20_sessionize_events", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val flagged = Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L)
            .otherwise(0L))
      flagged
        .withColumn("session_id",
          sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(unix_micros($"ts")).as("session_start_us"),
          max(unix_micros($"ts")).as("session_end_us"),
          round(sum($"value"), 2).as("total_value"))
        .orderBy($"user_id", $"session_id")
    }, Some(
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |  min(epoch_us(ts)) AS session_start_us, max(epoch_us(ts)) AS session_end_us,
        |  CAST(round(CAST((sum(value)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin)),

    // ---- tumbling-window aggregation (batch shape of the streaming query).
    ("q21_hourly_event_stats", (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(unix_micros(date_trunc("hour", $"ts")).as("hour_us"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"hour_us", $"event_type")
    }, Some(
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |  count(*) AS n, CAST(round(CAST((sum(value)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin)),

    // ---- semi-structured: JSON property extraction + bucketing.
    ("q22_json_props", (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .groupBy(($"k" % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), round(avg($"value"), 2).as("avg_value"))
        .orderBy($"k_bucket")
    }, Some(
      """SELECT CAST(json_extract_string(props,'$.k') AS INTEGER) % 10 AS k_bucket,
        |  count(*) AS n, CAST(round(CAST((avg(value)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS avg_value
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin)),

    // ---- as-of join: each purchase matched to the user's most recent prior
    // signup (windowed last-match — the Spark-native as-of shape; no custom
    // physical operator needed because the probe side is the same stream).
    ("q23_asof_purchase_signup", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("last_signup_us",
          max(when($"event_type" === "signup", unix_micros($"ts"))).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"last_signup_us")
        .orderBy($"event_id")
    }, Some(
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, last_signup_us FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    max(CASE WHEN event_type='signup' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_us
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // ---- range join on an equi key (sort-merge + range filter, NOT a
    // nested-loop: the equi key keeps it scalable).
    ("q24_range_join_ship_window", (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 30 DAYS"))
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_quick_ships"),
          round(sum($"l_extendedprice"), 2).as("quick_revenue"))
        .orderBy($"o_orderkey")
    }, Some(
      """SELECT o_orderkey, count(*) AS n_quick_ships, CAST(round(CAST((sum(l_extendedprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS quick_revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin)),

    // ---- snapshot change detection (the CDC north star expressed
    // relationally): v1/v2 derived deterministically, full outer join diff.
    ("q25_snapshot_diff", (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val v1 = o.filter($"o_orderkey" % 7 =!= 0)
        .select($"o_orderkey".as("k1"), $"o_totalprice".as("p1"))
      val v2 = o.filter($"o_orderkey" % 5 =!= 0)
        .select($"o_orderkey".as("k2"),
          when($"o_orderkey" % 3 === 0, round($"o_totalprice" * 1.1, 2))
            .otherwise($"o_totalprice").as("p2"))
      v1.join(v2, $"k1" === $"k2", "full_outer")
        .withColumn("change",
          when($"k1".isNull, "inserted")
            .when($"k2".isNull, "deleted")
            .when($"p1" =!= $"p2", "updated"))
        .filter($"change".isNotNull)
        .select(coalesce($"k1", $"k2").as("o_orderkey"), $"change")
        .orderBy($"o_orderkey")
    }, Some(
      """WITH v1 AS (SELECT o_orderkey AS k1, o_totalprice AS p1 FROM orders WHERE o_orderkey % 7 <> 0),
        |v2 AS (SELECT o_orderkey AS k2,
        |         CASE WHEN o_orderkey % 3 = 0 THEN CAST(round(CAST((o_totalprice*1.1) AS DECIMAL(28,8)), 2) AS DOUBLE) ELSE o_totalprice END AS p2
        |       FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT coalesce(k1,k2) AS o_orderkey,
        |  CASE WHEN k1 IS NULL THEN 'inserted' WHEN k2 IS NULL THEN 'deleted'
        |       WHEN p1 <> p2 THEN 'updated' END AS change
        |FROM v1 FULL OUTER JOIN v2 ON k1 = k2
        |WHERE (k1 IS NULL OR k2 IS NULL OR p1 <> p2)
        |ORDER BY o_orderkey""".stripMargin)),

    // ---- pivot (conditional-agg mirror keeps the oracle ANSI).
    ("q26_pivot_event_types", (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy($"user_id")
    }, Some(
      """SELECT user_id,
        |  count(CASE WHEN event_type='click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type='error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type='purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type='signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type='view' THEN 1 END) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- exact median (interpolated) per group.
    ("q27_median_price", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(round(median($"l_extendedprice"), 2).as("median_price"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }, Some(
      """SELECT l_returnflag, CAST(round(CAST((median(l_extendedprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS median_price, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- salted two-stage aggregation: the skew-mitigation shape (partial
    // agg per (key, salt) spreads a hot key over 16 reducers; final agg per
    // key). The oracle is the plain one-stage groupBy — checking exactly
    // that salting preserves the result. Counts are integers, so the
    // two-stage sum is exact.
    ("q29_salted_skew_agg", (s, d) => {
      import s.implicits._
      val partial = Tables.events(s, d)
        .withColumn("salt", pmod(xxhash64($"event_id"), lit(16)))
        .groupBy($"user_id", $"salt")
        .agg(count(lit(1)).as("pc"), max($"value").as("pmax"), min($"value").as("pmin"))
      partial.groupBy($"user_id")
        .agg(sum($"pc").as("n_events"),
          round(max($"pmax"), 2).as("max_value"),
          round(min($"pmin"), 2).as("min_value"))
        .orderBy($"user_id")
    }, Some(
      """SELECT user_id, count(*) AS n_events,
        |  CAST(round(CAST((max(value)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS max_value, CAST(round(CAST((min(value)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS min_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- left outer join with null-side handling: customers with their
    // (possibly absent) 2000+ order stats.
    ("q30_left_join_nulls", (s, d) => {
      import s.implicits._
      val recent = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_recent"))
      Tables.customer(s, d)
        .join(recent, $"c_custkey" === $"o_custkey", "left_outer")
        .select($"c_custkey",
          coalesce($"n_recent", lit(0L)).as("n_recent"),
          $"n_recent".isNull.as("dormant"))
        .orderBy($"c_custkey")
    }, Some(
      """SELECT c_custkey, coalesce(n_recent, 0) AS n_recent, n_recent IS NULL AS dormant
        |FROM customer LEFT OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n_recent FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-01-01' GROUP BY o_custkey) r
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin)),

    // ---- histogram: fixed-width bucketing of document lengths per lang.
    ("q31_length_histogram", (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"lang", (floor($"n_chars" / 100) * 100).cast("long").as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy($"lang", $"len_bucket")
    }, Some(
      """SELECT lang, CAST(floor(n_chars / 100) * 100 AS BIGINT) AS len_bucket, count(*) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY lang, len_bucket""".stripMargin)),

    // ---- string-function showcase over part names.
    ("q32_string_funcs", (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_name".like("%red%"))
        .select(
          $"p_partkey",
          upper(substring($"p_name", 1, 6)).as("prefix"),
          length(replace($"p_name", lit(" "), lit(""))).cast("long").as("squeezed_len"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"))
        .orderBy($"p_partkey")
    }, Some(
      """SELECT p_partkey, upper(substr(p_name, 1, 6)) AS prefix,
        |  CAST(length(replace(p_name, ' ', '')) AS BIGINT) AS squeezed_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey""".stripMargin)),

    // ---- exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`: sort + linear interpolation). Computed over the
    // integer-valued quantity column: the engines' interpolation formulas
    // differ in the last ulp (a+(b-a)f vs (1-f)a+fb), which is harmless on
    // quarter-step results but can flip rounding on arbitrary doubles.
    ("q33_percentiles", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 2).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 2).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 2).as("p90"))
        .orderBy($"l_returnflag")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""SELECT l_returnflag,
         |  ${rndSql("quantile_cont(l_quantity, 0.25)", 2)} AS p25,
         |  ${rndSql("quantile_cont(l_quantity, 0.5)", 2)} AS p50,
         |  ${rndSql("quantile_cont(l_quantity, 0.9)", 2)} AS p90
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    }),

    // ---- ordered string aggregation (deterministic via explicit sort).
    ("q34_string_agg", (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .filter($"o_custkey" < 50)
        .groupBy($"o_custkey")
        .agg(concat_ws(",",
          sort_array(collect_list($"o_orderpriority"))).as("priorities"),
          count(lit(1)).as("n"))
        .orderBy($"o_custkey")
    }, Some(
      """SELECT o_custkey, string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        |  count(*) AS n
        |FROM orders WHERE o_custkey < 50 GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // ---- explicit GROUPING SETS (beyond rollup/cube): per-status, per-
    // priority, and grand total in one pass.
    ("q35_grouping_sets", (s, d) => {
      import s.implicits._
      Tables.orders(s, d).createOrReplaceTempView("orders_gs_v")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |       coalesce(o_orderpriority, 'ALL') AS priority,
          |       count(*) AS n, CAST(round(CAST((sum(o_totalprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS total
          |FROM orders_gs_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
    }, Some(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n, CAST(round(CAST((sum(o_totalprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)),

    // ---- date arithmetic: order-to-ship delay distribution.
    ("q36_ship_delay_histogram", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).select($"l_orderkey", $"l_shipdate")
        .join(Tables.orders(s, d).select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .select((datediff($"l_shipdate", $"o_orderdate") / 7).cast("long").as("delay_weeks"))
        .groupBy($"delay_weeks")
        .agg(count(lit(1)).as("n"))
        .orderBy($"delay_weeks")
    }, Some(
      """SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) // 7 AS BIGINT)
        |    AS delay_weeks, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY delay_weeks""".stripMargin)),

    // ---- window-function suite beyond row_number: lead/lag, ntile,
    // percent_rank, cume_dist, first_value over one deterministic window.
    ("q37_window_suite", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .filter($"o_custkey" < 30)
        .select(
          $"o_custkey", $"o_orderkey",
          lag($"o_orderkey", 1).over(w).as("prev_order"),
          lead($"o_orderkey", 1).over(w).as("next_order"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          first_value($"o_orderkey").over(w).as("first_order"))
        .orderBy($"o_custkey", $"o_orderkey")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""SELECT o_custkey, o_orderkey,
         |  lag(o_orderkey, 1) OVER w AS prev_order,
         |  lead(o_orderkey, 1) OVER w AS next_order,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         |  ${rndSql("percent_rank() OVER w", 6)} AS pct_rank,
         |  ${rndSql("cume_dist() OVER w", 6)} AS cume,
         |  first_value(o_orderkey) OVER w AS first_order
         |FROM orders WHERE o_custkey < 30
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         |ORDER BY o_custkey, o_orderkey""".stripMargin
    }),

    // ---- event-time range self-join: every (purchase, signup-of-same-user-
    // within-the-preceding-hour) pair — the batch twin of
    // streaming.Streaming.purchaseAttribution, equi-keyed on user_id so the
    // range predicate is a residual filter, not a nested loop.
    ("q38_purchase_attribution", (s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val p = e.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("p_ts"))
      val sg = e.filter($"event_type" === "signup")
        .select($"user_id".as("s_user"), $"event_id".as("signup_id"), $"ts".as("s_ts"))
      p.join(sg, $"user_id" === $"s_user" &&
          $"s_ts" <= $"p_ts" && $"s_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR"))
        .select($"user_id", $"purchase_id", $"signup_id",
          unix_micros($"p_ts").as("p_us"), unix_micros($"s_ts").as("s_us"))
        .orderBy($"purchase_id", $"signup_id")
    }, Some(
      """SELECT p.user_id, p.event_id AS purchase_id, s.event_id AS signup_id,
        |  epoch_us(p.ts) AS p_us, epoch_us(s.ts) AS s_us
        |FROM events p JOIN events s
        |  ON p.user_id = s.user_id AND p.event_type = 'purchase' AND s.event_type = 'signup'
        | AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY purchase_id, signup_id""".stripMargin)),

    // ---- statistical aggregates: stddev/variance/correlation/covariance.
    // Rounded via the shared shim; computed over integer-valued l_quantity
    // and 2-decimal prices so cross-engine float drift stays far below the
    // rounding grain.
    ("q39_stats_suite", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
          round(var_samp($"l_quantity"), 4).as("var_qty"),
          round(corr($"l_quantity", $"l_extendedprice"), 5).as("corr_qty_price"),
          round(covar_samp($"l_quantity", $"l_discount"), 5).as("covar_qty_disc"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""SELECT l_returnflag,
         |  ${rndSql("stddev_samp(l_quantity)", 4)} AS sd_qty,
         |  ${rndSql("var_samp(l_quantity)", 4)} AS var_qty,
         |  ${rndSql("corr(l_quantity, l_extendedprice)", 5)} AS corr_qty_price,
         |  ${rndSql("covar_samp(l_quantity, l_discount)", 5)} AS covar_qty_disc,
         |  count(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    }),

    // ---- unpivot (wide → long): stack() is Spark's codegen-friendly
    // unpivot; the oracle is the ANSI UNION ALL equivalent.
    ("q40_unpivot", (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_partkey" <= 200)
        .select($"p_partkey",
          expr("stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (metric, val)"))
        .select($"p_partkey", $"metric", round($"val", 2).as("val"))
        .orderBy($"p_partkey", $"metric")
    }, Some(
      """SELECT p_partkey, metric, CAST(round(CAST((val) AS DECIMAL(28,8)), 2) AS DOUBLE) AS val FROM (
        |  SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part)
        |WHERE p_partkey <= 200 ORDER BY p_partkey, metric""".stripMargin)),

    // ---- arg-max/arg-min aggregation (max_by ↔ arg_max), keyed on the
    // unique event_id so ties can't make the pick engine-dependent.
    ("q41_argminmax", (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .agg(
          max_by($"event_type", $"event_id").as("last_type"),
          min_by($"event_type", $"event_id").as("first_type"),
          max($"event_id").as("max_eid"),
          count(lit(1)).as("n"))
        .orderBy($"user_id")
    }, Some(
      """SELECT user_id,
        |  arg_max(event_type, event_id) AS last_type,
        |  arg_min(event_type, event_id) AS first_type,
        |  max(event_id) AS max_eid, count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- array-function suite over the token arrays (sort/distinct/slice/
    // contains — Spark sort_array and DuckDB list_sort both order ASCII
    // strings bytewise).
    ("q42_array_ops", (s, d) => {
      import s.implicits._
      import graft.operators.Portable.tokens
      val toks = tokens($"text")
      Tables.documents(s, d)
        .filter($"doc_id" < 200)
        .select(
          $"doc_id",
          element_at(sort_array(toks), 1).as("first_alpha"),
          element_at(sort_array(toks, asc = false), 1).as("last_alpha"),
          array_contains(toks, "the").as("has_the"),
          concat_ws("-", slice(sort_array(array_distinct(toks)), 1, 3)).as("top3_alpha"))
        .orderBy($"doc_id")
    }, Some {
      import graft.operators.Portable.tokensSql
      val t = tokensSql("text")
      s"""SELECT doc_id,
         |  list_sort($t)[1] AS first_alpha,
         |  list_reverse_sort($t)[1] AS last_alpha,
         |  list_contains($t, 'the') AS has_the,
         |  array_to_string(list_sort(list_distinct($t))[1:3], '-') AS top3_alpha
         |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin
    }),

    // ---- regex extraction: first word, last word, digit-run count per part
    // name (patterns always match, sidestepping the engines' no-match
    // disagreement: Spark '' vs DuckDB NULL).
    ("q43_regexp_extract", (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_partkey" <= 500)
        .select(
          $"p_partkey",
          regexp_extract($"p_name", "^(\\w+)", 1).as("first_word"),
          regexp_extract($"p_name", "(\\w+)$", 1).as("last_word"),
          size(regexp_extract_all($"p_name", lit("[aeiou]+"), lit(0))).cast("long").as("vowel_runs"))
        .orderBy($"p_partkey")
    }, Some(
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  regexp_extract(p_name, '(\w+)$', 1) AS last_word,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS vowel_runs
        |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin)),

    // ---- RANGE window frame: 30-day moving revenue per customer. Range
    // frames include order-key peers, so same-day ties can't make the frame
    // engine-dependent; the ordering key is integer days since a fixed epoch.
    ("q44_moving_total_range", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"days").rangeBetween(-30, 0)
      Tables.orders(s, d)
        .filter($"o_custkey" < 100)
        .withColumn("days", datediff($"o_orderdate", lit("1990-01-01").cast("date")))
        .select($"o_custkey", $"o_orderkey", $"days".cast("long").as("days"),
          round(sum($"o_totalprice").over(w), 2).as("moving_total"))
        .orderBy($"o_custkey", $"days", $"o_orderkey")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""SELECT o_custkey, o_orderkey, CAST(days AS BIGINT) AS days,
         |  ${rndSql("sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY days RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)", 2)} AS moving_total
         |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
         |        date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS days
         |      FROM orders WHERE o_custkey < 100)
         |ORDER BY o_custkey, days, o_orderkey""".stripMargin
    }),

    // ---- IGNORE NULLS window navigation: carry the last seen value of a
    // sparsely-populated column forward (the gap-fill / LOCF shape).
    ("q45_last_value_ignore_nulls", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .filter($"o_custkey" < 100)
        .withColumn("sparse",
          when($"o_orderkey" % 3 === 0, round($"o_totalprice", 2)))
        .select($"o_custkey", $"o_orderkey", $"sparse",
          last($"sparse", ignoreNulls = true).over(w).as("filled"))
        .orderBy($"o_custkey", $"o_orderkey")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""SELECT o_custkey, o_orderkey, sparse,
         |  last_value(sparse IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         |FROM (SELECT o_custkey, o_orderkey,
         |        CASE WHEN o_orderkey % 3 = 0 THEN ${rndSql("o_totalprice", 2)} END AS sparse
         |      FROM orders WHERE o_custkey < 100)
         |ORDER BY o_custkey, o_orderkey""".stripMargin
    }),

    // ---- approximate quantile with a checkable contract: the sketch value
    // itself is engine-specific, so the oracle instead asserts the CONTRACT —
    // DuckDB computes the exact median and a literal TRUE; if Spark's
    // approx_percentile ever drifts outside 1% of exact, the boolean flips
    // and the hash gate fails. This is how sketch operators stay inside the
    // oracle harness instead of degrading to rows-only checks.
    ("q46_approx_quantile_check", (s, d) => {
      import s.implicits._
      val exact = expr("percentile(l_extendedprice, 0.5)")
      val approx = expr("approx_percentile(l_extendedprice, 0.5, 1000)")
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          round(exact, 2).as("exact_p50"),
          (abs(approx - exact) <= exact * 0.01).as("approx_within_1pct"))
        .orderBy($"l_returnflag")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""SELECT l_returnflag,
         |  ${rndSql("quantile_cont(l_extendedprice, 0.5)", 2)} AS exact_p50,
         |  TRUE AS approx_within_1pct
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    }),

    // ---- exact vs approximate distinct (HLL) — the 100 TB path for A4.
    // Sketch-contract oracle (same pattern as q46): the HLL estimate itself
    // is engine-specific, so the checked output is the exact count plus a
    // within-tolerance boolean (rsd 0.01, asserted within 5%), and the
    // oracle emits the exact count plus literal TRUE.
    ("q28_distinct_exact_vs_approx", (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("exact_orders"),
          approx_count_distinct($"l_orderkey", 0.01).as("approx_orders"))
        .select($"l_returnflag", $"exact_orders",
          (abs($"approx_orders" - $"exact_orders") <=
            $"exact_orders" * 0.05).as("approx_within_5pct"))
        .orderBy($"l_returnflag")
    }, Some(
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS approx_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- calendar densification (resample + zero-fill): daily order stats
    // over a fixed quarter with missing days filled — the gap-free
    // time-series shape reports need. The day spine is generated, not
    // scanned; the left join keys on the derived date.
    ("q47_daily_resample", (s, d) => {
      import s.implicits._
      val days = s.range(1).select(explode(sequence(
        lit("1995-01-01").cast("date"), lit("1995-03-31").cast("date"),
        expr("INTERVAL 1 DAY"))).as("day"))
      val agg = Tables.orders(s, d)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1995-04-01").cast("timestamp"))
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_orders"), round(sum($"o_totalprice"), 2).as("total"))
      days.join(agg, Seq("day"), "left")
        .select($"day",
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          coalesce($"total", lit(0.0)).as("total"))
        .orderBy($"day")
    }, Some(
      """WITH days AS (
        |  SELECT CAST(unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-03-31', INTERVAL 1 DAY)) AS DATE) AS day),
        |agg AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
        |    CAST(round(CAST((sum(o_totalprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS total
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
        |  GROUP BY 1)
        |SELECT d.day, CAST(coalesce(a.n_orders, 0) AS BIGINT) AS n_orders,
        |  coalesce(a.total, 0.0) AS total
        |FROM days d LEFT JOIN agg a USING (day) ORDER BY d.day""".stripMargin)),

    // ---- CDC → SCD2 history: collapse each user's event stream into
    // type-change intervals (valid_from/valid_to, NULL = current) — the
    // gaps-and-islands shape that turns a change feed into a slowly-changing
    // dimension. Change rows are detected with lag() per user, interval ends
    // with lead() over the change rows; (ts, event_id) breaks timestamp ties
    // deterministically on both engines.
    ("q49_scd2_intervals", (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val changes = Tables.events(s, d)
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("prev_type", lag($"event_type", 1).over(byUser))
        .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      changes
        .withColumn("valid_to_ts", lead($"ts", 1).over(byUser))
        .select($"user_id", $"event_type",
          unix_micros($"ts").as("valid_from_us"),
          unix_micros($"valid_to_ts").as("valid_to_us"))
        .orderBy($"user_id", $"valid_from_us")
    }, Some(
      """WITH changes AS (
        |  SELECT user_id, event_type, ts, event_id
        |  FROM (SELECT user_id, event_type, ts, event_id,
        |          lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |        FROM events)
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type,
        |  epoch_us(ts) AS valid_from_us,
        |  epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us
        |FROM changes
        |ORDER BY user_id, valid_from_us""".stripMargin)),

    // ---- MERGE/upsert: apply a CDC change set (inserts + updates +
    // deletes) to a base snapshot in one full-outer join — the "apply"
    // half of change data capture (q25 is the "capture" half). The change
    // set is derived deterministically from orders so both engines build
    // identical inputs: every 10th key is an update (+1 totalprice), every
    // 17th a delete, and shifted keys are inserts.
    ("q50_merge_upsert", (s, d) => {
      import s.implicits._
      val base = Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val changes = base.filter($"o_orderkey" % 10 === 0)
        .select($"o_orderkey", $"o_custkey",
          round($"o_totalprice" + 1.0, 2).as("o_totalprice"), lit("update").as("op"))
        .unionByName(base.filter($"o_orderkey" % 17 === 0)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", lit("delete").as("op")))
        .unionByName(base.filter($"o_orderkey" % 23 === 0)
          .select(($"o_orderkey" + 10000000L).as("o_orderkey"), $"o_custkey",
            round($"o_totalprice", 2).as("o_totalprice"), lit("insert").as("op")))
      // deletes win over updates for keys matching both (10 and 17): take
      // the op of highest precedence per key, deterministically
      val w = Window.partitionBy($"o_orderkey")
        .orderBy(when($"op" === "delete", 0).when($"op" === "update", 1).otherwise(2))
      val c1 = changes.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
      base.as("b").join(c1.as("c"), Seq("o_orderkey"), "full_outer")
        .filter($"c.op".isNull || $"c.op" =!= "delete")
        .select($"o_orderkey",
          coalesce($"c.o_custkey", $"b.o_custkey").as("o_custkey"),
          round(coalesce($"c.o_totalprice", $"b.o_totalprice"), 2).as("o_totalprice"))
        .orderBy($"o_orderkey")
    }, Some(
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |changes AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(round(CAST((o_totalprice + 1.0) AS DECIMAL(28,8)), 2) AS DOUBLE) AS o_totalprice,
        |    'update' AS op
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice, 'delete' FROM base WHERE o_orderkey % 17 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey,
        |    CAST(round(CAST((o_totalprice) AS DECIMAL(28,8)), 2) AS DOUBLE), 'insert'
        |  FROM base WHERE o_orderkey % 23 = 0),
        |c1 AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY CASE op WHEN 'delete' THEN 0 WHEN 'update' THEN 1 ELSE 2 END) AS rn
        |    FROM changes) WHERE rn = 1)
        |SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
        |  CAST(round(CAST((coalesce(c.o_totalprice, b.o_totalprice)) AS DECIMAL(28,8)), 2) AS DOUBLE) AS o_totalprice
        |FROM base b FULL OUTER JOIN c1 c ON b.o_orderkey = c.o_orderkey
        |WHERE c.op IS NULL OR c.op <> 'delete'
        |ORDER BY o_orderkey""".stripMargin)),

    // ---- bag-semantics set operations (INTERSECT ALL / EXCEPT ALL —
    // multiplicity-aware, distinct operators from q12/q13's set forms).
    // Output is the per-key multiplicity so the bag result compares stably.
    ("q48_bag_set_ops", (s, d) => {
      import s.implicits._
      def a = Tables.lineitem(s, d).filter($"l_quantity" <= 10).select($"l_partkey")
      def b = Tables.lineitem(s, d).filter($"l_returnflag" === "R").select($"l_partkey")
      val ia = a.intersectAll(b).groupBy($"l_partkey")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val ea = a.exceptAll(b).groupBy($"l_partkey")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      ia.unionByName(ea)
        .select($"op", $"l_partkey", $"n")
        .orderBy($"op", $"l_partkey")
    }, Some(
      """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity <= 10),
        |b AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
        |ia AS (SELECT l_partkey FROM a INTERSECT ALL SELECT l_partkey FROM b),
        |ea AS (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b)
        |SELECT 'intersect_all' AS op, l_partkey, count(*) AS n FROM ia GROUP BY l_partkey
        |UNION ALL
        |SELECT 'except_all' AS op, l_partkey, count(*) AS n FROM ea GROUP BY l_partkey
        |ORDER BY op, l_partkey""".stripMargin)),

    // ---- ordered funnel: signup → first view at-or-after it → first
    // purchase at-or-after that, per user. Every stage is a user-keyed
    // aggregation joined to the previous stage's output — all three
    // shuffles share the user_id key, so at scale they co-partition and
    // AQE reuses the exchange instead of re-shuffling the events table.
    ("q51_funnel", (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val su = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("t_s"))
      val vw = ev.filter($"event_type" === "view").join(su, "user_id")
        .filter($"ts" >= $"t_s")
        .groupBy($"user_id").agg(min($"ts").as("t_v"))
      val pu = ev.filter($"event_type" === "purchase").join(vw, "user_id")
        .filter($"ts" >= $"t_v")
        .groupBy($"user_id").agg(min($"ts").as("t_p"))
      su.agg(count(lit(1)).as("n_signup"))
        .crossJoin(vw.agg(count(lit(1)).as("n_viewed")))
        .crossJoin(pu.agg(count(lit(1)).as("n_purchased")))
    }, Some(
      """WITH s AS (
        |  SELECT user_id, min(ts) AS t_s FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |v AS (
        |  SELECT e.user_id, min(e.ts) AS t_v
        |  FROM events e JOIN s ON s.user_id = e.user_id
        |  WHERE e.event_type = 'view' AND e.ts >= s.t_s GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_p
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= v.t_v GROUP BY e.user_id)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup,
        |       (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
        |       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased""".stripMargin)),

    // ---- weekly retention cohorts: users bucketed by first-signup week,
    // activity counted per (cohort week, weeks-since-signup). Both engines
    // truncate weeks to Monday and the week offset is exact integer
    // arithmetic on day differences of week-aligned midnights.
    ("q52_retention_cohorts", (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val cohort = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(date_trunc("week", min($"ts")).as("cw"))
      val act = ev.select($"user_id", date_trunc("week", $"ts").as("aw"))
      cohort.join(act, "user_id")
        .filter($"aw" >= $"cw")
        .select($"cw", (datediff($"aw", $"cw") / 7).cast("long").as("week_offset"), $"user_id")
        .groupBy($"cw", $"week_offset")
        .agg(countDistinct($"user_id").as("n_users"))
        .select($"cw".cast("date").as("cohort_week"), $"week_offset", $"n_users")
        .orderBy($"cohort_week", $"week_offset")
    }, Some(
      """WITH c AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT user_id, date_trunc('week', ts) AS aw FROM events)
        |SELECT CAST(cw AS DATE) AS cohort_week,
        |  date_diff('day', cw, aw) // 7 AS week_offset,
        |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users
        |FROM c JOIN a ON a.user_id = c.user_id
        |WHERE aw >= cw GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- interval sweep-line: peak concurrency of 5-minute activity
    // windows (each event is active [ts, ts+5min)). Boundary events ±1,
    // running sum in (ts, delta) order — the -1 leaves before the +1 enters
    // at the same instant, making intervals half-open. Per event-type so
    // the output exercises grouped sweeps. SCALE NOTE: a sweep-line needs a
    // total order per group; the per-type global window here is the
    // small-group form (20 types × bounded rows). The sharded-timeline
    // production form is BUILT as q59_peak_concurrency_sharded below —
    // same oracle, hash-identical output, per-(type,bucket) windows only.
    ("q53_peak_concurrency", (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val bounds = ev.select($"event_type", $"ts", lit(1L).as("delta"))
        .unionByName(ev.select($"event_type",
          ($"ts" + expr("INTERVAL 5 MINUTES")).as("ts"), lit(-1L).as("delta")))
      val w = Window.partitionBy($"event_type").orderBy($"ts", $"delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds
        .withColumn("conc", sum($"delta").over(w))
        .groupBy($"event_type")
        .agg(max($"conc").as("peak_concurrency"),
          unix_micros(min(when($"delta" === 1, $"ts"))).as("first_event_us"),
          count(when($"delta" === 1, lit(1))).as("n_events"))
        .orderBy($"event_type")
    }, Some(
      """WITH bounds AS (
        |  SELECT event_type, ts, CAST(1 AS BIGINT) AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 5 MINUTE, CAST(-1 AS BIGINT) FROM events),
        |swept AS (
        |  SELECT event_type, ts, delta,
        |    sum(delta) OVER (PARTITION BY event_type ORDER BY ts, delta
        |      ROWS UNBOUNDED PRECEDING) AS conc
        |  FROM bounds)
        |SELECT event_type,
        |  CAST(max(conc) AS BIGINT) AS peak_concurrency,
        |  epoch_us(min(CASE WHEN delta = 1 THEN ts END)) AS first_event_us,
        |  count(CASE WHEN delta = 1 THEN 1 END) AS n_events
        |FROM swept GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- q59: the SHARDED form of q53's sweep-line — the production shape
    // at 100 TB, hash-checked against the very same oracle. q53's window
    // partitions by event_type alone, so one type's whole timeline lands in
    // one task; here the timeline is time-range-bucketed first:
    //   1. per (type, bucket) window — bounded by bucket width, not corpus
    //      size — computes the local running sum, local peak, local total;
    //   2. a tiny per-type window over the BUCKET AGGREGATES (row count =
    //      #buckets, independent of data volume) prefix-sums bucket totals
    //      into each bucket's starting offset;
    //   3. peak = max(offset + local_peak) — an ordinary hash agg.
    // Bucketing by ts keeps equal-ts rows in one shard, so the (ts, delta)
    // tie order — and therefore the sweep — is identical to q53's. The
    // bucket width (1 hour here) is the memory knob: at higher density,
    // narrow it; the algorithm is exact for any width.
    ("q59_peak_concurrency_sharded", (s, d) => {
      import s.implicits._
      val bucketUs = 3600L * 1000000L
      val ev = Tables.events(s, d)
      val bounds = ev.select($"event_type", $"ts", lit(1L).as("delta"))
        .unionByName(ev.select($"event_type",
          ($"ts" + expr("INTERVAL 5 MINUTES")).as("ts"), lit(-1L).as("delta")))
        .withColumn("bucket", (unix_micros($"ts") / bucketUs).cast("long"))
      val wLocal = Window.partitionBy($"event_type", $"bucket")
        .orderBy($"ts", $"delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val perBucket = bounds
        .withColumn("running", sum($"delta").over(wLocal))
        .groupBy($"event_type", $"bucket")
        .agg(max($"running").as("local_peak"),
          sum($"delta").as("local_total"),
          unix_micros(min(when($"delta" === 1, $"ts"))).as("first_in_us"),
          count(when($"delta" === 1, lit(1))).as("n_in"))
      val wOffset = Window.partitionBy($"event_type").orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      perBucket
        .withColumn("offset", coalesce(sum($"local_total").over(wOffset), lit(0L)))
        .groupBy($"event_type")
        .agg(max($"offset" + $"local_peak").as("peak_concurrency"),
          min($"first_in_us").as("first_event_us"),
          sum($"n_in").as("n_events"))
        .orderBy($"event_type")
    }, Some(
      // same truth as q53 — the whole point: the sharded plan must be
      // indistinguishable from the single-window sweep, hash for hash
      """WITH bounds AS (
        |  SELECT event_type, ts, CAST(1 AS BIGINT) AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, ts + INTERVAL 5 MINUTE, CAST(-1 AS BIGINT) FROM events),
        |swept AS (
        |  SELECT event_type, ts, delta,
        |    sum(delta) OVER (PARTITION BY event_type ORDER BY ts, delta
        |      ROWS UNBOUNDED PRECEDING) AS conc
        |  FROM bounds)
        |SELECT event_type,
        |  CAST(max(conc) AS BIGINT) AS peak_concurrency,
        |  epoch_us(min(CASE WHEN delta = 1 THEN ts END)) AS first_event_us,
        |  count(CASE WHEN delta = 1 THEN 1 END) AS n_events
        |FROM swept GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- first-order Markov transition matrix over per-user event
    // sequences: lag window per user (bounded partitions), then one
    // map-combinable count aggregate; the row-normalized probability uses
    // a window over the ~25 distinct from-types, never the event table.
    // Ties on ts break by event_id so the sequence order is total and
    // engine-independent.
    ("q54_markov_transitions", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val trans = Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
        .agg(count(lit(1)).as("n"))
      val wf = Window.partitionBy($"from_type")
      trans
        .withColumn("p", round($"n" / sum($"n").over(wf), 4))
        .orderBy($"from_type", $"to_type")
    }, Some(
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |trans AS (
        |  SELECT from_type, to_type, count(*) AS n FROM seq
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(round(CAST(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS DECIMAL(28,8)), 4) AS DOUBLE) AS p
        |FROM trans ORDER BY from_type, to_type""".stripMargin)),

    // ---- q55: frequent event-type trigrams (order-2 sequence mining —
    // q54's Markov matrix extended one step). Two leads over the per-user
    // time order produce each length-3 subsequence in one pass; support
    // counts both occurrences and distinct carriers. The global top-k window
    // runs over the trigram COUNT table — at most |event_types|³ rows
    // regardless of corpus size — so the unpartitioned row_number is not a
    // scale hazard.
    ("q55_event_trigrams", (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val counts = Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("t2", lead($"event_type", 1).over(w))
        .withColumn("t3", lead($"event_type", 2).over(w))
        .filter($"t3".isNotNull)
        .groupBy($"event_type".as("t1"), $"t2", $"t3")
        .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"))
      counts
        .withColumn("rank",
          row_number().over(Window.orderBy($"n".desc, $"t1", $"t2", $"t3")).cast("long"))
        .filter($"rank" <= 20)
        .select($"rank", $"t1", $"t2", $"t3", $"n", $"n_users")
        .orderBy($"rank")
    }, Some(
      """WITH sq AS (
        |  SELECT user_id, event_type AS t1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
        |  FROM events),
        |c AS (
        |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM sq WHERE t3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT * FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY n DESC, t1, t2, t3) AS BIGINT) AS rank,
        |    t1, t2, t3, n, n_users FROM c)
        |WHERE rank <= 20 ORDER BY rank""".stripMargin)),

    // ---- q56: hourly event-rate anomaly flags, integer-exact. Each
    // (type, hour) count is judged against its trailing 24 OBSERVED hourly
    // buckets (≥12 required): anomaly ⟺ (x−μ)² > 9σ², evaluated without
    // ever materializing μ or σ — cross-multiplied to
    // (x·m − Σx)² > 9·(m·Σx² − (Σx)²), all integer terms, so both engines
    // compute the same booleans with no float accumulation. The squared
    // terms route through DECIMAL(38,0)/HUGEINT: at ~6·10⁸ events per
    // hourly cell the BIGINT square would wrap. Scale shape: one hash
    // aggregation to hourly grain, then a bounded 24-row window per type —
    // the window input is |types|·|hours|, not the event count.
    ("q56_rate_anomaly", (s, d) => {
      import s.implicits._
      val hc = Tables.events(s, d)
        .groupBy($"event_type", date_trunc("hour", $"ts").as("hr"))
        .agg(count(lit(1)).as("n"))
      val win = Window.partitionBy($"event_type").orderBy($"hr").rowsBetween(-24, -1)
      val dev = ($"n" * $"m" - $"sx").cast("decimal(38,0)")
      val varTerm = ($"m" * $"sx2" - $"sx" * $"sx").cast("decimal(38,0)")
      hc.withColumn("m", count($"n").over(win))
        .withColumn("sx", sum($"n").over(win))
        .withColumn("sx2", sum($"n" * $"n").over(win))
        .filter($"m" >= 12)
        .withColumn("is_anomaly", dev * dev > lit(9).cast("decimal(38,0)") * varTerm)
        .select($"event_type", $"hr", $"n", $"m", $"sx", $"sx2", $"is_anomaly")
        .orderBy($"event_type", $"hr")
    }, Some(
      """WITH hc AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hr, n,
        |    CAST(count(n) OVER win AS BIGINT) AS m,
        |    CAST(sum(n) OVER win AS BIGINT) AS sx,
        |    CAST(sum(n*n) OVER win AS BIGINT) AS sx2
        |  FROM hc
        |  WINDOW win AS (PARTITION BY event_type ORDER BY hr ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hr, n, m, sx, sx2,
        |  (CAST(n*m - sx AS HUGEINT) * CAST(n*m - sx AS HUGEINT)
        |     > 9 * CAST(m*sx2 - sx*sx AS HUGEINT)) AS is_anomaly
        |FROM w WHERE m >= 12 ORDER BY event_type, hr""".stripMargin)),

    // ---- q57: robust outlier counts via median absolute deviation — the
    // heavy-tail-safe monitoring stat (mean/stddev blow up on the very
    // outliers they're meant to find). Both medians are Spark's exact
    // `median` == DuckDB's interpolating `median` (the q27-proven parity);
    // the 3·MAD comparison runs on identical doubles on both engines, so
    // the flag booleans agree bit-for-bit. Scale note: exact median needs a
    // per-type sort — at 100 TB swap `median` for `percentile_approx` and
    // keep the identical downstream shape (the oracle then becomes a
    // tolerance check, the documented trade).
    ("q57_mad_outliers", (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"value")
      val med = ev.groupBy($"event_type").agg(median($"value").as("med"))
      val dev = ev.join(med, "event_type")
      val mad = dev.withColumn("adev", abs($"value" - $"med"))
        .groupBy($"event_type").agg(median($"adev").as("mad"))
      dev.join(mad, "event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          round(min($"med"), 4).as("med"),
          round(min($"mad"), 4).as("mad"),
          sum(when(abs($"value" - $"med") > $"mad" * 3, 1L).otherwise(0L)).as("n_outliers"))
        .orderBy($"event_type")
    }, Some(
      s"""WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
         |dev AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
         |        FROM events e JOIN med m USING (event_type)),
         |mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1)
         |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
         |  ${Portable.rndSql("min(d.med)", 4)} AS med, ${Portable.rndSql("min(mad.mad)", 4)} AS mad,
         |  CAST(sum(CASE WHEN abs(d.value - d.med) > mad.mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dev d JOIN mad USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- q58: backward as-of join — each purchase matched to the latest
    // click AT OR BEFORE it by the same user (attribution, quote-to-trade,
    // sensor alignment). Spark has no ASOF JOIN operator; the scalable
    // encoding is union-tag + one running window: tag clicks 0 / purchases
    // 1, sort each user's timeline by (ts, tag) so a same-instant click is
    // visible to its purchase, and carry the last non-null click forward
    // (`last(_, ignoreNulls)` over an unbounded-preceding window). One
    // shuffle on user_id, O(1) state per row — vs the naive range-join
    // (per-purchase scan of all prior clicks, quadratic per hot user).
    // DuckDB cross-checks with its NATIVE `ASOF LEFT JOIN` — an
    // independent implementation of the same semantics, not an SQL
    // transliteration of ours. Clicks are deduped to max(event_id) per
    // (user, ts) first: ASOF's pick among equal timestamps is otherwise
    // unspecified. Lag is exact integer microseconds (unix_micros /
    // epoch_us) — no boundary-counting datediff drift.
    ("q58_asof_join", (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val tagged = clicks
        .select($"user_id", $"ts", lit(0).as("tag"), lit(null).cast("long").as("event_id"), $"click_id")
        .unionByName(purchases.select($"user_id", $"ts", lit(1).as("tag"), $"event_id",
          lit(null).cast("long").as("click_id")))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when($"tag" === 0, $"ts"), ignoreNulls = true).over(w))
        .filter($"tag" === 1)
        .select($"event_id", $"user_id", $"ts",
          $"last_click_id".as("click_id"), $"last_click_ts".as("click_ts"),
          (unix_micros($"ts") - unix_micros($"last_click_ts")).as("lag_us"))
        .orderBy($"event_id")
    }, Some(
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, c.click_id, c.ts AS click_ts,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        |FROM p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin)),

    // ---- q60: funnel conversion latency per signup-day cohort — how
    // long completed signup→view→purchase journeys take per first-signup
    // DAY cohort, summarized as
    // interpolated median/p90 (the q27/q33-proven percentile parity;
    // latencies are exact integer microsecond differences, so the
    // interpolation runs on identical doubles in both engines). Reuses
    // q51's min-ts chain semantics verbatim; the per-cohort groups are
    // day-bounded so the exact-percentile sort is cohort-local, never
    // corpus-wide.
    ("q60_time_to_convert", (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val su = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("t_s"))
      val vw = ev.filter($"event_type" === "view").join(su, "user_id")
        .filter($"ts" >= $"t_s")
        .groupBy($"user_id").agg(min($"ts").as("t_v"))
      val pu = ev.filter($"event_type" === "purchase").join(vw, "user_id")
        .filter($"ts" >= $"t_v")
        .groupBy($"user_id").agg(min($"ts").as("t_p"))
      su.join(pu, "user_id")
        .select(date_trunc("day", $"t_s").as("cohort_day"),
          (unix_micros($"t_p") - unix_micros($"t_s")).as("lat_us"))
        .groupBy($"cohort_day")
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(lat_us, 0.5)"), 2).as("med_lat_us"),
          round(expr("percentile(lat_us, 0.9)"), 2).as("p90_lat_us"))
        .orderBy($"cohort_day")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""WITH s AS (
         |  SELECT user_id, min(ts) AS t_s FROM events
         |  WHERE event_type = 'signup' GROUP BY user_id),
         |v AS (
         |  SELECT e.user_id, min(e.ts) AS t_v
         |  FROM events e JOIN s ON s.user_id = e.user_id
         |  WHERE e.event_type = 'view' AND e.ts >= s.t_s GROUP BY e.user_id),
         |p AS (
         |  SELECT e.user_id, min(e.ts) AS t_p
         |  FROM events e JOIN v ON v.user_id = e.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts >= v.t_v GROUP BY e.user_id),
         |conv AS (
         |  SELECT date_trunc('day', s.t_s) AS cohort_day,
         |    epoch_us(p.t_p) - epoch_us(s.t_s) AS lat_us
         |  FROM s JOIN p USING (user_id))
         |SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_converted,
         |  ${rndSql("quantile_cont(lat_us, 0.5)", 2)} AS med_lat_us,
         |  ${rndSql("quantile_cont(lat_us, 0.9)", 2)} AS p90_lat_us
         |FROM conv GROUP BY cohort_day ORDER BY cohort_day""".stripMargin
    }),

    // ---- sketch-based quantiles vs exact (the A4 distinct-count pattern
    // applied to percentiles): exact `percentile` needs a per-group sort of
    // every value — fine per cohort, impossible corpus-wide at 100 TB —
    // while `percentile_approx` is Spark's mergeable Greenwald-Khanna-style
    // sketch with bounded state and a rank-error guarantee of 1/accuracy.
    // The contract emits the EXACT p50/p90 per lang (DuckDB quantile_cont
    // parity, the q27/q60-proven shim) plus booleans pinning the sketch
    // value inside the exact [q−0.01, q+0.01] percentile envelope — 10×
    // the sketch's 1/1000 design error, so the booleans hold however Spark
    // partitions or merges the sketch, and the oracle pins them TRUE.
    ("q61_approx_quantiles", (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
          round(expr("percentile(n_chars, 0.9)"), 2).as("p90"),
          expr("percentile_approx(n_chars, 0.5, 1000)").as("a50"),
          expr("percentile_approx(n_chars, 0.9, 1000)").as("a90"),
          expr("percentile(n_chars, 0.49)").as("lo50"),
          expr("percentile(n_chars, 0.51)").as("hi50"),
          expr("percentile(n_chars, 0.89)").as("lo90"),
          expr("percentile(n_chars, 0.91)").as("hi90"))
        .select($"lang", $"n", $"p50", $"p90",
          ($"a50" >= $"lo50" && $"a50" <= $"hi50").as("a50_ok"),
          ($"a90" >= $"lo90" && $"a90" <= $"hi90").as("a90_ok"))
        .orderBy($"lang")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""SELECT lang, count(*) AS n,
         |  ${rndSql("quantile_cont(n_chars, 0.5)", 2)} AS p50,
         |  ${rndSql("quantile_cont(n_chars, 0.9)", 2)} AS p90,
         |  TRUE AS a50_ok, TRUE AS a90_ok
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    }),

    // ---- sketch-COLUMN pre-aggregation: per-shard HyperLogLog sketches
    // merged downstream (Datasketches HLL: insertion is hash-deterministic
    // and union is register-wise max — order-free, so the merged estimate
    // is bit-stable under any shard order). This is the 100 TB manifest
    // pattern approx_count_distinct (q28) can't express: q28's sketch
    // lives and dies inside one aggregation, while a sketch COLUMN is
    // stored per shard/day and unioned later for any rollup without
    // touching the raw data again. Contract: exact per-type distinct users
    // (oracle-exact) + the merged-sketch estimate pinned inside ±10% of
    // exact (the lgK=12 design error is ~1.6%·3σ ≈ 5%, doubled for slack)
    // — the q28/q46 exact-value + literal-TRUE pattern.
    ("q62_hll_shard_merge", (s, d) => {
      import s.implicits._
      val perShard = Tables.events(s, d)
        .withColumn("shard", pmod($"event_id", lit(8)))
        .groupBy($"event_type", $"shard")
        .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"),
          count(lit(1)).as("pn"))
      perShard.groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"),
          sum($"pn").as("n_events"))
        .join(Tables.events(s, d).groupBy($"event_type")
          .agg(countDistinct($"user_id").as("n_exact")), "event_type")
        .select($"event_type", $"n_events", $"n_exact",
          (abs($"est" - $"n_exact") <= $"n_exact" * 0.1).as("hll_ok"))
        .orderBy($"event_type")
    }, Some(
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_exact, TRUE AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- binned interval join: events matched into time windows (derived
    // maintenance windows: per type, 5 slots of 1/20 of the ts range). The
    // naive formulation is a BETWEEN-predicate join — with only a coarse
    // equality key it degenerates to a nested-loop multiplied by the hot
    // key, the classic range-join cliff at scale. The scale shape used
    // here: pick a bucket width, EXPLODE each interval into the buckets it
    // covers (bounded fan-out: interval length / width + 1), equi-join
    // events on (type, bucket), then apply the exact containment filter —
    // a plain shuffled hash join whose key cardinality the bucket width
    // controls. All window arithmetic is exact integer microseconds, so
    // the derived intervals are bit-identical in both engines; the oracle
    // is the naive BETWEEN join (DuckDB's IEJoin handles it fine at
    // oracle scale).
    ("q63_interval_bin_join", (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select($"event_type", unix_micros($"ts").as("ts_us"), $"value")
      // `div` throughout: Spark's `/` on longs is DOUBLE division, and a
      // float quotient of microsecond magnitudes can land off-by-one after
      // floor — integer div keeps every boundary exact in both engines
      val st = ev.groupBy($"event_type")
        .agg(min($"ts_us").as("lo"), max($"ts_us").as("hi"))
        .withColumn("width", expr("(hi - lo) div 40 + 1"))
      val iv2 = st.select($"event_type", $"lo", $"hi", $"width",
          explode(sequence(lit(0L), lit(4L))).as("k"))
        .withColumn("ws", expr("lo + k * ((hi - lo) div 5)"))
        .withColumn("we", expr("ws + (hi - lo) div 20 + 1"))
      val ivBuckets = iv2.select($"event_type", $"k", $"ws", $"we", $"lo", $"width",
          explode(sequence(expr("(ws - lo) div width"),
            expr("(we - 1 - lo) div width"))).as("bucket"))
      val evBuckets = ev.join(broadcast(st.select($"event_type", $"lo", $"width")), "event_type")
        .withColumn("bucket", expr("(ts_us - lo) div width"))
      val matched = evBuckets.join(ivBuckets.select($"event_type", $"k", $"ws", $"we", $"bucket"),
          Seq("event_type", "bucket"))
        .filter($"ts_us" >= $"ws" && $"ts_us" < $"we")
        .groupBy($"event_type", $"k")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
      iv2.select($"event_type", $"k")
        .join(matched, Seq("event_type", "k"), "left")
        .select($"event_type", $"k",
          coalesce($"n_events", lit(0L)).as("n_events"),
          coalesce($"total_value", lit(0.0)).as("total_value"))
        .orderBy($"event_type", $"k")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS ts_us, value FROM events),
         |st AS (SELECT event_type, min(ts_us) AS lo, max(ts_us) AS hi FROM ev GROUP BY 1),
         |iv AS (
         |  SELECT event_type, k, lo + k * ((hi - lo) // 5) AS ws,
         |    lo + k * ((hi - lo) // 5) + (hi - lo) // 20 + 1 AS we
         |  FROM st, (SELECT unnest(range(0, 5)) AS k)),
         |m AS (
         |  SELECT i.event_type, i.k, count(e.ts_us) AS n_events,
         |    ${rndSql("coalesce(sum(e.value), 0.0)", 2)} AS total_value
         |  FROM iv i LEFT JOIN ev e
         |    ON e.event_type = i.event_type AND e.ts_us >= i.ws AND e.ts_us < i.we
         |  GROUP BY 1, 2)
         |SELECT event_type, CAST(k AS BIGINT) AS k, n_events, total_value
         |FROM m ORDER BY event_type, k""".stripMargin
    }),

    // ---- q64: changelog compaction — collapse each key's ordered op log to
    // its NET effect (the Debezium/Kafka-log-compaction shape: I…D cancels
    // out entirely, I…U nets to one insert with the final value, U…D nets
    // to a delete, anything else nets to one update). The events stream is
    // read as a CDC log: signup=insert, error=delete, other activity=
    // update, keyed by user_id and ordered by (ts, event_id). One shuffle:
    // a single window sort per key computes first-op/last-op/last-value in
    // the same pass (explicit unbounded frame so first/last are
    // deterministic), then DISTINCT folds the per-key constants to one row.
    // At 100 TB this is the nightly "compact the day's CDC feed before
    // merging" step — per-key state is O(1), no driver involvement.
    ("q64_changelog_compact", (s, d) => {
      import s.implicits._
      val log = Tables.events(s, d)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"value",
          when($"event_type" === "signup", "I")
            .when($"event_type" === "error", "D")
            .otherwise("U").as("op"))
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val per = log.select(
        $"user_id",
        first($"op").over(w).as("first_op"),
        last($"op").over(w).as("last_op"),
        last($"value").over(w).as("last_value"),
        count(lit(1)).over(Window.partitionBy($"user_id")).as("n_ops"))
        .distinct()
      per
        .withColumn("net_op",
          when($"last_op" === "D" && $"first_op" === "I", "none")
            .when($"last_op" === "D", "delete")
            .when($"first_op" === "I", "insert")
            .otherwise("update"))
        .select($"user_id", $"net_op", $"n_ops",
          when($"net_op".isin("delete", "none"), lit(null).cast("double"))
            .otherwise(round($"last_value", 2)).as("net_value"))
        .orderBy($"user_id")
    }, Some {
      import graft.operators.Portable.rndSql
      s"""WITH log AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
         |    CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op
         |  FROM events),
         |per AS (
         |  SELECT DISTINCT user_id,
         |    first_value(op) OVER w AS first_op,
         |    last_value(op) OVER w AS last_op,
         |    last_value(value) OVER w AS last_value,
         |    count(*) OVER (PARTITION BY user_id) AS n_ops
         |  FROM log
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
         |net AS (
         |  SELECT user_id,
         |    CASE WHEN last_op = 'D' AND first_op = 'I' THEN 'none'
         |         WHEN last_op = 'D' THEN 'delete'
         |         WHEN first_op = 'I' THEN 'insert'
         |         ELSE 'update' END AS net_op,
         |    n_ops, last_value
         |  FROM per)
         |SELECT user_id, net_op, n_ops,
         |  CASE WHEN net_op IN ('delete', 'none') THEN NULL
         |       ELSE ${rndSql("last_value", 2)} END AS net_value
         |FROM net ORDER BY user_id""".stripMargin
    }),

    // ---- q65: NEAREST-match as-of join — each purchase matched to the
    // CLOSEST same-user signup in either direction (q58/q23 are
    // backward-only; sensor/feature alignment wants the nearer of the two
    // sides). Same windowed shape, one sort per user: a backward
    // unbounded-preceding max and a forward unbounded-following min over
    // the signup timestamps, then an integer gap comparison picks the
    // direction (ties → backward, the as-of convention). No
    // self-join — the probe and build sides are the same sorted stream,
    // so at 100 TB this costs exactly one shuffle on user_id.
    ("q65_asof_nearest", (s, d) => {
      import s.implicits._
      val sigTs = when($"event_type" === "signup", unix_micros($"ts"))
      val wb = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wf = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(1, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("before_us", max(sigTs).over(wb))
        .withColumn("after_us", min(sigTs).over(wf))
        .filter($"event_type" === "purchase")
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("direction",
          when($"before_us".isNull && $"after_us".isNull, "none")
            .when($"after_us".isNull, "backward")
            .when($"before_us".isNull, "forward")
            .when($"ts_us" - $"before_us" <= $"after_us" - $"ts_us", "backward")
            .otherwise("forward"))
        .withColumn("nearest_us",
          when($"direction" === "backward", $"before_us")
            .when($"direction" === "forward", $"after_us"))
        .select($"event_id", $"user_id", $"ts_us",
          $"before_us", $"after_us", $"nearest_us", $"direction")
        .orderBy($"event_id")
    }, Some(
      """SELECT event_id, user_id, ts_us, before_us, after_us,
        |  CASE direction WHEN 'backward' THEN before_us
        |       WHEN 'forward' THEN after_us END AS nearest_us,
        |  direction
        |FROM (
        |  SELECT event_id, user_id, ts_us, before_us, after_us,
        |    CASE WHEN before_us IS NULL AND after_us IS NULL THEN 'none'
        |         WHEN after_us IS NULL THEN 'backward'
        |         WHEN before_us IS NULL THEN 'forward'
        |         WHEN ts_us - before_us <= after_us - ts_us THEN 'backward'
        |         ELSE 'forward' END AS direction
        |  FROM (
        |    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |      max(CASE WHEN event_type='signup' THEN epoch_us(ts) END)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_us,
        |      min(CASE WHEN event_type='signup' THEN epoch_us(ts) END)
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS after_us
        |    FROM events)
        |  WHERE event_type = 'purchase')
        |ORDER BY event_id""".stripMargin)),

    // ---- KMV (k-minimum-values / bottom-k) distinct sketches as COLUMNS,
    // with set INTERSECTION — the audience-overlap estimate HLL cannot give
    // (HLL unions; KMV's kth-smallest-hash sample supports Jaccard): per
    // event type, keep the K=64 smallest h60 hashes of the distinct
    // (user, day) active pairs; for a pair of types, the bottom-K of the
    // union is a uniform coordinated sample, the fraction of it present in
    // BOTH sketches estimates Jaccard (Beyer et al. 2007), and
    // (K−1)·2⁶⁰/kth_min estimates the union cardinality. Deterministic end
    // to end: the "sample" is the hash order itself, both engines rebuild
    // it bit-identically, and the estimator arithmetic is integer (div-
    // first quantization documented inline). The exact legs (n1/n2/inter)
    // are EVAL columns computable here because |distinct| is small; at
    // 100 TB only the O(K) sketches ship — per-shard bottom-K states merge
    // by sorted-union-truncate (BottomKAgg), raw pairs never re-scanned.
    // Caveats (ADVICE r10): type pairs with ZERO shared (user, day) hashes
    // stay in the report (left join, jaccard 0) — absence of overlap is a
    // finding, not a missing row; and the exact_* columns are exact over
    // the 60-bit hashes of the pairs, i.e. exact modulo h60 collisions
    // (~10⁻¹⁸ per pair at these cardinalities), not over raw pairs.
    ("q66_kmv_audience", (s, d) => {
      import s.implicits._
      val K = 64
      val bottomK = udaf(new graft.functions.BottomKAgg(K)).withName(s"bottom_k_$K")
      val ud = Tables.events(s, d)
        .select($"event_type",
          Portable.h60(concat_ws("|", $"user_id", to_date($"ts").cast("string"))).as("h"))
        .distinct()
      val sk = ud
        .select($"event_type", lpad($"h".cast("string"), 20, "0").as("k"), $"h")
        .groupBy($"event_type")
        .agg(bottomK($"k", $"h").as("sk"), count(lit(1)).as("n_exact"))
      val inter = ud.as("x")
        .join(ud.as("y"), $"x.h" === $"y.h" && $"x.event_type" < $"y.event_type")
        .groupBy($"x.event_type".as("e1"), $"y.event_type".as("e2"))
        .agg(count(lit(1)).as("inter"))
      sk.select($"event_type".as("e1"), $"sk".as("a"), $"n_exact".as("n1"))
        .join(sk.select($"event_type".as("e2"), $"sk".as("b"), $"n_exact".as("n2")),
          $"e1" < $"e2")
        .join(inter, Seq("e1", "e2"), "left") // zero-overlap pairs stay in the report
        .withColumn("inter", coalesce($"inter", lit(0L)))
        .withColumn("u", expr(s"slice(array_sort(array_union(a, b)), 1, $K)"))
        .withColumn("mu", size($"u"))
        .withColumn("kth", expr("element_at(u, mu)"))
        .withColumn("n_match",
          expr("size(filter(u, x -> array_contains(a, x) AND array_contains(b, x)))"))
        .withColumn("est_union",
          expr(s"CASE WHEN mu < $K THEN CAST(mu AS BIGINT) " +
            s"ELSE (1152921504606846976L div kth) * ${K - 1} END"))
        .withColumn("est_jaccard_e4", expr("(n_match * 10000L) div mu"))
        .withColumn("exact_union", $"n1" + $"n2" - $"inter")
        .withColumn("exact_jaccard_e4", expr("(inter * 10000L) div (n1 + n2 - inter)"))
        .withColumn("err_e4", abs($"est_jaccard_e4" - $"exact_jaccard_e4"))
        .select($"e1", $"e2", $"n1", $"n2", $"est_union", $"exact_union",
          $"est_jaccard_e4", $"exact_jaccard_e4", $"err_e4")
        .orderBy($"e1", $"e2")
    }, Some(
      s"""WITH ud AS (
         |  SELECT DISTINCT event_type,
         |    ${Portable.h60Sql("CAST(user_id AS VARCHAR) || '|' || strftime(ts, '%Y-%m-%d')")} AS h
         |  FROM events),
         |sk AS (
         |  SELECT event_type, (list(h ORDER BY h))[1:64] AS sk,
         |    CAST(count(*) AS BIGINT) AS n_exact
         |  FROM ud GROUP BY 1),
         |ix AS (
         |  SELECT x.event_type AS e1, y.event_type AS e2,
         |    CAST(count(*) AS BIGINT) AS inter0
         |  FROM ud x JOIN ud y ON x.h = y.h AND x.event_type < y.event_type
         |  GROUP BY 1, 2),
         |pr AS (
         |  SELECT a.event_type AS e1, b.event_type AS e2,
         |    a.sk AS sa, b.sk AS sb, a.n_exact AS n1, b.n_exact AS n2
         |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
         |c AS (
         |  SELECT e1, e2, n1, n2, sa, sb,
         |    (list_sort(list_distinct(list_concat(sa, sb))))[1:64] AS u
         |  FROM pr),
         |m AS (
         |  SELECT e1, e2, n1, n2, len(u) AS mu, u[len(u)] AS kth,
         |    CAST(len(list_filter(u, x -> list_contains(sa, x) AND list_contains(sb, x))) AS BIGINT) AS n_match
         |  FROM c)
         |SELECT m.e1, m.e2, n1, n2,
         |  CASE WHEN mu < 64 THEN CAST(mu AS BIGINT)
         |       ELSE (1152921504606846976 // kth) * 63 END AS est_union,
         |  n1 + n2 - coalesce(inter0, 0) AS exact_union,
         |  (n_match * 10000) // mu AS est_jaccard_e4,
         |  (coalesce(inter0, 0) * 10000) // (n1 + n2 - coalesce(inter0, 0)) AS exact_jaccard_e4,
         |  abs((n_match * 10000) // mu - (coalesce(inter0, 0) * 10000) // (n1 + n2 - coalesce(inter0, 0))) AS err_e4
         |FROM m LEFT JOIN ix ON m.e1 = ix.e1 AND m.e2 = ix.e2
         |ORDER BY m.e1, m.e2""".stripMargin)),

    // ---- CUSUM change-point detection with a PLANTED level shift (Page
    // 1954 — the sequential drift detector ops teams run beside the q56
    // z-score spike detector: z-scores catch single bad hours, CUSUM
    // catches a small persistent rate change by accumulating it). The
    // recurrence S_t = max(0, S_{t-1} + x_t − μ − k) is windowed-SQL
    // expressible via the running-minimum identity S_t = cums_t −
    // min(0, min_{s≤t} cums_s) — no recursion, one sort per event type.
    // Ground truth: each type's DAILY series gets +μ/2 injected from the
    // last third of its span (the marked-corpus pattern), so the contract
    // reports a DETECTION DELAY against a known shift point (1-2 days at
    // sf0.01/0.1, spec-pinned) plus the PRE-shift alarm count — the
    // false-alarm rate, which is honestly nonzero at sf0.001 where μ ≈ 6
    // events/day puts the noise σ on the order of the threshold (ARL
    // shrinks with μ/σ — the detector's real small-sample behavior, not a
    // bug; daily buckets were chosen over hourly precisely because hourly
    // μ ≈ 2 drowns the planted shift at every SF). All-integer (μ, slack
    // k=μ/20 and threshold h=μ are integer divisions; the CUSUM is a sum
    // of integers), so both engines agree exactly. Scale shape: one daily
    // hash agg, a per-type stats broadcast, per-TYPE ordered windows
    // (never a global sort), one summary agg.
    ("q67_cusum_changepoint", (s, d) => {
      import s.implicits._
      val dc = Tables.events(s, d)
        .groupBy($"event_type", expr("unix_micros(ts) div 86400000000L").as("day_d"))
        .agg(count(lit(1)).as("n"))
      val stats = dc.groupBy($"event_type")
        .agg(expr("sum(n) div count(1)").as("mu"),
          min($"day_d").as("d0"), max($"day_d").as("d1"))
        .withColumn("shift_d", expr("d0 + (2 * (d1 - d0)) div 3"))
      val wRun = Window.partitionBy($"event_type").orderBy($"day_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = dc.join(broadcast(stats), "event_type")
        .withColumn("x",
          $"n" + when($"day_d" >= $"shift_d", expr("mu div 2")).otherwise(0L))
        .withColumn("dlt", expr("x - mu - (mu div 20)"))
        .withColumn("cums", sum($"dlt").over(wRun))
        .withColumn("cmin", min($"cums").over(wRun))
        .withColumn("cusum", $"cums" - least($"cmin", lit(0L)))
        .withColumn("alarm", $"cusum" >= $"mu")
      scored.groupBy($"event_type")
        .agg(min($"mu").as("mu"), min($"shift_d").as("shift_d"),
          count(lit(1)).as("n_days"),
          sum(when($"alarm" && $"day_d" < $"shift_d", 1L).otherwise(0L))
            .as("n_pre_alarms"),
          min(when($"alarm" && $"day_d" >= $"shift_d", $"day_d")).as("first_alarm_d"),
          max($"cusum").as("max_cusum"))
        .withColumn("detect_delay_d",
          when($"first_alarm_d".isNull, lit(null).cast("long"))
            .otherwise($"first_alarm_d" - $"shift_d"))
        .orderBy($"event_type")
    }, Some(
      """WITH dc AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) // count(*) AS mu,
        |    min(day_d) + (2 * (max(day_d) - min(day_d))) // 3 AS shift_d
        |  FROM dc GROUP BY 1),
        |sc AS (
        |  SELECT dc.event_type, day_d, mu, shift_d,
        |    n + CASE WHEN day_d >= shift_d THEN mu // 2 ELSE 0 END
        |      - mu - (mu // 20) AS dlt
        |  FROM dc JOIN st USING (event_type)),
        |cua AS (
        |  SELECT event_type, day_d, mu, shift_d,
        |    CAST(sum(dlt) OVER win AS BIGINT) AS cums
        |  FROM sc
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day_d ROWS UNBOUNDED PRECEDING)),
        |cu AS (
        |  SELECT event_type, day_d, mu, shift_d,
        |    cums - least(CAST(min(cums) OVER win AS BIGINT), 0) AS cusum
        |  FROM cua
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day_d ROWS UNBOUNDED PRECEDING)),
        |al AS (SELECT event_type, day_d, mu, shift_d, cusum, cusum >= mu AS alarm FROM cu)
        |SELECT event_type, CAST(min(mu) AS BIGINT) AS mu,
        |  CAST(min(shift_d) AS BIGINT) AS shift_d,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN alarm AND day_d < shift_d THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_alarms,
        |  CAST(min(CASE WHEN alarm AND day_d >= shift_d THEN day_d END) AS BIGINT) AS first_alarm_d,
        |  CAST(max(cusum) AS BIGINT) AS max_cusum,
        |  CAST(min(CASE WHEN alarm AND day_d >= shift_d THEN day_d END) - min(shift_d) AS BIGINT) AS detect_delay_d
        |FROM al GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- EWMA control chart (Roberts 1959) — the SMOOTHING forecaster
    // beside q56's window z-score and q67's CUSUM drift detector: per
    // event-type daily counts with a PLANTED single-day spike (+2μ at the
    // series midpoint), smoothed by y_t = 0.9·y_{t−1} + 0.1·x_t in exact
    // milli-units ((9·y + 1000·x) div 10 — integer, so the recurrence is
    // bit-stable), alarm when the one-step-ahead residual |1000·x_t −
    // y_{t−1}| exceeds 1000·μ. The recurrence is inherently sequential, so
    // the Spark side folds each type's day-ordered series in ONE bounded
    // per-group pass (days × types state — the CUSUM/MMR pattern), while
    // the oracle runs the same recurrence as a RECURSIVE CTE over the day
    // index. Reports per type: first alarm day (the spike), total alarms
    // (honestly includes small-μ noise alarms at sf0.001), the
    // max-|residual| day, and the final smoothed level.
    ("q68_ewma_daily", (s, d) => {
      import s.implicits._
      val dc = Tables.events(s, d)
        .groupBy($"event_type", expr("unix_micros(ts) div 86400000000L").as("day_d"))
        .agg(count(lit(1)).as("n"))
      val st = dc.groupBy($"event_type")
        .agg(expr("sum(n) div count(1)").as("mu"),
          expr("min(day_d) + (max(day_d) - min(day_d)) div 2").as("spike_d"))
      val grouped = dc.join(broadcast(st), "event_type")
        .withColumn("x", $"n" + when($"day_d" === $"spike_d", $"mu" * 2).otherwise(0L))
        .groupBy($"event_type")
        .agg(min($"mu").as("mu"), min($"spike_d").as("spike_d"),
          collect_list(struct($"day_d", $"x")).as("days"))
      grouped.select($"event_type", $"mu", $"spike_d", $"days")
        .map { r =>
          val (et, mu, spikeD) = (r.getString(0), r.getLong(1), r.getLong(2))
          val series = r.getSeq[org.apache.spark.sql.Row](3)
            .map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
          var y = series.head._2 * 1000L
          var nAlarms = 0L
          var firstAlarm: Option[Long] = None
          var maxAbsResid = -1L
          var maxResidD: Option[Long] = None
          for ((day, x) <- series.tail) {
            val resid = x * 1000L - y
            if (math.abs(resid) > mu * 1000L) {
              nAlarms += 1
              if (firstAlarm.isEmpty) firstAlarm = Some(day)
            }
            if (math.abs(resid) > maxAbsResid) {
              maxAbsResid = math.abs(resid); maxResidD = Some(day)
            }
            y = (9L * y + x * 1000L) / 10L
          }
          (et, mu, spikeD, series.size.toLong, nAlarms,
            firstAlarm, maxResidD, y)
        }
        .toDF("event_type", "mu", "spike_d", "n_days", "n_alarms",
          "first_alarm_d", "max_resid_d", "ewma_final_u3")
        .orderBy($"event_type")
    }, Some(
      """WITH RECURSIVE dc AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) // count(*) AS mu,
        |    min(day_d) + (max(day_d) - min(day_d)) // 2 AS spike_d
        |  FROM dc GROUP BY 1),
        |sx AS (
        |  SELECT dc.event_type, day_d, mu, spike_d,
        |    n + CASE WHEN day_d = spike_d THEN 2 * mu ELSE 0 END AS x,
        |    CAST(row_number() OVER (PARTITION BY dc.event_type ORDER BY day_d) AS BIGINT) AS idx
        |  FROM dc JOIN st USING (event_type)),
        |r AS (
        |  SELECT event_type, idx, day_d, mu, spike_d, x,
        |    x * 1000 AS y, CAST(0 AS BIGINT) AS resid, FALSE AS alarm
        |  FROM sx WHERE idx = 1
        |  UNION ALL
        |  SELECT s.event_type, s.idx, s.day_d, s.mu, s.spike_d, s.x,
        |    (9 * r.y + s.x * 1000) // 10 AS y,
        |    s.x * 1000 - r.y AS resid,
        |    abs(s.x * 1000 - r.y) > s.mu * 1000 AS alarm
        |  FROM r JOIN sx s ON s.event_type = r.event_type AND s.idx = r.idx + 1),
        |mx AS (
        |  SELECT event_type, max(abs(resid)) AS mxr FROM r WHERE idx > 1 GROUP BY 1),
        |fin AS (SELECT event_type, max(idx) AS mi FROM r GROUP BY 1)
        |SELECT r.event_type, CAST(min(r.mu) AS BIGINT) AS mu,
        |  CAST(min(r.spike_d) AS BIGINT) AS spike_d,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN r.alarm THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        |  CAST(min(CASE WHEN r.alarm THEN r.day_d END) AS BIGINT) AS first_alarm_d,
        |  CAST(min(CASE WHEN r.idx > 1 AND abs(r.resid) = m.mxr THEN r.day_d END) AS BIGINT) AS max_resid_d,
        |  CAST(min(CASE WHEN r.idx = f.mi THEN r.y END) AS BIGINT) AS ewma_final_u3
        |FROM r LEFT JOIN mx m USING (event_type) JOIN fin f USING (event_type)
        |GROUP BY r.event_type ORDER BY r.event_type""".stripMargin)),

    // ---- Holt double-exponential smoothing (Holt 1957) with a PLANTED
    // TREND RAMP — the drift detector beside q68's level-only EWMA (a level
    // chart alarms on steps and spikes but keeps absorbing a slow ramp into
    // its level; Holt's separate trend term is what catches sustained
    // drift). Per event type, daily counts grow by mu div 5 per day after
    // the midpoint; the fold tracks level l and trend b in exact
    // milli-units — α = β = 0.3 as integer (3·x + 7·prev) div 10 steps,
    // all divisions TRUNCATING toward zero (Scala `/` ≡ DuckDB `//`:
    // -7 // 2 = -3, NOT floor — b goes negative on noise, where a floorDiv
    // on one side diverges by one milli-unit; found empirically here).
    // Report: residual alarms vs the ±mu band on the one-step forecast
    // l+b, the first day the trend estimate crosses HALF the planted slope
    // (mu·100 milli-units — the detection-delay readout), and the final
    // level/trend. Oracle = the SAME recurrence as a recursive CTE (third
    // use of the recursive-oracle technique). Scale shape: state is
    // days × types structs in one collect_list per type — bounded by the
    // calendar, not the corpus; one shuffle to daily counts, one to types.
    ("q69_holt_trend", (s, d) => {
      import s.implicits._
      val dc = Tables.events(s, d)
        .groupBy($"event_type", expr("unix_micros(ts) div 86400000000L").as("day_d"))
        .agg(count(lit(1)).as("n"))
      val st = dc.groupBy($"event_type")
        .agg(expr("sum(n) div count(1)").as("mu"),
          expr("min(day_d) + (max(day_d) - min(day_d)) div 2").as("ramp_d"))
      val grouped = dc.join(broadcast(st), "event_type")
        .withColumn("x",
          $"n" + greatest(lit(0L), $"day_d" - $"ramp_d") * expr("mu div 5"))
        .groupBy($"event_type")
        .agg(min($"mu").as("mu"), min($"ramp_d").as("ramp_d"),
          collect_list(struct($"day_d", $"x")).as("days"))
      grouped.select($"event_type", $"mu", $"ramp_d", $"days")
        .map { r =>
          val (et, mu, rampD) = (r.getString(0), r.getLong(1), r.getLong(2))
          val series = r.getSeq[org.apache.spark.sql.Row](3)
            .map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
          var l = series.head._2 * 1000L
          var b = 0L
          var nAlarms = 0L
          var trendHit: Option[Long] = None
          for ((day, x) <- series.tail) {
            val f = l + b
            val resid = x * 1000L - f
            if (math.abs(resid) > mu * 1000L) nAlarms += 1
            val l1 = (3L * x * 1000L + 7L * (l + b)) / 10L
            b = (3L * (l1 - l) + 7L * b) / 10L
            l = l1
            if (trendHit.isEmpty && b >= mu * 100L) trendHit = Some(day)
          }
          (et, mu, rampD, series.size.toLong, nAlarms, trendHit, l, b)
        }
        .toDF("event_type", "mu", "ramp_d", "n_days", "n_alarms",
          "trend_hit_d", "level_final_u3", "trend_final_u3")
        .orderBy($"event_type")
    }, Some(
      """WITH RECURSIVE dc AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) // count(*) AS mu,
        |    min(day_d) + (max(day_d) - min(day_d)) // 2 AS ramp_d
        |  FROM dc GROUP BY 1),
        |sx AS (
        |  SELECT dc.event_type, day_d, mu, ramp_d,
        |    n + greatest(0, day_d - ramp_d) * (mu // 5) AS x,
        |    CAST(row_number() OVER (PARTITION BY dc.event_type ORDER BY day_d) AS BIGINT) AS idx
        |  FROM dc JOIN st USING (event_type)),
        |r AS (
        |  SELECT event_type, idx, day_d, mu, ramp_d, x,
        |    x * 1000 AS l, CAST(0 AS BIGINT) AS b, FALSE AS alarm
        |  FROM sx WHERE idx = 1
        |  UNION ALL
        |  SELECT s.event_type, s.idx, s.day_d, s.mu, s.ramp_d, s.x,
        |    (3 * s.x * 1000 + 7 * (r.l + r.b)) // 10 AS l,
        |    (3 * ((3 * s.x * 1000 + 7 * (r.l + r.b)) // 10 - r.l) + 7 * r.b) // 10 AS b,
        |    abs(s.x * 1000 - (r.l + r.b)) > s.mu * 1000 AS alarm
        |  FROM r JOIN sx s ON s.event_type = r.event_type AND s.idx = r.idx + 1),
        |fin AS (SELECT event_type, max(idx) AS mi FROM r GROUP BY 1)
        |SELECT r.event_type, CAST(min(r.mu) AS BIGINT) AS mu,
        |  CAST(min(r.ramp_d) AS BIGINT) AS ramp_d,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN r.alarm THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
        |  CAST(min(CASE WHEN r.b >= r.mu * 100 THEN r.day_d END) AS BIGINT) AS trend_hit_d,
        |  CAST(min(CASE WHEN r.idx = f.mi THEN r.l END) AS BIGINT) AS level_final_u3,
        |  CAST(min(CASE WHEN r.idx = f.mi THEN r.b END) AS BIGINT) AS trend_final_u3
        |FROM r JOIN fin f USING (event_type)
        |GROUP BY r.event_type ORDER BY r.event_type""".stripMargin)),

    // ---- multi-touch attribution (the marketing-analytics standard
    // beside q38's single-touch match): every view/click/signup by the
    // same user in the 24 h before a purchase is a TOUCH; each purchase
    // distributes 1000 milli-credits across its touches under two models —
    // LINEAR (equal split, 1000 div n) and TIME-DECAY (6-hour half-life;
    // the touch's weight halves per 6 h bucket, w ∈ {10⁶, 5·10⁵, …},
    // credit = 1000·w div Σw). All-integer: bucket index by exact µs
    // division, weights by CASE over the 5 possible buckets, so both
    // engines truncate identically; per-purchase credit sums are ≤ 1000
    // with the remainder left unassigned (documented — no float ever).
    // Scale shape: one range self-join on user_id (the q38 pattern), one
    // per-purchase aggregate broadcast back, one 3-row rollup.
    ("q70_multi_touch", (s, d) => {
      import s.implicits._
      val e = Tables.events(s, d)
      val p = e.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("p_ts"))
      val t = e.filter($"event_type".isin("view", "click", "signup"))
        .select($"user_id".as("t_user"), $"event_type".as("touch_type"),
          $"event_id".as("touch_id"), $"ts".as("t_ts"))
      val touches = p.join(t, $"user_id" === $"t_user" &&
          $"t_ts" < $"p_ts" && $"t_ts" >= $"p_ts" - expr("INTERVAL 24 HOURS"))
        .withColumn("dh",
          expr("(unix_micros(p_ts) - unix_micros(t_ts)) div 21600000000"))
        .withColumn("w", expr(
          """CASE dh WHEN 0 THEN 1000000 WHEN 1 THEN 500000 WHEN 2 THEN 250000
            |WHEN 3 THEN 125000 ELSE 62500 END""".stripMargin))
      val perP = touches.groupBy($"purchase_id")
        .agg(count(lit(1)).as("n_t"), sum($"w").as("sum_w"))
      touches.join(perP, "purchase_id")
        .withColumn("lin", expr("1000 div n_t"))
        .withColumn("dec", expr("1000 * w div sum_w"))
        .groupBy($"touch_type")
        .agg(count(lit(1)).as("n_touches"),
          sum($"lin").as("credit_linear_milli"),
          sum($"dec").as("credit_decay_milli"))
        .orderBy($"touch_type")
    }, Some(
      """WITH p AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id AS t_user, event_type AS touch_type,
        |    event_id AS touch_id, ts AS t_ts
        |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
        |tc AS (
        |  SELECT p.purchase_id, t.touch_type,
        |    (epoch_us(p.p_ts) - epoch_us(t.t_ts)) // 21600000000 AS dh
        |  FROM p JOIN t ON p.user_id = t.t_user
        |    AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 24 HOURS),
        |tw AS (
        |  SELECT purchase_id, touch_type,
        |    CASE dh WHEN 0 THEN 1000000 WHEN 1 THEN 500000 WHEN 2 THEN 250000
        |    WHEN 3 THEN 125000 ELSE 62500 END AS w
        |  FROM tc),
        |pp AS (
        |  SELECT purchase_id, CAST(count(*) AS BIGINT) AS n_t,
        |    CAST(sum(w) AS BIGINT) AS sum_w
        |  FROM tw GROUP BY 1)
        |SELECT touch_type,
        |  CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(1000 // n_t) AS BIGINT) AS credit_linear_milli,
        |  CAST(sum(1000 * w // sum_w) AS BIGINT) AS credit_decay_milli
        |FROM tw JOIN pp USING (purchase_id)
        |GROUP BY 1 ORDER BY touch_type""".stripMargin)),

    // ---- Holt-Winters additive seasonal forecaster (Winters 1960 —
    // completing the q56 z-score / q67 CUSUM / q68 EWMA / q69 Holt
    // ladder with the SEASONAL component): a weekly cycle is PLANTED on
    // the daily counts (day_d % 7 == 3 gains mu/2 — a 50% day-of-week
    // spike), and the model's 7-slot seasonal state absorbs it — the
    // readout pins peak_dow == 3 and contrasts n_alarms against
    // the season-blind twin (q69's level+trend model from the same
    // initialization) via sae_u3 vs sae_blind_u3 — the total one-step
    // |forecast error|: at sf0.01+ the seasonal model cuts it 16-37% on
    // every type (spec-pinned), because the blind forecast re-pays the
    // dow-3 spike weekly while the seasonal state absorbs it. HONEST
    // small-sample regime: at sf0.001 (mu ≈ 7, spike ≈ 3 < Poisson σ)
    // the seasonal state fits noise and can LOSE to the blind model —
    // the q67 ARL caveat's seasonal analogue, reported not hidden.
    // n_alarms under the mu-threshold residual test stays 0 for BOTH
    // models at sf0.01+ (the mu/2 spike is below the mu alarm bar — the
    // alarm ladder needs q56/q67/q68 for spikes; this query is about
    // FORECAST error). Exact integer
    // recurrences in milli-units (α=β=3/10, γ=1/2), init l₀ = first-week
    // mean / s_i = x_i·1000 − l₀ / b₀ = 0, TRUNCATING division everywhere
    // — seasonals go negative, and there Scala's `/` and DuckDB's `//`
    // agree on truncation toward zero (MEASURED: -7//2 = -3 in DuckDB)
    // while Math.floorDiv/Python floor to -4, so floorDiv here would
    // hash-mismatch by one milli-unit; oracle = the same recurrence
    // as a recursive CTE carrying the 7-slot seasonal LIST (fourth
    // recursive-oracle use, first with list state). The 30-day grid is
    // dense at every SF (spec-pinned), so slot j's day-of-week is stable:
    // dow(slot j) = (last_day + j) % 7. One bounded per-type fold —
    // state is (l, b, s[7]) per event type, never corpus-sized.
    ("q71_holt_winters", (s, d) => {
      import s.implicits._
      val dc = Tables.events(s, d)
        .groupBy($"event_type", expr("unix_micros(ts) div 86400000000L").as("day_d"))
        .agg(count(lit(1)).as("n"))
      val st = dc.groupBy($"event_type")
        .agg(expr("sum(n) div count(1)").as("mu"))
      val grouped = dc.join(broadcast(st), "event_type")
        .withColumn("x",
          $"n" + when($"day_d" % 7 === 3, expr("mu div 2")).otherwise(lit(0L)))
        .groupBy($"event_type")
        .agg(min($"mu").as("mu"), collect_list(struct($"day_d", $"x")).as("days"))
      grouped.select($"event_type", $"mu", $"days")
        .map { r =>
          val (et, mu) = (r.getString(0), r.getLong(1))
          val series = r.getSeq[org.apache.spark.sql.Row](2)
            .map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
          val warm = series.take(7)
          val l0 = warm.map(_._2).sum * 1000L / 7L
          val sArr = scala.collection.mutable.ArrayBuffer(
            warm.map(_._2 * 1000L - l0): _*)
          var (l, b) = (l0, 0L)
          var (lb, bb) = (l0, 0L) // season-blind twin (q69's model, same init)
          var (nAlarms, nBlind) = (0L, 0L)
          var (sae, saeBlind) = (0L, 0L)
          for ((_, x) <- series.drop(7)) {
            val s7 = sArr.remove(0)
            val (rs, rb) = (x * 1000L - (l + b + s7), x * 1000L - (lb + bb))
            sae += math.abs(rs); saeBlind += math.abs(rb)
            if (math.abs(rs) > mu * 1000L) nAlarms += 1
            if (math.abs(rb) > mu * 1000L) nBlind += 1
            val l1 = (3L * (x * 1000L - s7) + 7L * (l + b)) / 10L
            b = (3L * (l1 - l) + 7L * b) / 10L
            l = l1
            sArr += ((x * 1000L - l1) + s7) / 2L
            val lb1 = (3L * x * 1000L + 7L * (lb + bb)) / 10L
            bb = (3L * (lb1 - lb) + 7L * bb) / 10L
            lb = lb1
          }
          val lastDay = series.last._1
          val peakJ = sArr.indexOf(sArr.max) + 1 // slot j holds day lastDay-7+j
          val peakDow = java.lang.Math.floorMod(lastDay + peakJ, 7L)
          (et, mu, series.size.toLong, nAlarms, nBlind, sae, saeBlind,
            peakDow, sArr.max, l, b)
        }
        .toDF("event_type", "mu", "n_days", "n_alarms", "n_alarms_blind",
          "sae_u3", "sae_blind_u3",
          "peak_dow", "peak_s_u3", "level_final_u3", "trend_final_u3")
        .orderBy($"event_type")
    }, Some(
      """WITH RECURSIVE dc AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(sum(n) AS BIGINT) // count(*) AS mu
        |  FROM dc GROUP BY 1),
        |sx AS (
        |  SELECT dc.event_type, day_d, mu,
        |    n + CASE WHEN day_d % 7 = 3 THEN mu // 2 ELSE 0 END AS x,
        |    CAST(row_number() OVER (PARTITION BY dc.event_type ORDER BY day_d) AS BIGINT) AS idx
        |  FROM dc JOIN st USING (event_type)),
        |init AS (
        |  SELECT event_type, min(mu) AS mu,
        |    CAST(sum(x) * 1000 // 7 AS BIGINT) AS l0,
        |    list(x * 1000 ORDER BY idx) AS xs
        |  FROM sx WHERE idx <= 7 GROUP BY 1),
        |r AS (
        |  SELECT event_type, mu, CAST(7 AS BIGINT) AS idx,
        |    l0 AS l, CAST(0 AS BIGINT) AS b,
        |    l0 AS lb, CAST(0 AS BIGINT) AS bb,
        |    list_transform(xs, v -> v - l0) AS s,
        |    CAST(0 AS BIGINT) AS n_alarms, CAST(0 AS BIGINT) AS n_blind,
        |    CAST(0 AS BIGINT) AS sae, CAST(0 AS BIGINT) AS sae_b
        |  FROM init
        |  UNION ALL
        |  SELECT r.event_type, r.mu, x.idx,
        |    (3 * (x.x * 1000 - r.s[1]) + 7 * (r.l + r.b)) // 10,
        |    (3 * ((3 * (x.x * 1000 - r.s[1]) + 7 * (r.l + r.b)) // 10 - r.l) + 7 * r.b) // 10,
        |    (3 * x.x * 1000 + 7 * (r.lb + r.bb)) // 10,
        |    (3 * ((3 * x.x * 1000 + 7 * (r.lb + r.bb)) // 10 - r.lb) + 7 * r.bb) // 10,
        |    r.s[2:7] ||
        |      [(x.x * 1000 - (3 * (x.x * 1000 - r.s[1]) + 7 * (r.l + r.b)) // 10 + r.s[1]) // 2],
        |    r.n_alarms + CASE WHEN abs(x.x * 1000 - (r.l + r.b + r.s[1])) > r.mu * 1000
        |      THEN 1 ELSE 0 END,
        |    r.n_blind + CASE WHEN abs(x.x * 1000 - (r.lb + r.bb)) > r.mu * 1000
        |      THEN 1 ELSE 0 END,
        |    r.sae + abs(x.x * 1000 - (r.l + r.b + r.s[1])),
        |    r.sae_b + abs(x.x * 1000 - (r.lb + r.bb))
        |  FROM r JOIN sx x ON x.event_type = r.event_type AND x.idx = r.idx + 1),
        |lastd AS (SELECT event_type, max(day_d) AS last_day, max(idx) AS mi FROM sx GROUP BY 1),
        |fin AS (
        |  SELECT r.event_type, r.mu, r.idx AS n_days, r.n_alarms, r.n_blind,
        |    r.sae, r.sae_b, r.l, r.b, r.s, d.last_day
        |  FROM r JOIN lastd d ON d.event_type = r.event_type AND r.idx = d.mi)
        |SELECT event_type, CAST(mu AS BIGINT) AS mu, n_days, n_alarms,
        |  n_blind AS n_alarms_blind, sae AS sae_u3, sae_b AS sae_blind_u3,
        |  CAST((last_day + list_position(s, list_max(s))) % 7 AS BIGINT) AS peak_dow,
        |  CAST(list_max(s) AS BIGINT) AS peak_s_u3,
        |  l AS level_final_u3, b AS trend_final_u3
        |FROM fin ORDER BY event_type""".stripMargin))
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, f, _) => n -> f }.toMap

  val oracleSql: Map[String, String] =
    defs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
