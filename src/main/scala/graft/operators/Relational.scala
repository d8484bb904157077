package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Relational query suite over the TPC-H-ish test tables.
  *
  * The reference (adaschevici/ts-etl) implements no relational
  * operators (SURVEY.md §2.3 A1–A6); this layer supplies the
  * driver-mandated extension surface: aggregation, joins (broadcast /
  * shuffle / semi / anti), windows, sorts/limits, set operations,
  * rollup/cube, and subquery patterns — all as declarative
  * DataFrame plans so Catalyst handles pushdown, join selection,
  * partial aggregation and AQE.
  *
  * Scale notes (100 TB design):
  *  - Every aggregate is expressed with `groupBy().agg()` → Spark
  *    plans partial (map-side) + final aggregation; no driver-side
  *    accumulation anywhere.
  *  - Dimension tables (region/nation: O(10..100) rows at any SF;
  *    supplier/part/customer grow with SF) — region and nation get
  *    explicit `broadcast()` hints; larger joins are left to
  *    Catalyst + AQE which picks broadcast vs sort-merge from actual
  *    sizes at runtime.
  *  - All results are deterministically ordered (explicit tiebreak
  *    keys) and doubles rounded so the DuckDB oracle hash-matches.
  */
object Relational {

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** Money aggregation: exact DECIMAL(18,6) sums, not double sums.
    * Double summation is association-dependent — Spark's partition
    * order vs DuckDB's (or two Spark runs) diverge in the last
    * decimal once totals reach ~1e10 (measured: q27/q29 at sf0.1) —
    * while decimal sums are exact and order-independent at any scale.
    * Inputs are cent/bp-quantized, so the 6dp cast is lossless on
    * both engines; rounded output is cast back to double for a stable
    * cross-engine schema. */
  private[operators] def moneySum(c: Column, dp: Int): Column =
    round(sum(c.cast("decimal(18,6)")), dp).cast("double")

  // ---------------------------------------------------------------
  // q1: TPC-H Q1 pricing summary — the canonical scan + partial agg.
  // Filter reaches the parquet scan (PushedFilters); agg is a single
  // shuffle on (l_returnflag, l_linestatus): 6 groups, trivially
  // skew-free.
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        moneySum(col("l_extendedprice"), 2).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q2: filter + projection pushdown. The plan must show
  // PushedFilters for p_size/p_type and ReadSchema of only 4 cols.
  def q2FilterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_size") < 15 && col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        round(col("p_retailprice"), 2).as("retail"))
      .orderBy(col("p_partkey"))

  val q2Sql: String =
    """SELECT p_partkey, p_brand, p_size, round(p_retailprice, 2) AS retail
      |FROM part WHERE p_size < 15 AND p_type = 'PROMO'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q3: TPC-H Q3 shipping priority — 3-way join, filtered on both
  // fact and dim sides, grouped, top-10. Catalyst/AQE picks
  // broadcast for the filtered customer side at small SF; at 100 TB
  // the same plan degrades gracefully to shuffle joins on the
  // join keys (both already co-keyed on orderkey after first join).
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1998-03-15"))
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1998-03-15"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  // q5: TPC-H Q5 local-supplier volume — 6-table join tree.
  // region/nation are genuinely tiny at every SF → explicit
  // broadcast; customer⋈orders⋈lineitem⋈supplier shuffle on their
  // keys with AQE free to promote to broadcast at small SF.
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val region = broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA"))
    val nation = broadcast(Tables.nation(s, dir))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------
  // q6: TPC-H Q6 forecast revenue — pure scan + scalar agg; every
  // predicate pushes into the parquet reader, zero shuffle
  // (single-row result via partial + final agg).
  def q6ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount"), 2).as("revenue"))

  val q6Sql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------
  // q7: left-semi join (EXISTS) — suppliers with any heavy shipment.
  // Semi join keeps only the probe side: no row multiplication, and
  // the build side is reduced to distinct keys before the join.
  def q7SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir).filter(col("l_quantity") >= 49)
    Tables.supplier(s, dir)
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .orderBy(col("s_suppkey"))
  }

  val q7Sql: String =
    """SELECT s_suppkey, s_name, s_nationkey FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  // q8: left-anti join (NOT EXISTS) — customers with no order in 2001.
  // The anti join's build side is pre-filtered, so only the reduced
  // key set shuffles/broadcasts.
  def q8AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(s, dir).filter(col("o_orderdate") >= ts("2001-01-01"))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_custkey"))
  }

  val q8Sql: String =
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q9: top-k per group — row_number window, then filter. The window
  // shuffles once on o_custkey; rank predicate prunes before any
  // further work. (At scale this is the standard "grouped top-k";
  // Spark pushes a per-partition top-k via WindowGroupLimit.)
  def q9TopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q9Sql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |      FROM orders) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  // ---------------------------------------------------------------
  // q10: analytic window functions — lag + running aggregate over a
  // per-customer order timeline. One shuffle on o_custkey serves
  // both window functions (same partitioning + ordering).
  def q10WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days", datediff(col("o_orderdate"), col("prev_date")))
      .withColumn("running_spend",
        round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("orderdate"),
        col("gap_days"), col("running_spend"))
      .orderBy(col("o_custkey"), col("orderdate"), col("o_orderkey"))
  }

  val q10Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
      |  date_diff('day',
      |    LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |    CAST(o_orderdate AS DATE)) AS gap_days,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, orderdate, o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // q11: global sort + limit — Spark plans TakeOrderedAndProject
  // (per-partition top-k then driver merge), not a full sort.
  def q11TopOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"),
        col("o_orderstatus"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(100)

  val q11Sql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, o_orderstatus
      |FROM orders ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  // q12: distinct — hash aggregate on the distinct keys.
  def q12Distinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q12Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q13: set operations — INTERSECT / EXCEPT / UNION ALL in one
  // result. Nations that have customers vs nations that have
  // suppliers.
  def q13SetOps(s: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val suppN = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val both = custN.intersect(suppN).withColumn("tag", lit("both"))
    val custOnly = custN.except(suppN).withColumn("tag", lit("cust_only"))
    val suppOnly = suppN.except(custN).withColumn("tag", lit("supp_only"))
    both.unionAll(custOnly).unionAll(suppOnly)
      .select(col("tag"), col("nationkey"))
      .orderBy(col("tag"), col("nationkey"))
  }

  val q13Sql: String =
    """WITH custn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |     suppn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT 'both' AS tag, nationkey FROM (SELECT nationkey FROM custn INTERSECT SELECT nationkey FROM suppn)
      |UNION ALL
      |SELECT 'cust_only' AS tag, nationkey FROM (SELECT nationkey FROM custn EXCEPT SELECT nationkey FROM suppn)
      |UNION ALL
      |SELECT 'supp_only' AS tag, nationkey FROM (SELECT nationkey FROM suppn EXCEPT SELECT nationkey FROM custn)
      |ORDER BY tag, nationkey""".stripMargin

  // ---------------------------------------------------------------
  // q14: ROLLUP — hierarchical totals with grouping_id, a single
  // expand + aggregate (no repeated scans).
  def q14Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  val q14Sql: String =
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n,
      |  GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q15: CUBE over order dimensions.
  def q15Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  val q15Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total,
      |  GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q16: conditional aggregation (TPC-H Q14 flavor) — promo revenue
  // share. Join lineitem⋈part on partkey; CASE folded into the agg.
  def q16PromoShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-07-01"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) * 100.0 / sum(rev),
        4).as("promo_share"))
  }

  val q16Sql: String =
    """SELECT round(
      |  100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
      |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin

  // ---------------------------------------------------------------
  // q17: HAVING / customer distribution (TPC-H Q13 flavor) — two
  // cascaded aggregations; left join keeps zero-order customers.
  def q17CustDist(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .filter(col("custdist") > 1)
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q17Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count HAVING count(*) > 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------
  // q18: uncorrelated scalar subquery — parts above average retail
  // price. The scalar agg is one row: broadcast + cross join, so the
  // big side streams through a map-only comparison.
  def q18AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val avgPrice = p.agg(avg(col("p_retailprice")).as("avg_price"))
    p.crossJoin(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .select(col("p_partkey"), round(col("p_retailprice"), 2).as("retail"))
      .orderBy(col("p_partkey"))
  }

  val q18Sql: String =
    """SELECT p_partkey, round(p_retailprice, 2) AS retail FROM part
      |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // q19: correlated-subquery pattern (TPC-H Q17 flavor) rewritten as
  // agg + join — the idiomatic distributed form: compute per-part
  // averages once, join back, filter. No per-row re-aggregation.
  def q19SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  val q19Sql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem l1
      |WHERE l_quantity < 0.5 * (
      |  SELECT avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_filter_pushdown" -> (q2FilterPushdown _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_semi_join" -> (q7SemiJoin _),
    "q8_anti_join" -> (q8AntiJoin _),
    "q9_topk_per_group" -> (q9TopkPerGroup _),
    "q10_window_analytics" -> (q10WindowAnalytics _),
    "q11_top_orders" -> (q11TopOrders _),
    "q12_distinct" -> (q12Distinct _),
    "q13_set_ops" -> (q13SetOps _),
    "q14_rollup" -> (q14Rollup _),
    "q15_cube" -> (q15Cube _),
    "q16_promo_share" -> (q16PromoShare _),
    "q17_cust_dist" -> (q17CustDist _),
    "q18_above_avg" -> (q18AboveAvg _),
    "q19_small_quantity" -> (q19SmallQuantity _),
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_pushdown" -> q2Sql,
    "q3_shipping_priority" -> q3Sql,
    "q5_local_supplier" -> q5Sql,
    "q6_forecast_revenue" -> q6Sql,
    "q7_semi_join" -> q7Sql,
    "q8_anti_join" -> q8Sql,
    "q9_topk_per_group" -> q9Sql,
    "q10_window_analytics" -> q10Sql,
    "q11_top_orders" -> q11Sql,
    "q12_distinct" -> q12Sql,
    "q13_set_ops" -> q13Sql,
    "q14_rollup" -> q14Sql,
    "q15_cube" -> q15Sql,
    "q16_promo_share" -> q16Sql,
    "q17_cust_dist" -> q17Sql,
    "q18_above_avg" -> q18Sql,
    "q19_small_quantity" -> q19Sql,
  )
}
