package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Case-class models for the typed Dataset API surface. */
final case class OrderRow(
    o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double)
final case class CustomerRow(
    c_custkey: Long, c_name: String, c_mktsegment: String)

/** Typed `Dataset[T]` surface — compile-time field checks where the
  * row shape is static: column-predicate filter on a typed Dataset,
  * `joinWith` (a typed join whose result is a Dataset of pairs), and
  * `groupByKey.count`.
  *
  * Filter shape matters: `ds.filter(_.o_totalprice > x)` is a
  * `TypedFilter` — every row deserializes to an `OrderRow` and the
  * predicate is an opaque closure Catalyst can never push into the
  * parquet scan (no PushedFilters — a full 100 TB fact-table read).
  * `ds.filter(col("o_totalprice") > x)` keeps the Dataset typed AND
  * stays a Catalyst predicate, so it reaches the reader
  * (plan-asserted in ExtensionSpec).
  *
  * `groupByKey` on the pair Dataset IS a deserializing operator (each
  * (OrderRow, CustomerRow) pair materializes so the key closure can
  * run) — that is the point of this demo, and its cost: at scale the
  * same query as a relational `groupBy(col(...))` avoids the
  * object round-trip entirely. It is the only deserializing operator
  * in the query inventory (optimizedPlan-swept in ExtensionSpec).
  */
object Typed {

  def qTypedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[OrderRow]
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .as[CustomerRow]
    // Column predicate, not a Scala closure: still Dataset[OrderRow],
    // but the filter participates in pushdown (see class Scaladoc).
    val bigOrders = orders.filter(col("o_totalprice") > 400000.0)
    val joined = bigOrders.joinWith(customers,
      bigOrders("o_custkey") === customers("c_custkey"))
    joined
      .groupByKey { case (_, c) => c.c_mktsegment }
      .count()
      .toDF("mktsegment", "n_big_orders")
      .orderBy(col("mktsegment"))
  }

  val qTypedJoinSql: String =
    """SELECT c_mktsegment AS mktsegment, count(*) AS n_big_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_totalprice > 400000.0
      |GROUP BY c_mktsegment ORDER BY mktsegment""".stripMargin

  // ---------------------------------------------------------------
  // CUSTOM TYPED AGGREGATOR — the `Aggregator[IN, BUF, OUT]` surface:
  // per-order-status stats folded in a typed buffer (count, money as
  // integer CENTS — per-row floor(price·100) then exact integer sums,
  // the moneySum order-independence rule applied in typed code — and
  // max cents). The partial/merge split is Spark's usual map-side
  // combine: BUF rows ship between executors, never `OrderRow`s. The
  // typed path deserializes each row for `reduce` — the documented
  // cost of this API vs the relational twin (q1's class) — which is
  // why it gates a 3-group toy: the point is the API contract
  // (zero/reduce/merge/finish + product encoders), already exercised
  // distributed at [[graft.functions.TopKLongAggregator]] scale.
  final case class OrderStats(n_orders: Long, sum_cents: Long, max_cents: Long)

  private class OrderStatsAgg
      extends org.apache.spark.sql.expressions.Aggregator[OrderRow, OrderStats, OrderStats] {
    override def zero: OrderStats = OrderStats(0L, 0L, Long.MinValue)
    override def reduce(b: OrderStats, a: OrderRow): OrderStats = {
      val c = math.floor(a.o_totalprice * 100).toLong
      OrderStats(b.n_orders + 1, b.sum_cents + c, math.max(b.max_cents, c))
    }
    override def merge(x: OrderStats, y: OrderStats): OrderStats =
      OrderStats(x.n_orders + y.n_orders, x.sum_cents + y.sum_cents,
        math.max(x.max_cents, y.max_cents))
    override def finish(b: OrderStats): OrderStats = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[OrderStats] =
      org.apache.spark.sql.Encoders.product[OrderStats]
    override def outputEncoder: org.apache.spark.sql.Encoder[OrderStats] =
      org.apache.spark.sql.Encoders.product[OrderStats]
  }

  def qTypedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[OrderRow]
      .groupByKey(_.o_orderstatus)
      .agg(new OrderStatsAgg().toColumn.name("stats"))
      .toDF("o_orderstatus", "stats")
      .select(col("o_orderstatus"),
        col("stats.n_orders").as("n_orders"),
        col("stats.sum_cents").as("sum_cents"),
        col("stats.max_cents").as("max_cents"))
      .orderBy(col("o_orderstatus"))
  }

  val qTypedAggSql: String =
    """SELECT o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(max(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_typed_join" -> (qTypedJoin _),
    "typed_aggregator" -> (qTypedAgg _))

  val oracles: Map[String, String] = Map(
    "q28_typed_join" -> qTypedJoinSql,
    "typed_aggregator" -> qTypedAggSql)
}
