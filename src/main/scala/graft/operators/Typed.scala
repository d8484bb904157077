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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_typed_join" -> (qTypedJoin _))

  val oracles: Map[String, String] = Map(
    "q28_typed_join" -> qTypedJoinSql)
}
