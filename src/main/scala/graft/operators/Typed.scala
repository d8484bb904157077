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
  * row shape is static: typed filter, `joinWith` (a typed join whose
  * result is a Dataset of pairs), and `groupByKey.count`. The plan
  * Catalyst sees is the same relational plan as the DataFrame form
  * (encoders erase to expressions), so nothing is lost to the
  * optimizer — demonstrated by the hash-matching SQL oracle.
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
    val bigOrders = orders.filter(_.o_totalprice > 400000.0)
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
