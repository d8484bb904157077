package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("every relational query runs at sf0.001 and has an oracle") {
    assert(Relational.queries.keySet == Relational.oracles.keySet)
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"$name failed to execute")
    }
  }

  test("q1 pricing summary has the canonical 6 groups and exact counts") {
    val rows = Relational.q1PricingSummary(spark, sfDir).collect()
    assert(rows.length == 6)
    // counts sum to the number of lineitems passing the date filter
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = graft.Tables.lineitem(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-09-02").cast("timestamp"))
      .count()
    assert(total == expected)
  }

  test("q9 top-k emits at most 3 rows per customer, ranked") {
    val rows = Relational.q9TopkPerGroup(spark, sfDir).collect()
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.values.forall(_.length <= 3))
    perCust.values.foreach { rs =>
      val prices = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("totalprice"))
      assert(prices.sameElements(prices.sortBy(-(_: Double))))
    }
  }

  test("q13 set ops partition nations consistently") {
    val rows = Relational.q13SetOps(spark, sfDir).collect()
    val byTag = rows.groupBy(_.getAs[String]("tag")).view.mapValues(_.map(_.getAs[Int]("nationkey")).toSet)
    val both = byTag.getOrElse("both", Set())
    val co = byTag.getOrElse("cust_only", Set())
    val so = byTag.getOrElse("supp_only", Set())
    assert((both & co).isEmpty && (both & so).isEmpty && (co & so).isEmpty)
  }

  test("q18 above-average keeps only prices above the mean") {
    val p = graft.Tables.part(spark, sfDir)
    val mean = p.agg(org.apache.spark.sql.functions.avg("p_retailprice")).head.getDouble(0)
    val rows = Relational.q18AboveAvg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("retail") > mean - 0.01))
  }
}
