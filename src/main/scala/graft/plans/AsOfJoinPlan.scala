package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN as a first-class operator — the full custom-operator
  * ladder (logical node → planner Strategy → physical SparkPlan),
  * for the one temporal-join shape Spark's built-in operators cannot
  * express as a join: for every left row, the LATEST right row with
  * the same key and `rightTs <= leftTs`.
  *
  * [[graft.operators.Temporal.qAsofJoin]] composes the same
  * semantics from a union + running-max window — correct, but it
  * materializes a union ordering and pays the window machinery. This
  * operator is the shape a 100 TB engine actually wants:
  *
  *  - requiredChildDistribution clusters BOTH sides on the key, so
  *    EnsureRequirements co-partitions them (one shuffle each, the
  *    sort-merge-join discipline);
  *  - requiredChildOrdering asks for (key, ts) sort within
  *    partitions — satisfied by a local SortExec, or for FREE when
  *    the sides are bucketed+sorted tables;
  *  - execution is a single forward MERGE pass per partition —
  *    O(n+m), no window buffer, no per-row state beyond the one
  *    carried match, nothing materialized.
  *
  * Keys and timestamps must be non-null LongType-backed (bigint /
  * timestamp) columns — the physical compare is on the primitive
  * long, which is exactly the gated query's shape and the common
  * production one (entity id + event time).
  *
  * The strategy is injected per session via [[AsOfJoinPlan.install]]
  * (experimental.extraStrategies — the [[GraftExtensions]] pattern);
  * [[AsOfJoinPlan.asofJoin]] is the public DataFrame-in,
  * DataFrame-out API. Cross-checked two ways: the oracle gate runs
  * DuckDB's native ASOF JOIN semantics (correlated max), and
  * ExtensionSpec asserts the physical plan really is AsOfJoinExec
  * over two sorted, co-partitioned children.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  // right side is outer: left rows with no as-of match keep nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.length
    val outSchema = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outSchema, outSchema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // the one carried match: the latest right row (key, ts) has
      // passed for the CURRENT left key — copied out of the sorter's
      // reused row buffer
      var matchKey = 0L
      var hasMatch = false
      var matchRow: InternalRow = null
      // right head lookahead (sorter rows are reused: values read
      // before advancing)
      // nulls would silently unbox to 0L (NULL keys joining bucket 0,
      // NULL timestamps acting as epoch) — fail loudly instead
      def longOf(v: Any, what: String): Long = v match {
        case l: java.lang.Long => l.longValue
        case null => throw new IllegalStateException(
          s"as-of join $what must be non-null")
        case other => other.asInstanceOf[Long]
      }
      var rHas = rIt.hasNext
      var rRow: InternalRow = if (rHas) rIt.next() else null
      var rKey = if (rHas) longOf(rk.eval(rRow), "right key") else 0L
      var rTs = if (rHas) longOf(rt.eval(rRow), "right timestamp") else 0L
      def advance(): Unit =
        if (rIt.hasNext) {
          rRow = rIt.next()
          rKey = longOf(rk.eval(rRow), "right key")
          rTs = longOf(rt.eval(rRow), "right timestamp")
        } else { rHas = false; rRow = null }
      lIt.map { lRow =>
        val key = longOf(lk.eval(lRow), "left key")
        val ts = longOf(lt.eval(lRow), "left timestamp")
        // drop right rows for keys already passed, then absorb every
        // right row at this key with rTs <= ts (the merge invariant:
        // both sides ascend in (key, ts), so nothing skipped here is
        // needed by any later left row)
        while (rHas && (rKey < key || (rKey == key && rTs <= ts))) {
          if (rKey == key) { matchKey = key; hasMatch = true; matchRow = rRow.copy() }
          advance()
        }
        val m = if (hasMatch && matchKey == key) matchRow else nullRight
        proj(joined(lRow, m))
      }
    }
  }
}

object AsOfJoinPlan {
  /** Idempotent per-session strategy injection (the
    * [[GraftExtensions.install]] pattern). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** left ASOF JOIN right ON key, rightTs <= leftTs (latest match,
    * right side null-extended when no match). Column names are
    * resolved against each side's analyzed output. */
  def asofJoin(
      spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String): DataFrame = {
    install(spark)
    val lp = org.apache.spark.sql.graftbridge.Bridge.logicalPlan(left)
    val rp = org.apache.spark.sql.graftbridge.Bridge.logicalPlan(right)
    // a custom binary node gets NO analyzer relation-deduplication:
    // shared attribute ids across the sides would bind right-side
    // columns to left-row positions (silently wrong output) — refuse
    // them and tell the caller the fix
    val shared = lp.outputSet.intersect(rp.outputSet)
    if (shared.nonEmpty)
      throw new IllegalArgumentException(
        "as-of join sides share attribute ids " + shared.toSeq.map(_.name).mkString(", ") +
          " — derive each side from its own read (e.g. call the table loader twice), " +
          "not from one shared DataFrame")
    def res(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' in ${plan.output.map(_.name)}"))
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      AsOfJoin(lp, rp, res(lp, key), res(rp, key), res(lp, leftTs), res(rp, rightTs)))
  }
}
