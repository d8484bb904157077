package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a BIGINT key
  * against a pre-built Bloom filter — the semi-join prefilter that
  * makes a 100 TB fact scan cheap when the build side is too big to
  * broadcast as a hash relation but its KEY SET fits in a few MB of
  * bits.
  *
  * `left` is the key column; `right` is the serialized filter as a
  * foldable binary literal (the plan ships bytes, each executor
  * deserializes once — the same transport Spark's own
  * InjectRuntimeFilter uses for its `BloomFilterMightContain`, which
  * is `private[sql]` and only reachable via that optimizer rule;
  * this expression is the library-surface equivalent). The probe is
  * codegen'd to a single virtual call on the deserialized filter, so
  * the prefilter runs inside the scan's WholeStageCodegen span
  * BEFORE the shuffle — false positives only cost the exactness of
  * the prune, never correctness, because the exact join still runs
  * on the survivors.
  */
case class MightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  // Declarative input typing: ExpectsInputTypes/ImplicitCastInputTypes
  // are private[sql] in Spark 4, so the registry builder widens
  // narrower integral keys itself (MightContainLong.widened) and this
  // check turns any remaining mismatch into a typed ANALYSIS error —
  // without it, codegen silently widened an int key while the
  // interpreted path threw ClassCastException in nullSafeEval.
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain expects (BIGINT, BINARY), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(right.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(v: Any, ignored: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $bloomRef.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MightContainLong {
  private val FnName = "graft_bloom_might_contain"

  /** Loss-free widening for narrower integral keys (byte/short/int →
    * long), applied at build time so both eval paths see a LONG; any
    * other type is left alone for checkInputDataTypes to reject. */
  private def widened(e: Expression): Expression =
    if (!e.resolved) e
    else e.dataType match {
      case ByteType | ShortType | IntegerType => Cast(e, LongType)
      case _ => e
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      exprs => {
        require(exprs.length == 2,
          s"$FnName expects 2 arguments (key BIGINT, filter BINARY), got ${exprs.length}")
        MightContainLong(widened(exprs(0)), exprs(1))
      },
      "built-in")

  def probe(key: Column, bloomBytes: Array[Byte]): Column =
    call_function(FnName, key, org.apache.spark.sql.functions.lit(bloomBytes))
}
