package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native codegen'd set/signature expressions over `array<long>`
  * columns — the LSH verification hot path. The mapPartitions kernel
  * forms work but force a DeserializeToObject/SerializeFromObject
  * boundary (every row converted to external objects and back, which
  * profiling showed as the SafeProjection.MapObjects hot frames);
  * these expressions keep the whole candidate-verification stage
  * inside one WholeStageCodegen span. Same arithmetic as the kernels
  * and the DuckDB oracle, so results are bit-identical.
  */

/** Exact set Jaccard |A∩B| / |A∪B| of two SORTED DISTINCT
  * `array<long>` columns via linear merge; |A∪B| = |A|+|B|-|A∩B|.
  * Matches DuckDB `len(list_intersect(a,b)) / len(list_distinct(a||b))`
  * on sorted-distinct inputs. Two empty sets yield 0.0 (not 0/0 NaN):
  * the expression is registered as a general session function, so it
  * must be safe for callers whose arrays can be empty. */
case class JaccardSortedLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { inter += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $u = $a.getLong($i); long $v = $b.getLong($j);
         |  if ($u == $v) { $inter++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |int ${inter}_u = $na + $nb - $inter;
         |${ev.value} = ${inter}_u == 0 ? 0.0 : ((double) $inter) / ${inter}_u;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact |A∩B| of two SORTED DISTINCT `array<long>` columns via
  * linear merge — the winnowing-containment verifier's inner loop.
  * Matches DuckDB `len(list_intersect(a,b))` on sorted-distinct
  * inputs. Replacing `size(array_intersect(...))` (hash-set build +
  * result-array materialization per pair, interpreted) with this
  * merge count took the winnow scoring stage from ~34s to ~4s CPU at
  * sf0.1. */
case class IntersectCountSortedLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val u = x.getLong(i); val v = y.getLong(j)
      if (u == v) { inter += 1; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    inter
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  long $u = $a.getLong($i); long $v = $b.getLong($j);
         |  if ($u == $v) { $inter++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of positions where two equal-length `array<long>` columns
  * agree — the MinHash signature-estimate compare. */
case class EqCountLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var m = 0; var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) m += 1; i += 1 }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $m = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $m++;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetExprs {
  private val JaccardFn = "graft_jaccard_sorted_long"
  private val EqCountFn = "graft_eq_count_long"
  private val InterFn = "graft_intersect_count_sorted_long"

  /** Registers the expressions in the session's function registry and
    * installs the [[JaccardLengthPrune]] optimizer rule (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      JaccardFn, exprs => JaccardSortedLong(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      EqCountFn, exprs => EqCountLong(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      InterFn, exprs => IntersectCountSortedLong(exprs(0), exprs(1)), "built-in")
    GraftExtensions.install(spark)
  }

  def jaccardSorted(a: Column, b: Column): Column = call_function(JaccardFn, a, b)

  def eqCount(a: Column, b: Column): Column = call_function(EqCountFn, a, b)

  def intersectCountSorted(a: Column, b: Column): Column = call_function(InterFn, a, b)
}
