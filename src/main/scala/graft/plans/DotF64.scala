package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<double>`
  * columns, with whole-stage codegen.
  *
  * Higher-order-function formulations (`aggregate(zip_with(...))`)
  * are interpreted per element; a 64-term unrolled chain blows up the
  * generated method. This is the textbook case for a custom
  * `Expression` with `doGenCode`: the generated code is a primitive
  * loop over the two `ArrayData`, inlined into the surrounding
  * whole-stage-codegen'd operator. Summation is sequential
  * (s += a[i]*b[i]), bit-identical to the oracle's left-to-right sum
  * chain and to [[graft.functions.Vectors.dotJvm]].
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {
  // Inputs must be array<double>; call sites are library-internal
  // (ExpectsInputTypes is private[sql] in Spark 4, so no declarative
  // type check here).

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotF64 {
  private val FnName = "graft_dot_f64"

  /** Registers the expression in the session's function registry
    * (idempotent) and returns a Column-level handle. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => DotF64(exprs(0), exprs(1)), "built-in")

  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)
}
