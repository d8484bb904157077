package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the custom codegen'd expressions against naive
  * Scala implementations over generated inputs, exercising BOTH
  * evaluation paths: the `doGenCode` path through a DataFrame (the
  * `repartition` stops ConvertToLocalRelation from folding the
  * projection at optimization time with the interpreted eval) and the
  * interpreted `nullSafeEval` path via Literal children. */
class ExprPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // sorted distinct long sets, including empties and heavy overlap
  // (small value domain forces non-trivial intersections)
  private val longSet: Gen[Seq[Long]] =
    Gen.chooseNum(0, 40)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-50L, 50L)))
      .map(_.distinct.sorted.toSeq)

  private def naiveJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val union = (sa ++ sb).size
    if (union == 0) 0.0 else (sa & sb).size.toDouble / union
  }

  test("JaccardSortedLong equals set jaccard on random sorted sets, both eval paths") {
    SetExprs.register(spark)
    import spark.implicits._
    val cases = samples(Gen.zip(longSet, longSet), 300)
    // codegen path: one distributed pass over all cases
    val got = cases.toDF("a", "b")
      .repartition(4)
      .select(col("a"), col("b"), SetExprs.jaccardSorted(col("a"), col("b")).as("j"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getSeq[Long](0), r.getSeq[Long](1))
      assert(r.getDouble(2) == naiveJaccard(a, b), s"codegen: a=$a b=$b")
    }
    // interpreted path
    cases.foreach { case (a, b) =>
      val e = JaccardSortedLong(
        Literal.create(a, ArrayType(LongType)), Literal.create(b, ArrayType(LongType)))
      assert(e.eval(null) == naiveJaccard(a, b), s"eval: a=$a b=$b")
    }
  }

  // equal-length signature pairs over a tiny domain (positions agree
  // often enough to exercise every count)
  private val sigPair: Gen[(Seq[Long], Seq[Long])] =
    Gen.chooseNum(0, 32).flatMap { n =>
      Gen.zip(
        Gen.listOfN(n, Gen.chooseNum(0L, 3L)).map(_.toSeq),
        Gen.listOfN(n, Gen.chooseNum(0L, 3L)).map(_.toSeq))
    }

  test("EqCountLong equals positionwise agreement count, both eval paths") {
    SetExprs.register(spark)
    import spark.implicits._
    val cases = samples(sigPair, 300)
    def naive(a: Seq[Long], b: Seq[Long]): Int = a.zip(b).count { case (x, y) => x == y }
    val got = cases.toDF("a", "b")
      .repartition(4)
      .select(col("a"), col("b"), SetExprs.eqCount(col("a"), col("b")).as("m"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getSeq[Long](0), r.getSeq[Long](1))
      assert(r.getInt(2) == naive(a, b), s"codegen: a=$a b=$b")
    }
    cases.foreach { case (a, b) =>
      val e = EqCountLong(
        Literal.create(a, ArrayType(LongType)), Literal.create(b, ArrayType(LongType)))
      assert(e.eval(null) == naive(a, b), s"eval: a=$a b=$b")
    }
  }

  private val vecPair: Gen[(Seq[Double], Seq[Double])] =
    Gen.chooseNum(0, 64).flatMap { n =>
      val d = Gen.chooseNum(-1000, 1000).map(_ / 128.0) // exact dyadics and not
      Gen.zip(Gen.listOfN(n, d).map(_.toSeq), Gen.listOfN(n, d).map(_.toSeq))
    }

  test("DotF64 is bit-identical to the sequential JVM dot, both eval paths") {
    DotF64.register(spark)
    import spark.implicits._
    val cases = samples(vecPair, 300)
    // same association as the expression: s += a(i)*b(i), left to right
    def naive(a: Seq[Double], b: Seq[Double]): Double =
      graft.functions.Vectors.dotJvm(a.toArray, b.toArray)
    val got = cases.toDF("a", "b")
      .repartition(4)
      .select(col("a"), col("b"), DotF64.dot(col("a"), col("b")).as("d"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getSeq[Double](0), r.getSeq[Double](1))
      assert(r.getDouble(2) == naive(a, b), s"codegen: a=$a b=$b")
    }
    cases.foreach { case (a, b) =>
      val e = DotF64(
        Literal.create(a, ArrayType(DoubleType)), Literal.create(b, ArrayType(DoubleType)))
      assert(e.eval(null) == naive(a, b), s"eval: a=$a b=$b")
    }
  }
}
