package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over fixed-dimension `array<double>` embedding
  * columns (the test corpus is 64-dim).
  *
  * The generic `aggregate(zip_with(...))` formulation allocates an
  * intermediate array and dispatches a lambda per element, per pair —
  * measured 16.7s for the 2M-pair near-dup sweep at sf0.1. The
  * unrolled form below is a flat 64-term arithmetic chain that
  * whole-stage codegen compiles to straight-line multiply-adds: no
  * allocations, no virtual calls. Left-to-right association is part
  * of the contract — the DuckDB oracle sums in the same order, so
  * doubles match bit-for-bit.
  */
object Vectors {

  val Dim = 64

  /** dot(a, b) unrolled: ((a1*b1 + a2*b2) + a3*b3) + ... */
  def dot(a: Column, b: Column, dim: Int = Dim): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i)).reduceLeft(_ + _)

  /** Same chain as SQL text for the DuckDB oracle: `a[1]*b[1] + ...` */
  def dotSql(a: String, b: String, dim: Int = Dim): String =
    (1 to dim).map(i => s"$a[$i]*$b[$i]").mkString(" + ")

  def norm(v: Column, dim: Int = Dim): Column = sqrt(dot(v, v, dim))

  def normSql(v: String, dim: Int = Dim): String = s"sqrt(${dotSql(v, v, dim)})"

  /** Deterministic ±1 hyperplane components for random-hyperplane LSH:
    * sign(p, i) = parity of the first hex nibble of md5("p_i").
    * Computed once on the driver and baked into the plan (and into the
    * generated oracle SQL) as literals — no per-row hashing. */
  def planeSigns(numPlanes: Int, dim: Int = Dim): Seq[Seq[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      (0 until dim).map { i =>
        val h = md.digest(s"${p}_$i".getBytes(StandardCharsets.UTF_8))
        val nibble = (h(0) >> 4) & 0xf
        if (nibble % 2 == 1) 1.0 else -1.0
      }
    }
  }

  /** JVM twin of Spark's `round(x, s)` on DoubleType — Catalyst's
    * Round goes through BigDecimal.valueOf (shortest double string)
    * with HALF_UP, so a kernel replicating a rounded expression must
    * use exactly this form, not math.round tricks. */
  def roundJvm(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  def round6Jvm(x: Double): Double = roundJvm(x, 6)

  /** JVM-side dot product with the same left-to-right association as
    * [[dot]]/[[dotSql]] — used by per-partition imperative kernels;
    * results are bit-identical to the expression forms. */
  def dotJvm(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Signed projection of `v` onto plane `signs`: v[1]*s1 + v[2]*s2 + … */
  def signedProjection(v: Column, signs: Seq[Double]): Column =
    signs.zipWithIndex.map { case (sgn, i) =>
      element_at(v, i + 1) * lit(sgn)
    }.reduceLeft(_ + _)

  def signedProjectionSql(v: String, signs: Seq[Double]): String =
    signs.zipWithIndex.map { case (sgn, i) => s"$v[${i + 1}]*$sgn" }.mkString(" + ")
}
