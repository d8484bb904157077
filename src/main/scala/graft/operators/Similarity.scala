package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * Two tiers, as a production pipeline would have:
  *  - [[qTopkCosine]] — brute-force cosine top-k: the exact baseline
  *    and the in-bucket scorer. The probe side (1-in-50 vectors) is
  *    small, so Catalyst broadcasts it and the corpus streams through
  *    map-side scoring + a per-group top-k window; the corpus is
  *    never shuffled whole, only the k·|queries| survivors.
  *  - [[qLshBuckets]] — random-hyperplane LSH signatures: the 100 TB
  *    path. Signatures are map-only per vector; bucketing on the
  *    signature replaces the all-pairs join with per-bucket joins.
  *    Hyperplanes are derived deterministically from md5 so the
  *    DuckDB oracle reproduces them bit-for-bit (±1 components,
  *    exact same double arithmetic on both engines).
  *
  * Ranking determinism: cosine is rounded to 6 decimals before
  * ranking with a vec_id tiebreak, so both engines order identically
  * even at float boundaries.
  */
object Similarity {

  private val TopK = 5
  private val QueryStride = 50 // vec_id % 50 == 0 -> the probe set
  private val NumPlanes = 8

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def qTopkCosine(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val queries = e.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = Tables.embeddings(s, dir) // rescan: corpus side stays un-broadcast
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("rank"), col("vec_id").as("neighbor"), col("cos").as("cosine"))
      .orderBy(col("qid"), col("rank"))
  }

  val qTopkCosineSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v,
       |  sqrt(list_aggregate(list_transform(range(len(v)), i -> v[i+1] * v[i+1]), 'sum')) AS nrm
       |  FROM e),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % $QueryStride = 0),
       |scored AS (SELECT q.qid, n.vec_id,
       |  round(list_aggregate(list_transform(range(len(n.v)), i -> n.v[i+1] * q.qv[i+1]), 'sum')
       |        / (n.nrm * q.qn), 6) AS cos
       |  FROM n JOIN q ON n.vec_id <> q.qid),
       |r AS (SELECT qid, vec_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT qid, rank, vec_id AS neighbor, cos AS cosine FROM r
       |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin

  /** Deterministic ±1 hyperplane component for (plane, dim): parity
    * of the first md5 nibble of "p_d". */
  private def planeSign(p: Int, i: Column): Column =
    when(conv(substring(md5(concat(lit(s"${p}_"), i.cast("string"))), 1, 1), 16, 10)
      .cast("int") % 2 === 1, lit(1.0)).otherwise(lit(-1.0))

  def qLshBuckets(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val bucket = (0 until NumPlanes).map { p =>
      val d = aggregate(
        transform(sequence(lit(0), size(col("v")) - 1),
          i => element_at(col("v"), i + 1) * planeSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    e.select(col("vec_id"), col("label"), bucket.as("bucket"))
      .orderBy(col("vec_id"))
  }

  val qLshBucketsSql: String = {
    val planeTerms = (0 until NumPlanes).map { p =>
      s"""CASE WHEN list_aggregate(list_transform(range(len(v)),
         |  i -> v[i+1] * (CASE WHEN (strpos('0123456789abcdef', substr(md5('${p}_' || CAST(i AS VARCHAR)), 1, 1)) - 1) % 2 = 1 THEN 1.0 ELSE -1.0 END)),
         |  'sum') > 0 THEN ${1 << p} ELSE 0 END""".stripMargin
    }.mkString(" +\n  ")
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT vec_id, label,
       |  $planeTerms AS bucket
       |FROM e ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_cosine" -> (qTopkCosine _),
    "sim_lsh_buckets" -> (qLshBuckets _),
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_cosine" -> qTopkCosineSql,
    "sim_lsh_buckets" -> qLshBucketsSql,
  )
}
