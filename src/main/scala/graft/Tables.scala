package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). Each call is a plain parquet scan: Catalyst
  * handles column pruning / predicate pushdown into the scan, so
  * callers should `select`/`filter` freely and let the optimizer
  * trim the read.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * loader shape (name -> DataFrame) is the only coupling, so swapping
  * `read.parquet(path)` for `spark.table(name)` is a one-line change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` arrives in whatever physical form the generator
    * chose for the round — TIMESTAMP(NANOS) (which Spark's reader
    * rejects unless read as a long) or plain µs TIMESTAMP_NTZ — so
    * the loader normalizes to session-local TimestampType here,
    * matching a DuckDB `CAST(ts AS TIMESTAMP)`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fixEventTs(load(s, d, "events"))
  }

  /** ts physical form -> TimestampType µs: ns-as-long truncates via
    * integer division (DuckDB's ns->µs cast semantics); TIMESTAMP_NTZ
    * casts losslessly (the session timezone is pinned to UTC in
    * [[GraftSession]], so the µs value is unchanged). */
  def fixEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
