package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Structured Streaming surface over the `events` table.
  *
  * The reference's "streaming" is transport only (Node object-mode
  * Transforms, no event time — SURVEY.md §2.3 A9); this is the real
  * thing: a file-source `readStream` with an event-time watermark and
  * tumbling-window aggregation. For the correctness gate the query
  * runs to completion against the static parquet (a bounded stream),
  * lands in a memory sink, and the final table must equal the batch
  * answer — exactly the semantics Structured Streaming guarantees
  * (streaming query ≡ incremental execution of the batch plan).
  *
  * At scale the same plan runs unbounded: the 1-hour watermark bounds
  * state, windows emit incrementally, and the memory sink becomes a
  * parquet/Kafka sink. Nothing in the aggregation changes.
  */
object Streams {

  /** Streaming state stores are per shuffle partition, and their
    * per-micro-batch overhead dominates small-state queries (measured
    * 11s -> 3s at sf0.1 going 32 -> 8 partitions). Streaming jobs pin
    * their partition count at start anyway (it's fixed into the
    * checkpoint), so these queries set it explicitly and restore the
    * session value after. At scale, size to key cardinality. */
  private val StreamPartitions = "8"

  private def withStreamPartitions[A](s: SparkSession)(body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", StreamPartitions)
    try body
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Tumbling 1-hour windows per event_type, streamed end-to-end. */
  def qWindowAgg(s: SparkSession, dir: String): DataFrame = withStreamPartitions(s) {
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema // ts arrives as long nanos
    val name = "graft_win_" + UUID.randomUUID().toString.replace("-", "")
    // The file stream source monitors a directory; the test table is a
    // single file, so expose it through a temp dir symlink.
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_")
    streamDir.toFile.deleteOnExit()
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    val stream = Tables.fixEventTs(s.readStream.schema(schema).parquet(streamDir.toString))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(name)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val qWindowAggSql: String =
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
      |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // Custom streaming state: per-user running (count, sum) maintained
  // in mapGroupsWithState — the arbitrary-state API a pipeline uses
  // when built-in aggregations can't express the state machine. Each
  // micro-batch emits the group's updated state (update mode); the
  // final state per user must equal the batch aggregate, which is the
  // oracle. State is one (long, double) per user — bounded, and at
  // scale partitioned by the grouping key in the state store.
  def qStatefulCounts(s: SparkSession, dir: String): DataFrame = withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import s.implicits._
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = "graft_state_" + UUID.randomUUID().toString.replace("-", "")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_")
    streamDir.toFile.deleteOnExit()
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    val stream = s.readStream.schema(schema).parquet(streamDir.toString)
    val updates = stream.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          var (n, sum) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; sum += v }
          state.update((n, sum))
          (user, n, sum)
      }
      .toDF("user_id", "n_events", "sum_value")
    val q = updates.writeStream
      .format("memory").queryName(name).outputMode("update").start()
    try q.processAllAvailable()
    finally q.stop()
    // multiple micro-batches emit successive states; the final state
    // per user is the row with the highest count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    s.table(name)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("user_id"))
  }

  val qStatefulCountsSql: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // Stream-stream join: purchases joined to same-user clicks in the
  // preceding hour, both sides watermarked so the join state is
  // bounded (clicks older than purchase-watermark - 1h are evicted).
  // Inner time-interval join emits matches as they form; on the
  // bounded source the result equals the batch interval join, which
  // is the oracle.
  def qStreamStreamJoin(s: SparkSession, dir: String): DataFrame = withStreamPartitions(s) {
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val name = "graft_ssj_" + UUID.randomUUID().toString.replace("-", "")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_")
    streamDir.toFile.deleteOnExit()
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    def side(tpe: String, prefix: String) =
      Tables.fixEventTs(s.readStream.schema(schema).parquet(streamDir.toString))
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${prefix}_id"), col("user_id").as(s"${prefix}_user"),
          col("ts").as(s"${prefix}_ts"))
        .withWatermark(s"${prefix}_ts", "1 hour")
    val purchases = side("purchase", "p")
    val clicks = side("click", "c")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
    val q = joined.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(name)
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      .orderBy(col("p_id"), col("c_id"))
  }

  val qStreamStreamJoinSql: String =
    """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events)
      |SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id,
      |  date_diff('microsecond', c.ts, p.ts) AS gap_us
      |FROM ev p JOIN ev c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      | AND p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY p_id, c_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> (qWindowAgg _),
    "stream_stateful_counts" -> (qStatefulCounts _),
    "stream_stream_join" -> (qStreamStreamJoin _))

  val oracles: Map[String, String] = Map(
    "stream_window_agg" -> qWindowAggSql,
    "stream_stateful_counts" -> qStatefulCountsSql,
    "stream_stream_join" -> qStreamStreamJoinSql)
}
