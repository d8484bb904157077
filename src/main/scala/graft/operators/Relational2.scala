package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Second relational wave: outer joins, range/theta join, pivot,
  * grouping sets through the SQL surface, lateral explode, and
  * approximate sketches. Same conventions as [[Relational]]:
  * declarative plans, deterministic ordering, DuckDB oracles (the
  * sketch query, whose HLL/KLL internals legitimately differ between
  * engines, is gated through error-bound invariants instead of raw
  * sketch values). */
object Relational2 {

  // ---------------------------------------------------------------
  // q20: FULL OUTER join of two aggregates — preserves nations that
  // appear on only one side; coalesce supplies the zero counts.
  def q20FullOuter(s: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val suppN = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    custN.join(suppN, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q20Sql: String =
    """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      |  COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |  USING (nationkey)
      |ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------
  // q21: range (theta) join — orders binned into literal price tiers.
  // The tier table is tiny → broadcast nested loop with the band
  // predicate, which is exactly the right physical plan; the big side
  // streams through map-side.
  private val tiers = Seq(
    ("bronze", 0.0, 100000.0),
    ("silver", 100000.0, 250000.0),
    ("gold", 250000.0, 400000.0),
    ("platinum", 400000.0, 1000000.0))

  def q21RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = broadcast(tiers.toDF("tier", "lo", "hi"))
    Tables.orders(s, dir)
      .join(t, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("tier"))
      // exact decimal money sum (see Relational.moneySum)
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,6)")), 2).cast("double").as("total"))
      .orderBy(col("tier"))
  }

  val q21Sql: String = {
    val values = tiers.map { case (t, lo, hi) => s"('$t', $lo, $hi)" }.mkString(", ")
    s"""SELECT tier, count(*) AS n,
       |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
       |FROM orders JOIN (VALUES $values) AS tiers(tier, lo, hi)
       |  ON o_totalprice >= lo AND o_totalprice < hi
       |GROUP BY tier ORDER BY tier""".stripMargin
  }

  // ---------------------------------------------------------------
  // q22: pivot — order counts by priority × status. Statuses are
  // pinned explicitly so the output schema is static (required for
  // both a sane pivot at scale and a stable oracle).
  def q22Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  val q22Sql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q33: unpivot (melt) — the inverse reshape of q22's pivot: the
  // wide per-status counts fold back into (priority, status, n)
  // rows via Spark's native `unpivot` (relational MELT, 3.4+). The
  // round trip q22 -> q33 is the schema-evolution path a pipeline
  // uses when a wide metrics table must become long again for
  // storage or joining; unpivot is a map-only generator (each wide
  // row emits |values| long rows — no shuffle beyond q22's agg).
  def q33Unpivot(s: SparkSession, dir: String): DataFrame =
    q22Pivot(s, dir)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_f"), col("n_o"), col("n_p")),
        "status_col", "n_orders")
      .withColumn("o_orderstatus", upper(substring(col("status_col"), 3, 1)))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("n_orders"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  val q33Sql: String =
    """WITH p AS (SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'F' AS o_orderstatus, n_f AS n_orders FROM p
      |UNION ALL SELECT o_orderpriority, 'O', n_o FROM p
      |UNION ALL SELECT o_orderpriority, 'P', n_p FROM p
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  // ---------------------------------------------------------------
  // q23: GROUPING SETS through the SQL surface (spark.sql) — the
  // reference has no query language (SURVEY.md §2.3 A6); Catalyst
  // provides one for free, demonstrated here end-to-end.
  def q23GroupingSets(s: SparkSession, dir: String): DataFrame = {
    // Narrow-stage note: the Expand×3 + decimal partials run on the
    // single-file scan's ~3 partitions (0.97s CPU / 3 tasks at
    // sf0.1). A q25-style repartition does NOT pay here — the
    // shuffle WRITE runs on the same 3 scan tasks and costs what the
    // aggregate did (measured: 1.46s → 1.44s, net zero). The width
    // lever for a CPU-heavy scan-adjacent aggregate is the scan
    // split size (spark.sql.files.maxPartitionBytes), a session
    // knob, not a plan change; on a real multi-file table the scan
    // parallelizes by itself.
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total, count(*) AS n,
        |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)
  }

  val q23Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total, count(*) AS n,
      |  grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q41: RECURSIVE CTE (Spark 4's WITH RECURSIVE) — the hierarchy
  // walk every org-chart / category-tree / lineage query needs,
  // exercised through the SQL surface on a synthetic halving tree
  // over customer (parent(k) = k div 2, root = 1): the anchor seeds
  // the root, the recursive term level-joins children, and the gate
  // checks per-depth counts/checksums — any duplicated or dropped
  // level breaks them. Plan shape: Spark executes the recursion as
  // level-synchronous joins (UnionLoop), exactly how a 1000-executor
  // cluster walks a 100 TB hierarchy: each level is one distributed
  // join, depth = O(log n) iterations, never a driver-side loop.
  def q41RecursiveCte(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""WITH RECURSIVE anc AS (
         |  SELECT c_custkey, 0 AS depth
         |  FROM parquet.`$dir/customer.parquet` WHERE c_custkey = 1
         |  UNION ALL
         |  SELECT c.c_custkey, a.depth + 1
         |  FROM parquet.`$dir/customer.parquet` c
         |  JOIN anc a ON c.c_custkey div 2 = a.c_custkey
         |  WHERE c.c_custkey > 1)
         |SELECT depth, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(c_custkey) AS BIGINT) AS sum_key,
         |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
         |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)

  val q41Sql: String =
    """WITH RECURSIVE anc AS (
      |  SELECT c_custkey, 0 AS depth FROM customer WHERE c_custkey = 1
      |  UNION ALL
      |  SELECT c.c_custkey, a.depth + 1
      |  FROM customer c JOIN anc a ON c.c_custkey // 2 = a.c_custkey
      |  WHERE c.c_custkey > 1)
      |SELECT depth, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(c_custkey) AS BIGINT) AS sum_key,
      |  min(c_custkey) AS min_key, max(c_custkey) AS max_key
      |FROM anc GROUP BY depth ORDER BY depth""".stripMargin

  // ---------------------------------------------------------------
  // q24: lateral explode — word frequencies over documents, the
  // canonical flatten-then-aggregate. The explode is map-side; only
  // (word, partial count) shuffles.
  def q24ExplodeWords(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(lower(trim(col("text"))), s"[${Text.Re2Ws}]+")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  val q24Sql: String =
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word FROM documents)
      |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q25: approximate sketches — HLL distinct + quantile sketch.
  // Sketch values differ per engine, so instead of emitting the raw
  // sketch outputs (which would force a rows-only check), the query
  // emits the exact ride-alongs PLUS error-bound assertions computed
  // from the sketches: |HLL - exact|/exact within 3x the default 5%
  // rsd, and the approx median's RANK within 0.5% of n/2 — rank error
  // is the actual guarantee a quantile sketch makes, and checking it
  // distributedly (one filter+count pass against the broadcast 1-row
  // sketch result) avoids the single-group sort an exact median would
  // need. The oracle states the bounds as invariants (TRUE), so a
  // sketch drifting out of tolerance turns the row red in the gate.
  def q25Sketches(s: SparkSession, dir: String): DataFrame = {
    // The sketch partials (QuantileSummaries compress/merge, HLL) are
    // CPU-heavy, and the single-file test scan yields ~3 partitions —
    // the narrow-CPU-stage trap: pin the kernel width with an explicit
    // count so the partial-agg stage parallelizes (profiled: stage CPU
    // 1.16s over 3 tasks before, spread over defaultParallelism after;
    // the shuffled bytes are just the two input columns).
    val wide = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_extendedprice"))
      .repartition(s.sparkContext.defaultParallelism, col("l_partkey"))
    val ag = wide.agg(
      approx_count_distinct(col("l_partkey")).as("ap"),
      countDistinct(col("l_partkey")).as("exact_parts"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(2000)).as("am"),
      count(lit(1)).as("n"))
    Tables.lineitem(s, dir).select(col("l_extendedprice"))
      .crossJoin(broadcast(ag))
      .groupBy(col("exact_parts"), col("n"), col("ap"), col("am"))
      .agg(
        sum(when(col("l_extendedprice") < col("am"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("l_extendedprice") <= col("am"), 1L).otherwise(0L)).as("n_at_or_below"))
      .select(col("exact_parts"), col("n"),
        (abs(col("ap") - col("exact_parts")) / col("exact_parts") <= 0.15).as("err_parts_ok"),
        (col("n_below") <= col("n") * 0.505 && col("n_at_or_below") >= col("n") * 0.495)
          .as("err_median_ok"))
  }

  val q25Sql: String =
    """SELECT count(DISTINCT l_partkey) AS exact_parts, count(*) AS n,
      |  TRUE AS err_parts_ok, TRUE AS err_median_ok
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------
  // q26: custom typed aggregate — per-customer top-3 order totals via
  // Aggregator[IN,BUF,OUT] with a bounded k-element buffer: partial
  // aggregation ships at most k doubles per group per partition
  // (contrast q9, which windows full rows). Output is a joined string
  // so the oracle compares exactly.
  def q26TopkAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top3 = new graft.functions.TopKAggregator(3).toColumn
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(top3.name("top3"))
      .toDF("o_custkey", "top3")
      .select(col("o_custkey"),
        concat_ws(",", transform(col("top3"), x => round(x, 2).cast("string"))).as("top3_prices"))
      .orderBy(col("o_custkey"))
  }

  val q26Sql: String =
    """SELECT o_custkey,
      |  array_to_string(list_transform(
      |    (list(o_totalprice ORDER BY o_totalprice DESC))[1:3],
      |    x -> CAST(round(x, 2) AS VARCHAR)), ',') AS top3_prices
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q27: salted two-phase aggregation — the skew-mitigation pattern
  // spelled out: partial-aggregate on (key, salt) so a hot key's rows
  // spread over 16 reducers, then final-aggregate on the key. For
  // low-cardinality/skewed keys (here: 3 return flags over 600k rows)
  // this caps any single reducer's load at ~1/16 of the hot key.
  // Results are identical to the direct groupBy (the oracle).
  private val SaltBuckets = 16

  def q27SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    // Money sums as integer CENTS (round(x*100) -> long): double
    // summation is association-dependent, and at sf0.1 (~600k rows,
    // 11-digit totals) Spark's partition order vs DuckDB's diverges in
    // the last decimal — two Spark runs could too. Long sums are exact
    // and order-independent at ANY scale; divide back once at the end.
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val salted = Tables.lineitem(s, dir)
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(SaltBuckets)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(col("l_quantity")).as("part_qty"),
        sum(cents).as("part_cents"),
        count(lit(1)).as("part_n"))
    salted.groupBy(col("l_returnflag"))
      .agg(round(sum(col("part_qty")), 2).as("sum_qty"),
        round(sum(col("part_cents")) / 100.0, 1).as("sum_price"),
        sum(col("part_n")).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val q27Sql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 1) AS sum_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  // q29: bucketed co-located join — both sides written as
  // catalog-backed tables bucketed (and sorted) on the join key, so
  // the subsequent join is a sort-merge with NO shuffle on either
  // side (bucket files align 1:1). This is the 100 TB pattern for a
  // fact-fact join that runs repeatedly: pay the bucketed write once,
  // then every join on that key is exchange-free. The write happens
  // inside the query here to keep it self-contained; the only
  // shuffle in the final plan is the small post-join aggregation.
  private val BucketCount = 8

  /** Bucket-table build, memoized per (session, sfDir): the pattern
    * being demonstrated is pay-the-bucketed-write-once-join-many, so
    * repeat calls (bench warmup + measured pass) must not re-pay the
    * write — the measured q29 time is then the join the pattern
    * advertises, per the round-1 verdict's bench-hygiene note. */
  @volatile private var bucketTablesFor: (SparkSession, String) = null

  private def ensureBucketTables(s: SparkSession, dir: String): Unit = synchronized {
    if (bucketTablesFor == ((s, dir)) && s.catalog.tableExists("graft_buck.lineitem_b")) return
    // app-id suffix: a concurrent session (e.g. Verify next to sbt
    // test) must not delete/rewrite this session's bucket files
    // mid-read.
    val wh = graft.GraftSession.warehouseRoot(s)
    s.sql(s"CREATE DATABASE IF NOT EXISTS graft_buck LOCATION '$wh'")
    // The in-memory catalog forgets tables across sessions but their
    // files survive; drop + clear the locations so re-runs are
    // idempotent.
    Seq("orders_b", "lineitem_b").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS graft_buck.$t")
      val p = java.nio.file.Paths.get(s"$wh/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator.asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite")
      .bucketBy(BucketCount, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_buck.orders_b")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .write.mode("overwrite")
      .bucketBy(BucketCount, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_buck.lineitem_b")
    bucketTablesFor = (s, dir)
  }

  def q29BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    ensureBucketTables(s, dir)
    // hint("merge"): at test scale AQE would broadcast the small side,
    // hiding the point; the merge hint forces the sort-merge path,
    // which on bucket-aligned sorted tables needs neither exchange
    // nor sort — the plan a 100 TB fact-fact join would use.
    s.table("graft_buck.lineitem_b")
      .join(s.table("graft_buck.orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      // integer-cents sum: order-independent and cross-engine exact at
      // any row count (see q27SaltedAgg)
      .agg(round(sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0, 1).as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  val q29Sql: String =
    """SELECT o_orderpriority,
      |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 1) AS total,
      |  count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q30: semi-structured extraction — typed JSON parsing of the
  // `events.props` column with `from_json` (one parse per row yields
  // every field; schema declared, so the extraction is codegen'd and
  // null-safe on malformed input), feeding a standard partial-agg
  // rollup. At 100 TB this is the canonical log-analytics shape: the
  // JSON never shuffles, only the extracted typed columns do.
  def q30JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, dir)
      .select(col("event_type"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"),
        count(when(col("k") > 50, lit(1))).as("n_high"))
      .orderBy(col("event_type"))
  }

  val q30Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(props->>'k' AS INT)), 4) AS avg_k,
      |  count(*) FILTER (CAST(props->>'k' AS INT) > 50) AS n_high
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q31: calendar densification (gap-fill) — hourly per-type activity
  // with missing hours zero-filled: generate the full hour grid with
  // sequence()+explode, cross the (tiny) grid with the (tiny) type
  // dimension, left-join the aggregated facts back. The standard
  // time-series resample shape: the fact table aggregates first
  // (partial map-side), so the dense grid join touches only
  // #hours × #types rows regardless of event volume.
  def q31GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"), col("value"))
    val hourly = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sv"))
    val grid = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val types = ev.select(col("event_type")).distinct()
    grid.crossJoin(types)
      .join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(coalesce(col("sv"), lit(0.0)), 2).as("sum_value"))
      .orderBy(col("event_type"), col("hour"))
  }

  val q31Sql: String =
    """WITH ev AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, value FROM events),
      |hourly AS (SELECT event_type, h, count(*) AS n_events, sum(value) AS sv
      |  FROM ev GROUP BY event_type, h),
      |grid AS (SELECT unnest(generate_series((SELECT min(h) FROM ev), (SELECT max(h) FROM ev),
      |  INTERVAL 1 HOUR)) AS h),
      |types AS (SELECT DISTINCT event_type FROM ev)
      |SELECT t.event_type,
      |  strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  COALESCE(n_events, 0) AS n_events,
      |  round(COALESCE(sv, 0.0), 2) AS sum_value
      |FROM grid g CROSS JOIN types t
      |LEFT JOIN hourly ON hourly.event_type = t.event_type AND hourly.h = g.h
      |ORDER BY t.event_type, hour""".stripMargin

  // ---------------------------------------------------------------
  // q32: exact grouped percentiles — `percentile()` (the exact
  // sort-based aggregate, vs q25's sketch): p50/p90/p99 of value per
  // event type. Spark's percentile and DuckDB's quantile_cont use the
  // same linear interpolation at rank p·(n-1), so values agree; the
  // exact form costs a per-group sort, which is the documented trade
  // against percentile_approx at scale (q25) — both belong in the
  // library.
  def q32Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"),
        round(percentile(col("value"), lit(0.99)), 4).as("p99"))
      .orderBy(col("event_type"))

  val q32Sql: String =
    """SELECT event_type, count(*) AS n,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.9), 4) AS p90,
      |  round(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q36: SALTED SKEW JOIN — q27's salting applied to a join: when a
  // fact table's join key is pathologically hot (every row here maps
  // to one of 10 keys — the celebrity-user / null-bucket shape), a
  // plain shuffle join lands each hot key on ONE reducer; the 100 TB
  // cure is to replicate the small dimension [[JoinSalt]] ways
  // (explode over the salt range) and salt the fact side with a
  // row-local hash, so the join key becomes (key, salt) and a hot
  // key's rows spread over [[JoinSalt]] reducers. The result is
  // byte-identical to the unsalted join (the oracle), and the
  // post-join aggregate re-merges on the bare key — two-phase, like
  // q27. (AQE's skew-join split is the automatic variant; salting is
  // the explicit form that also works mid-pipeline where AQE can't
  // re-plan, and it composes with the partial-agg pushdown here.)
  private val JoinSalt = 16

  def q36SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = (0L until 10L).map(hk => (hk, s"seg_$hk")).toDF("hk", "segment")
      .withColumn("salt", explode(sequence(lit(0), lit(JoinSalt - 1))))
    val fact = Tables.orders(s, dir).select(
      (col("o_custkey") % 10).as("hk"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      (col("o_orderkey") % JoinSalt).cast("int").as("salt"))
    // shuffle_hash, not broadcast: at test scale Catalyst would
    // broadcast the 160-row dim, which IS the other skew cure but
    // hides the salted exchange this query demonstrates — the real
    // case is a dimension too big to broadcast. The hint stands in
    // for that; the fact side shuffles on (hk, salt), 16 reducers
    // per hot key.
    fact.join(dim.hint("shuffle_hash"), Seq("hk", "salt"))
      .groupBy(col("hk"), col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("hk"))
  }

  val q36Sql: String =
    """WITH f AS (SELECT o_custkey % 10 AS hk,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |dim AS (SELECT unnest(range(10)) AS hk),
      |j AS (SELECT f.hk, 'seg_' || f.hk AS segment, cents FROM f JOIN dim d ON f.hk = d.hk)
      |SELECT hk, segment, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM j GROUP BY hk, segment ORDER BY hk""".stripMargin

  // ---------------------------------------------------------------
  // q37: BLOOM-PREFILTERED SEMI JOIN — the runtime-filter technique
  // for the case salting and broadcast don't cover: the fact table is
  // huge AND the dimension's matching-key set is too big to broadcast
  // as a hash relation, but its Bloom fingerprint fits in a few MB.
  // Build one filter over the dim keys (one pass over the small
  // side), probe it inside the fact scan's WholeStageCodegen span
  // (graft.plans.MightContainLong — a codegen'd native expression,
  // not a UDF), and only the ~matching rows ever reach the exchange;
  // the exact semi join then runs on the survivors, so false
  // positives cost shuffle bytes, never correctness. Spark's own
  // InjectRuntimeFilter plants the same shape automatically when
  // stats allow; the library surface makes it explicit and
  // mid-pipeline-composable. The oracle is the plain semi join.
  private val BloomFpp = 0.001

  def q37BloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.MightContainLong
    MightContainLong.register(s)
    val dim = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    // Sizing pass over the SMALL side only (at scale this number
    // comes from table stats); the build is stat.bloomFilter's
    // distributed aggregate — fact rows are never touched.
    val bloom = dim.stat.bloomFilter("c_custkey", math.max(dim.count(), 1L), BloomFpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    Tables.orders(s, dir)
      .filter(MightContainLong.probe(col("o_custkey"), bytes))
      .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .orderBy(col("o_orderpriority"))
  }

  val q37Sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q38: RANK-FAMILY WINDOW FUNCTIONS — ntile / percent_rank /
  // cume_dist over per-priority price order: the quantile-assignment
  // projection (price quartile per segment, percentile features for
  // training). All three share ONE window spec, so Catalyst plans a
  // single exchange+sort feeding stacked window operators (the
  // temporal_rolling shape). Values are rationals of exact integers
  // — percent_rank = (rank-1)/(n-1), cume_dist = peers≤/n — and the
  // ORDER BY carries an o_orderkey tiebreak so neither engine ever
  // ranks inside a tie.
  def q38WindowRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("pri")).orderBy(col("cents"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy(col("o_orderkey"))
  }

  val q38Sql: String =
    """WITH c AS (SELECT o_orderkey, o_orderpriority AS pri,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |SELECT o_orderkey, pri, cents,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM c WINDOW w AS (PARTITION BY pri ORDER BY cents, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // q40: value-RANGE window frame — the one window frame shape the
  // board didn't exercise: per customer, orders within the TRAILING
  // 90 DAYS of each order (RANGE BETWEEN, value-based — peers at
  // equal dates are IN the frame, unlike ROWS BETWEEN which cuts
  // mid-tie; exactly the "recent activity" feature window a
  // temporal feature store computes). Spark expresses the interval
  // frame as rangeBetween over the epoch-day integer (unix_date) —
  // identical arithmetic to DuckDB's RANGE BETWEEN INTERVAL 90 DAYS
  // on the DATE. One exchange+sort per customer partition; money
  // rides as exact integer cents.
  def q40RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ed"))
      .rangeBetween(-90, 0)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_date(col("o_orderdate").cast("date")).cast("long").as("ed"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("cents_win", sum(col("cents")).over(w))
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(expr("date_add(date '1970-01-01', cast(ed as int))"), "yyyy-MM-dd")
          .as("order_date"),
        col("n_win"), col("cents_win"))
      .orderBy(col("o_orderkey"))
  }

  val q40Sql: String =
    """WITH t AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |SELECT o_orderkey, o_custkey, strftime(d, '%Y-%m-%d') AS order_date,
      |  count(*) OVER w AS n_win,
      |  CAST(sum(cents) OVER w AS BIGINT) AS cents_win
      |FROM t WINDOW w AS (PARTITION BY o_custkey ORDER BY d
      |  RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  // q34: fixed-width histogram — the distribution profile every data
  // audit starts with: o_totalprice binned into $25k buckets with
  // count and exact min/max per bucket. Bucketing is pure integer
  // arithmetic (cents `div` width — no float division anywhere, so
  // boundary values cannot straddle engines), the aggregation is a
  // map-side partial combine to |buckets| rows, and the money column
  // is the only column read (column pruning to 1 field at 100 TB).
  private val HistBucketCents = 2500000L // $25k

  def q34Histogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(expr(s"cents div $HistBucketCents").as("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .select(col("bucket"), (col("bucket") * lit(HistBucketCents / 100)).as("lo_dollars"),
        col("n_orders"), col("min_cents"), col("max_cents"))
      .orderBy(col("bucket"))

  val q34Sql: String =
    s"""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
       |b AS (SELECT cents // $HistBucketCents AS bucket, cents FROM c)
       |SELECT bucket, bucket * ${HistBucketCents / 100} AS lo_dollars, count(*) AS n_orders,
       |  min(cents) AS min_cents, max(cents) AS max_cents
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------
  // q35: exact grouped correlation + regression slope — Pearson corr
  // and OLS beta of extendedprice on quantity per return flag,
  // computed from EXACT integer moments instead of the engines'
  // native streaming `corr` (whose float accumulation is partition-
  // order-dependent — the q27/q29 failure class). x, y are integer
  // units/cents; Σx Σy Σxy Σx² Σy² accumulate as DECIMAL(38,0) in
  // Spark and HUGEINT in DuckDB (both exact and order-free; Σy²
  // overflows BIGINT at sf0.1 already — 6e19 — which is why the
  // sums are NOT longs), and the closed-form corr/beta is then one
  // fixed chain of double ops over exact inputs, identical in both
  // engines. Matches DuckDB's native corr() to 4 dp (verified).
  // Scale shape: map-side partial aggregate to |flags| rows — one
  // tiny exchange, two columns read.
  def q35CorrExact(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val c = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"),
      round(col("l_quantity")).cast("long").as("x"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    val s0 = c.groupBy(col("flag")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"))
    val nD = col("n").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"), col("sy").cast("double"),
      col("sxy").cast("double"), col("sxx").cast("double"), col("syy").cast("double"))
    val num = nD * sxy - sx * sy
    s0.select(col("flag"), col("n"),
        // + 0.0: IEEE -0.0 normalization on sign-capable rounded
        // doubles (r11 ml_corr_pairs lesson) — identical on the
        // oracle side so a near-zero-negative corr can't hash-split
        (round(num / (sqrt(nD * sxx - sx * sx) * sqrt(nD * syy - sy * sy)), 4)
          + lit(0.0)).as("corr_qty_price"),
        (round(num / (nD * sxx - sx * sx) / 100.0, 4) + lit(0.0))
          .as("beta_dollars_per_unit"))
      .orderBy(col("flag"))
  }

  val q35Sql: String =
    """WITH c AS (SELECT l_returnflag AS flag,
      |    CAST(round(l_quantity) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem),
      |s AS (SELECT flag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM c GROUP BY flag)
      |SELECT flag, n,
      |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
      |    (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
      |     sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 4) + 0.0 AS corr_qty_price,
      |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
      |    (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) / 100.0, 4) + 0.0 AS beta_dollars_per_unit
      |FROM s ORDER BY flag""".stripMargin

  // ---------------------------------------------------------------
  // q39: MAP-typed aggregation — the per-entity keyed profile
  // (hour-of-day → event count) materialized as a genuine Spark
  // `MapType` column: two-level aggregate, `map_from_entries` builds
  // the map, `map_entries` → sort → transform renders it canonically
  // (sorted `h:n` pairs) so the DuckDB oracle — which has no
  // equivalent map literal — compares the same logical value as a
  // string. The inner aggregate partial-combines to |types|·24 rows
  // before the one exchange; the map assembly is map-side of a
  // 5-row result. This is the feature-store row shape (entity →
  // keyed feature bag) that array columns can't model when keys are
  // sparse per entity.
  def q39MapAgg(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"))
    hourly
      .groupBy(col("event_type"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("hr"), col("n")))))
        .as("profile"))
      .select(col("event_type"),
        size(col("profile")).cast("long").as("n_hours"),
        concat_ws(",", transform(sort_array(map_entries(col("profile"))),
          e => concat(e.getField("key"), lit(":"), e.getField("value")))).as("hour_profile"))
      .orderBy(col("event_type"))
  }

  val q39Sql: String =
    """WITH h AS (SELECT event_type,
      |    CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr FROM events),
      |c AS (SELECT event_type, hr, count(*) AS n FROM h GROUP BY event_type, hr)
      |SELECT event_type, count(*) AS n_hours,
      |  string_agg(hr || ':' || n, ',' ORDER BY hr) AS hour_profile
      |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q42: VARIANT shredding (Spark 4's semi-structured type) — the
  // open-schema ingestion path every telemetry/JSON lake needs:
  // orders are serialized to nested JSON, parsed into a VARIANT
  // column (`parse_json`), and shredded back out with TYPED path
  // extraction (`variant_get('$.ord.pri', 'string')`, nested cents
  // as bigint), a `try_variant_get` on a missing path (must be NULL,
  // counted), and `schema_of_variant` (gated as the single constant
  // schema string — any type drift in the round-trip changes it).
  // The aggregate must equal the closed form computed DIRECTLY from
  // the relational columns — proving the JSON→VARIANT→typed loop is
  // lossless. At 100 TB this is the columnar-shredding contract:
  // variant_get pushes into the scan where the store supports it.
  def q42VariantShred(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .select(to_json(struct(
        struct(col("o_orderkey").as("key"), col("o_orderpriority").as("pri")).as("ord"),
        struct(round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderstatus").as("st")).as("amt"))).as("j"))
      .select(parse_json(col("j")).as("v"))
      .select(
        expr("variant_get(v, '$.ord.pri', 'string')").as("pri"),
        expr("variant_get(v, '$.amt.cents', 'bigint')").as("cents"),
        expr("variant_get(v, '$.amt.st', 'string')").as("st"),
        expr("try_variant_get(v, '$.amt.discount', 'bigint')").as("missing"),
        expr("schema_of_variant(v)").as("sch"))
      .groupBy(col("pri"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).as("sum_cents"),
        sum(when(col("st") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("missing").isNull, 1L).otherwise(0L)).as("n_miss_null"),
        count_distinct(col("sch")).as("n_schemas"),
        min(col("sch")).as("schema_str"))
      .orderBy(col("pri"))
  }

  val q42Sql: String =
    """SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(count(*) AS BIGINT) AS n_miss_null,
      |  CAST(1 AS BIGINT) AS n_schemas,
      |  'OBJECT<amt: OBJECT<cents: BIGINT, st: STRING>, ord: OBJECT<key: BIGINT, pri: STRING>>' AS schema_str
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q43: LATERAL correlated subquery (Spark 4 lateral join) — the
  // "for each outer row, run this parameterized subquery" shape that
  // declarative SQL pipelines use instead of driver-side loops. Per
  // nation, the lateral computes that nation's customer count,
  // account-balance cents sum, and max — correlated on the OUTER
  // nation key, planned by Spark as a domain join (decorrelated into
  // one distributed aggregate + join, NOT n_nations scans — the scale
  // contract). Nations with no customers keep a zero row via the
  // lateral's aggregate semantics. Oracle: the equivalent grouped
  // join.
  def q43Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir).createOrReplaceTempView("g_q43_nation")
    Tables.customer(s, dir).createOrReplaceTempView("g_q43_customer")
    val out = s.sql(
      """SELECT n.n_name AS nation, l.n_cust, l.bal_cents, l.max_cents
        |FROM g_q43_nation n,
        |LATERAL (
        |  SELECT cast(count(*) as bigint) AS n_cust,
        |    cast(coalesce(sum(cast(round(c_acctbal * 100) as bigint)), 0) as bigint) AS bal_cents,
        |    cast(coalesce(max(cast(round(c_acctbal * 100) as bigint)), 0) as bigint) AS max_cents
        |  FROM g_q43_customer c WHERE c.c_nationkey = n.n_nationkey
        |) l
        |ORDER BY nation""".stripMargin)
    s.catalog.dropTempView("g_q43_nation")
    s.catalog.dropTempView("g_q43_customer")
    out
  }

  val q43Sql: String =
    """SELECT n.n_name AS nation,
      |  CAST(l.n_cust AS BIGINT) AS n_cust, CAST(l.bal_cents AS BIGINT) AS bal_cents,
      |  CAST(l.max_cents AS BIGINT) AS max_cents
      |FROM nation n,
      |LATERAL (
      |  SELECT count(*) AS n_cust,
      |    coalesce(sum(CAST(round(c_acctbal * 100) AS BIGINT)), 0) AS bal_cents,
      |    coalesce(max(CAST(round(c_acctbal * 100) AS BIGINT)), 0) AS max_cents
      |  FROM customer c WHERE c.c_nationkey = n.n_nationkey
      |) l
      |ORDER BY nation""".stripMargin

  // ---------------------------------------------------------------
  // q44: SQL SESSION VARIABLES + EXECUTE IMMEDIATE (Spark 4) — the
  // scripting surface parameterized production SQL runs on: DECLARE
  // a session variable, SET it FROM a scalar subquery over the data
  // (the p90 order-price cents), then run a parameterized statement
  // through EXECUTE IMMEDIATE ... USING, binding the variable as a
  // positional parameter. The gate aggregates orders above the
  // data-derived threshold — wrong variable scoping, stale SET, or
  // mis-bound parameters all break the integers. The p90 is the
  // exact order statistic (ceil-rank over cents, integer arithmetic).
  def q44SqlVariables(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("g_q44_orders")
    s.sql("DECLARE OR REPLACE VARIABLE g_q44_thr BIGINT")
    s.sql(
      """SET VAR g_q44_thr = (
        |  SELECT min(cents) FROM (
        |    SELECT cents, row_number() OVER (ORDER BY cents DESC) AS rn,
        |      count(*) OVER () AS n
        |    FROM (SELECT cast(round(o_totalprice * 100) as bigint) AS cents
        |          FROM g_q44_orders))
        |  WHERE rn <= (n + 9) div 10)""".stripMargin)
    val out = s.sql(
      """EXECUTE IMMEDIATE
        |'SELECT o_orderpriority AS pri, cast(count(*) as bigint) AS n,
        |   cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) AS sum_cents,
        |   cast(? as bigint) AS thr_cents
        | FROM g_q44_orders
        | WHERE cast(round(o_totalprice * 100) as bigint) >= ?
        | GROUP BY 1 ORDER BY 1'
        |USING g_q44_thr, g_q44_thr""".stripMargin)
      .localCheckpoint(true)
    s.sql("DROP TEMPORARY VARIABLE g_q44_thr")
    s.catalog.dropTempView("g_q44_orders")
    out
  }

  val q44Sql: String =
    """WITH c AS (SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |rk AS (SELECT cents, row_number() OVER (ORDER BY cents DESC) AS rn,
      |  count(*) OVER () AS n FROM c),
      |thr AS (SELECT min(cents) AS t FROM rk WHERE rn <= (n + 9) // 10)
      |SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  CAST((SELECT t FROM thr) AS BIGINT) AS thr_cents
      |FROM c WHERE cents >= (SELECT t FROM thr)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q45: COLLATIONS (Spark 4 collated strings) — case-insensitive
  // semantics IN THE TYPE instead of scattered lower() calls: the
  // customer market segment is re-cased per row (upper when the key
  // is even — deterministic), then grouped and distinct-counted
  // UNDER UTF8_LCASE collation. Grouping, equality, and DISTINCT all
  // follow the collation; the emitted group key is min(original)
  // (deterministic representative — the collated group's "value" is
  // otherwise whichever case variant arrived first). Oracle: the
  // lower() rewrite, which UTF8_LCASE equals on this ASCII domain.
  def q45Collation(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("g_q45_customer")
    val out = s.sql(
      """WITH mixed AS (
        |  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
        |              ELSE lower(c_mktsegment) END AS seg_raw,
        |    c_custkey, cast(round(c_acctbal * 100) as bigint) AS cents
        |  FROM g_q45_customer),
        |coll AS (SELECT collate(seg_raw, 'UTF8_LCASE') AS seg, seg_raw, c_custkey, cents
        |  FROM mixed)
        |SELECT min(seg_raw) AS segment, cast(count(*) as bigint) AS n,
        |  cast(count(DISTINCT seg_raw COLLATE UTF8_BINARY) as bigint) AS n_case_variants,
        |  cast(sum(cents) as bigint) AS bal_cents
        |FROM coll GROUP BY seg ORDER BY segment""".stripMargin)
    s.catalog.dropTempView("g_q45_customer")
    out
  }

  val q45Sql: String =
    """WITH mixed AS (
      |  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
      |              ELSE lower(c_mktsegment) END AS seg_raw,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer)
      |SELECT min(seg_raw) AS segment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT seg_raw) AS BIGINT) AS n_case_variants,
      |  CAST(sum(cents) AS BIGINT) AS bal_cents
      |FROM mixed GROUP BY lower(seg_raw) ORDER BY segment""".stripMargin

  // ---------------------------------------------------------------
  // q46: XML shredding (Spark 4 native from_xml) — the other
  // semi-structured ingestion path next to q42's VARIANT: rows are
  // serialized into XML elements (hand-built, attribute + nested
  // element), parsed back with a typed from_xml schema, and the
  // aggregate must equal the relational closed form — a lossless
  // round-trip gate. xpath_long on the same strings cross-checks an
  // independent extraction path inside the engine (both must agree
  // row-by-row or n_xpath_mismatch breaks).
  def q46XmlShred(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      // StAX parsing is the per-row cost here (~2 parses/row): widen
      // off the single-file scan's ~3 partitions before the kernel
      // (the CLAUDE.md repartition-before-CPU-bound rule)
      .repartition(s.sparkContext.defaultParallelism, col("o_orderkey"))
      .select(col("o_orderpriority").as("pri"),
        concat(lit("<o><k>"), col("o_orderkey"), lit("</k><c>"),
          round(col("o_totalprice") * 100).cast("long"), lit("</c><s>"),
          col("o_orderstatus"), lit("</s></o>")).as("x"))
      .select(col("pri"), col("x"),
        expr("from_xml(x, 'k BIGINT, c BIGINT, s STRING')").as("p"))
      // independent cross-check of the shredded <c> field against the
      // raw markup. This was xpath_long('/o/c') until r18: JAXP
      // evaluates each call by DOM-parsing the row and building a
      // fresh DTMManager + XPathContext (sampler: ~85% of the query's
      // 360s of 32-thread CPU at sf0.1 sat in XPathImplUtil.eval /
      // DTMManagerDefault.<init> / DOMParser.<init>; the from_xml
      // StAX parse was <5%). Per-row xpath cannot survive any scale;
      // the codegen'd regexp extraction is the same independent
      // "does the shred match the literal markup" assertion at ~zero
      // cost, and from_xml remains the demonstrated XML-shred path.
      .select(col("pri"),
        col("p.k").as("k"), col("p.c").as("cents"), col("p.s").as("st"),
        regexp_extract(col("x"), "<c>(-?\\d+)</c>", 1).cast("long").as("cents_xpath"))
      .groupBy(col("pri"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).as("sum_cents"),
        sum(when(col("st") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("cents") =!= col("cents_xpath"), 1L).otherwise(0L))
          .as("n_xpath_mismatch"))
      .orderBy(col("pri"))
  }

  val q46Sql: String =
    """SELECT o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |  CAST(0 AS BIGINT) AS n_xpath_mismatch
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_variant_shred" -> (q42VariantShred _),
    "q43_lateral" -> (q43Lateral _),
    "q44_sql_variables" -> (q44SqlVariables _),
    "q45_collation" -> (q45Collation _),
    "q46_xml_shred" -> (q46XmlShred _),
    "q41_recursive_cte" -> (q41RecursiveCte _),
    "q39_map_agg" -> (q39MapAgg _),
    "q34_histogram" -> (q34Histogram _),
    "q35_corr_exact" -> (q35CorrExact _),
    "q36_salted_join" -> (q36SaltedJoin _),
    "q37_bloom_semi_join" -> (q37BloomSemiJoin _),
    "q38_window_ranks" -> (q38WindowRanks _),
    "q32_percentiles" -> (q32Percentiles _),
    "q31_gapfill" -> (q31GapFill _),
    "q30_json_extract" -> (q30JsonExtract _),
    "q20_full_outer" -> (q20FullOuter _),
    "q21_range_join" -> (q21RangeJoin _),
    "q22_pivot" -> (q22Pivot _),
    "q33_unpivot" -> (q33Unpivot _),
    "q40_range_frame" -> (q40RangeFrame _),
    "q23_grouping_sets" -> (q23GroupingSets _),
    "q24_explode_words" -> (q24ExplodeWords _),
    "q25_sketches" -> (q25Sketches _),
    "q26_topk_agg" -> (q26TopkAgg _),
    "q27_salted_agg" -> (q27SaltedAgg _),
    "q29_bucketed_join" -> (q29BucketedJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q42_variant_shred" -> q42Sql,
    "q43_lateral" -> q43Sql,
    "q44_sql_variables" -> q44Sql,
    "q45_collation" -> q45Sql,
    "q46_xml_shred" -> q46Sql,
    "q41_recursive_cte" -> q41Sql,
    "q40_range_frame" -> q40Sql,
    "q34_histogram" -> q34Sql,
    "q35_corr_exact" -> q35Sql,
    "q36_salted_join" -> q36Sql,
    "q37_bloom_semi_join" -> q37Sql,
    "q39_map_agg" -> q39Sql,
    "q38_window_ranks" -> q38Sql,
    "q32_percentiles" -> q32Sql,
    "q31_gapfill" -> q31Sql,
    "q30_json_extract" -> q30Sql,
    "q20_full_outer" -> q20Sql,
    "q21_range_join" -> q21Sql,
    "q22_pivot" -> q22Sql,
    "q33_unpivot" -> q33Sql,
    "q23_grouping_sets" -> q23Sql,
    "q24_explode_words" -> q24Sql,
    "q25_sketches" -> q25Sql,
    "q26_topk_agg" -> q26Sql,
    "q27_salted_agg" -> q27Sql,
    "q29_bucketed_join" -> q29Sql,
  )
}
