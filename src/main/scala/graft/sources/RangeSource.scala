package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A from-scratch DataSource V2 table — the pattern every custom
  * 100 TB source (internal log store, feature store, object-store
  * manifest) follows, demonstrated end-to-end with the three
  * capabilities that make scans cheap at scale:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): id-range
  *    predicates clip the generated range at PLANNING time; accepted
  *    filters are honored exactly by the readers, so Spark drops its
  *    own re-filter for them.
  *  - **Partition pruning**: input partitions are planned on a fixed
  *    slice grid of the UNFILTERED range; slices that fall outside
  *    the pushed id bounds are never planned — the DSv2 equivalent of
  *    skipping parquet row-groups by min/max. The scan description
  *    carries `slices=planned/total` so plans (and specs) can assert
  *    the prune happened.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]):
  *    readers materialize only the requested fields, in the requested
  *    order — a projection never pays for unread columns.
  *
  * The table itself is synthetic — rows (id, bucket = id % 16,
  * val = id·2654435761 mod 1e6, the Knuth multiplicative hash mixed
  * into a bounded value) over [start, end) — so the DuckDB oracle
  * regenerates it exactly from `range()`, and the gate checks the
  * whole pushdown/prune/generate loop value-for-value.
  */
class RangeTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RangeTable.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    def req(key: String): Long = Option(properties.get(key)) match {
      case Some(v) => v.toLong
      case None => throw new IllegalArgumentException(
        s"graft_range source requires option '$key' (got: start/end)")
    }
    val clustered = Option(properties.get("clusterBy")) match {
      case None => false
      case Some("bucket") =>
        require(req("start") >= 0,
          "clusterBy=bucket requires start >= 0: bucketOf uses the JVM's " +
            "sign-following %, so negative ids live in buckets -15..-1 and " +
            "the per-bucket progression enumeration would mislabel them")
        true
      case Some(other) => throw new IllegalArgumentException(
        s"graft_range clusterBy supports only 'bucket', got '$other'")
    }
    new RangeTable(req("start"), req("end"),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8),
      Option(properties.get("batchRows")).map(_.toLong).getOrElse(25000L),
      clustered,
      Option(properties.get("reportStats")).exists(_.toBoolean))
  }
}

object RangeTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("val", LongType, nullable = false)))

  val Buckets = 16L
  val Mixer = 2654435761L // Knuth's multiplicative hash constant
  val ValMod = 1000000L

  def bucketOf(id: Long): Long = id % Buckets
  def valOf(id: Long): Long = (id * Mixer) % ValMod

  /** Spec evidence channel for runtime filtering: the slice count the
    * scan planned AFTER a runtime `In(id, …)` filter arrived (−1 when
    * no runtime-filtered plan has run). Static pushdown is asserted
    * through the plan text; runtime pruning happens after planning,
    * so the spec reads this instead. */
  val runtimePlanned = new java.util.concurrent.atomic.AtomicInteger(-1)
}

class RangeTable(start: Long, end: Long, slices: Int, batchRows: Long = 25000L,
    clusteredByBucket: Boolean = false, reportStats: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name: String = s"graft_range($start,$end)"
  override def schema: StructType = RangeTable.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, slices, batchRows, clusteredByBucket, reportStats)

  // declared table partitioning (clusterBy=bucket): what lets Spark's
  // storage-partitioned-join machinery treat two such tables as
  // co-clustered without a shuffle — the DSv2 analogue of Hive/Iceberg
  // bucketed tables
  override def partitioning(): Array[Transform] =
    if (clusteredByBucket) Array(Expressions.identity("bucket")) else Array.empty

  // the DSv2 analogue of the file source's `_metadata` column: the
  // row's ORIGINAL planning-grid slice index, resolvable only when a
  // query references it (hidden from SELECT *), served by the reader
  // from its partition — zero cost when unused
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = Array(
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name: String = "_slice"
      override def dataType: org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment: String =
        "original planning-grid slice index of the row's partition"
    })
}

/** Offset for [[RangeMicroBatchStream]]: the exclusive upper id the
  * stream has made available. JSON = the bare long. */
case class RangePos(pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

/** A from-scratch DSv2 MICRO-BATCH STREAM over the same id grid the
  * batch scan reads — the custom-streaming-source pattern (a change
  * feed, a log cursor, a queue shard): `latestOffset` advances the
  * cursor by `batchRows` ids per trigger until the grid is exhausted,
  * `planInputPartitions(start, end)` hands the offset window to the
  * SAME slice/reader machinery as the batch side (one reader
  * implementation, two execution modes), and offsets are durable
  * longs so a checkpointed restart resumes mid-grid. Deterministic by
  * construction: trigger k makes ids [start + k·batchRows,
  * start + (k+1)·batchRows) available, so the batch schedule itself
  * is oracle-reconstructible (the stream_rate_eos discipline). */
class RangeMicroBatchStream(
    start: Long, end: Long, slices: Int, batchRows: Long,
    fields: Array[String] = RangeTable.schema.fieldNames)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private var available: Long = start

  override def initialOffset(): Offset = RangePos(start)

  override def latestOffset(): Offset = {
    available = math.min(end, available + batchRows)
    RangePos(available)
  }

  // -- admission control (SupportsAdmissionControl): the engine-side
  // rate-limiting contract. When implemented, Spark calls
  // latestOffset(start, limit) INSTEAD of the legacy cursor above —
  // the source declares its default pace (maxRows = batchRows, the
  // same schedule the legacy path produced, so checkpoint histories
  // replay identically) and admits from the PASSED offset, stateless:
  // exactly what lets a 100 TB backlog drain in bounded batches
  // instead of one giant catch-up batch after downtime.
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)

  private def rowsOf(limit: ReadLimit): Long = limit match {
    case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => m.maxRows()
    case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable => Long.MaxValue
    case m: org.apache.spark.sql.connector.read.streaming.ReadMinRows =>
      // a dense generated grid always has the backlog: admit the pace
      math.max(m.minRows(), batchRows)
    case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
      c.getReadLimits.map(rowsOf).min // the tightest bound wins
    case _ => batchRows
  }

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val from = startOffset.asInstanceOf[RangePos].pos
    val n = rowsOf(limit)
    val admitted = if (n == Long.MaxValue) end else math.min(end, from + n)
    available = math.max(available, admitted)
    RangePos(admitted)
  }

  /** The TRUE latest (grid end) — what progress reporting and the
    * AvailableNow wrapper use as the drain target, independent of the
    * admission pace. */
  override def reportLatestOffset(): Offset = RangePos(end)

  // The cursor is in-memory; a checkpointed RESTART re-creates this
  // stream and replays the committed offset through deserializeOffset
  // before asking for latestOffset. Track the high-water mark here so
  // the cursor resumes FROM the restored position — otherwise
  // latestOffset would regress below the commit and re-plan id
  // windows already processed (double-counting in stateful aggs).
  override def deserializeOffset(json: String): Offset = {
    val pos = json.toLong
    available = math.max(available, pos)
    RangePos(pos)
  }

  override def planInputPartitions(s0: Offset, e0: Offset): Array[InputPartition] = {
    val (lo, hi) = (s0.asInstanceOf[RangePos].pos, e0.asInstanceOf[RangePos].pos)
    // slice the offset window like the batch scan slices the grid —
    // a micro-batch is read with the same parallelism discipline
    val step = math.max(1L, (hi - lo + slices - 1) / slices)
    (0 until slices).flatMap { k =>
      val a = lo + k * step
      val b = math.min(hi, a + step)
      if (a < b) Some(RangePartition(a, b, k.toLong): InputPartition) else None
    }.toArray
  }

  // the scan's PRUNED field list, mirroring the batch path — today
  // streaming never calls pruneColumns so this equals the full
  // schema, but if a Spark upgrade adds streaming column pruning the
  // reader must produce exactly readSchema()'s fields in order
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(fields)

  override def commit(off: Offset): Unit = ()
  override def stop(): Unit = ()
}

class RangeScanBuilder(start: Long, end: Long, slices: Int, batchRows: Long = 25000L,
    clusteredByBucket: Boolean = false, reportStats: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo = start
  private var hi = end
  private var accepted = Array.empty[Filter]
  private var required = RangeTable.schema
  private var pushedAggs: Option[Seq[aggregate.AggregateFunc]] = None
  private var pushedLimit: Option[Long] = None
  private var topNDesc = false

  private def longOf(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue)
    case _ => None
  }

  // Saturating +1: `GreaterThan("id", Long.MaxValue)` /
  // `LessThanOrEqual("id", Long.MaxValue)` would otherwise wrap to
  // Long.MinValue — an empty scan for an accept-everything predicate,
  // and SILENTLY wrong because the filter was reported accepted (so
  // Spark drops its own re-filter). Saturation over-includes by at
  // most the one unrepresentable bound, which the exact reader range
  // [start, end) can never contain anyway.
  private def incSat(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val rest = filters.filter {
      case GreaterThan("id", v) if longOf(v).isDefined =>
        lo = math.max(lo, incSat(longOf(v).get)); false
      case GreaterThanOrEqual("id", v) if longOf(v).isDefined =>
        lo = math.max(lo, longOf(v).get); false
      case LessThan("id", v) if longOf(v).isDefined =>
        hi = math.min(hi, longOf(v).get); false
      case LessThanOrEqual("id", v) if longOf(v).isDefined =>
        hi = math.min(hi, incSat(longOf(v).get)); false
      case EqualTo("id", v) if longOf(v).isDefined =>
        lo = math.max(lo, longOf(v).get); hi = math.min(hi, incSat(longOf(v).get)); false
      case _ => true // not handled here; Spark keeps its own Filter for these
    }
    accepted = filters.diff(rest)
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // -- aggregate pushdown -------------------------------------------
  // COUNT(*) / MIN(id) / MAX(id) with no GROUP BY are pure functions
  // of the (already filter-clipped) [lo, hi) bounds, so the source
  // answers them at PLANNING time — the scan ships ONE row instead
  // of the range, the DSv2 analogue of parquet footer statistics.
  // supportCompletePushDown returns true, so Spark plans NO aggregate
  // node above the scan at all (plan-asserted in ExtensionSpec).
  private def isIdColumn(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
        nr.fieldNames.sameElements(Array("id"))
      case _ => false
    }

  private def isBucketColumn(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
        nr.fieldNames.sameElements(Array("bucket"))
      case _ => false
    }

  private var groupByBucket = false

  // GROUP BY is pushable only on `bucket` (= id % 16): per-bucket
  // count/min/max over a contiguous id range are closed-form integer
  // arithmetic, so the source emits ONE ROW PER GROUP — complete
  // pushdown even with grouping. Grouped pushdown additionally
  // requires a NON-NEGATIVE clipped range: bucketOf uses the JVM's
  // sign-following %, so negative ids live in buckets -15..-1 which
  // the floorMod closed form would silently misreport — fall back to
  // the row-producing scan there (filters push before aggregates, so
  // `lo` is final when this runs).
  private def canPushAgg(a: aggregate.Aggregation): Boolean =
    (a.groupByExpressions.isEmpty ||
      (a.groupByExpressions.length == 1 && isBucketColumn(a.groupByExpressions.head)
        && lo >= 0)) &&
      a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case _: aggregate.CountStar => true
        case m: aggregate.Min => isIdColumn(m.column)
        case m: aggregate.Max => isIdColumn(m.column)
        case _ => false
      }

  override def supportCompletePushDown(a: aggregate.Aggregation): Boolean = canPushAgg(a)

  override def pushAggregation(a: aggregate.Aggregation): Boolean =
    if (canPushAgg(a)) {
      pushedAggs = Some(a.aggregateExpressions.toSeq)
      groupByBucket = a.groupByExpressions.nonEmpty
      true
    } else false

  // -- LIMIT / top-N pushdown ---------------------------------------
  // On a DENSE generated range the first n rows of the (already
  // filter-clipped) scan are a closed-form sub-range: LIMIT n clips
  // hi to lo+n; ORDER BY id {ASC|DESC} LIMIT n clips to the low/high
  // n ids. Filters push before limits (V2ScanRelationPushDown), so
  // lo/hi are final here. We report PARTIAL pushdown (the default) —
  // Spark keeps its own Limit/Sort above the scan for correctness,
  // but the scan now reads ≤ n rows instead of the range, and
  // fully-clipped slices are never planned. The 100 TB analogue:
  // LIMIT against a sorted manifest touches one file, not the table.
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit.toLong)
    true
  }

  // partial pushdown: Spark keeps its Sort/Limit; the scan just
  // reads ≤ n rows (disambiguates the two traits' default method)
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    val ok = orders.length == 1 && isIdColumn(orders.head.expression())
    if (ok) {
      pushedLimit = Some(limit.toLong)
      topNDesc = orders.head.direction() == SortDirection.DESCENDING
    }
    ok
  }

  override def build(): Scan = pushedAggs match {
    case Some(aggs) => new RangeAggScan(lo, hi, aggs, groupByBucket)
    case None =>
      val (clo, chi) = pushedLimit match {
        case Some(n) if lo < hi && hi - lo > n => // n rows suffice
          if (topNDesc) (hi - n, hi) else (lo, lo + n)
        case _ => (lo, hi)
      }
      if (clusteredByBucket)
        new RangeBucketedScan(clo, chi, required, slices, batchRows)
      else
        new RangeScan(start, end, slices, clo, chi, required, pushedLimit, topNDesc, batchRows,
          reportStats)
  }
}

/** The CLUSTERED scan (clusterBy=bucket): one input partition per
  * non-empty bucket of the (filter-clipped) id range, each declaring
  * its key through [[HasPartitionKey]], with the scan reporting
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * over `identity(bucket)` — the full DSv2 storage-partitioned-join
  * contract. With `spark.sql.sources.v2.bucketing.enabled=true`,
  * a join (or aggregate) keyed on `bucket` over two such scans plans
  * with NO shuffle exchange on either side: Spark aligns the
  * co-clustered partitions directly, the way Iceberg/Hive bucketed
  * tables join at 100 TB without moving data. Each reader walks its
  * bucket's arithmetic progression (first id ≡ b (mod 16) in
  * [lo, hi), step 16) — exact enumeration, no row filtering. */
class RangeBucketedScan(
    lo: Long, hi: Long, required: StructType, slices: Int, batchRows: Long)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // streaming reads of a clustered table fall back to the plain
  // offset-window stream (bucket grouping is a batch-planning notion)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, slices, batchRows, required.fieldNames)

  private def buckets: Seq[(Long, Long, Long)] = // (bucket, first, last)
    (0L until RangeTable.Buckets).flatMap { b =>
      if (lo >= hi) None
      else {
        val first = lo + ((b - lo) % RangeTable.Buckets + RangeTable.Buckets) % RangeTable.Buckets
        if (first >= hi) None
        else Some((b, first, first + ((hi - 1 - first) / RangeTable.Buckets) * RangeTable.Buckets))
      }
    }

  override def description(): String =
    s"GraftRangeBucketedScan[$lo,$hi) buckets=${buckets.size}/${RangeTable.Buckets} " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val n = buckets.size
    if (n == 0)
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    else
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(Expressions.identity("bucket")), n)
  }

  override def planInputPartitions(): Array[InputPartition] =
    buckets.map { case (b, first, last) =>
      RangeBucketPartition(b, first, last): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeBucketReaderFactory(required.fieldNames)
}

/** One bucket's rows: the arithmetic progression first..last step 16.
  * `partitionKey` is what Spark groups and aligns partitions by. */
case class RangeBucketPartition(bucket: Long, first: Long, last: Long)
    extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class RangeBucketReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeBucketPartition]
    new PartitionReader[InternalRow] {
      private var id = p.first - RangeTable.Buckets
      override def next(): Boolean = { id += RangeTable.Buckets; id <= p.last }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "id" => id
          case "bucket" => p.bucket
          case "val" => RangeTable.valOf(id)
          case "_slice" => -1L // not a grid slice; metadata col is grid-scan-only
        })
      override def close(): Unit = ()
    }
  }
}

/** The aggregate-pushed scan: one partition; one row (no grouping) or
  * one row per non-empty bucket (GROUP BY bucket), all values in
  * closed form from the clipped bounds — count = hi−lo, min = lo,
  * max = hi−1 globally; per bucket b, the members of [lo, hi) with
  * id ≡ b (mod 16) are an arithmetic progression whose first/last/
  * cardinality are exact integer expressions. NULL min/max on an
  * empty range, matching SQL aggregate semantics. */
class RangeAggScan(
    lo: Long, hi: Long, aggs: Seq[aggregate.AggregateFunc], groupByBucket: Boolean)
    extends Scan with Batch {

  private def aggFields: Seq[StructField] = aggs.map {
    case _: aggregate.CountStar => StructField("count_star", LongType, nullable = false)
    case _: aggregate.Min => StructField("min_id", LongType, nullable = true)
    case _: aggregate.Max => StructField("max_id", LongType, nullable = true)
    case f => throw new IllegalStateException(s"unpushable aggregate survived: $f")
  }

  override def readSchema(): StructType = StructType(
    (if (groupByBucket) Seq(StructField("bucket", LongType, nullable = false)) else Nil)
      ++ aggFields)

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftRangeScan[$lo,$hi) agg=${aggs.map(_.toString).mkString(",")}" +
      (if (groupByBucket) " groupBy=bucket" else "") + " complete"

  override def planInputPartitions(): Array[InputPartition] =
    Array(RangePartition(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeAggReaderFactory(aggs.map {
      case _: aggregate.CountStar => "count"
      case _: aggregate.Min => "min"
      case _: aggregate.Max => "max"
    }, groupByBucket)
}

class RangeAggReaderFactory(kinds: Seq[String], groupByBucket: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    // (bucket or -1, count, min, max) rows; empty groups are absent
    // (SQL GROUP BY semantics), the global row survives with NULLs
    val groups: Seq[(Long, Long, Any, Any)] =
      if (!groupByBucket) {
        val n = math.max(0L, p.hi - p.lo)
        Seq((-1L, n, if (n > 0) p.lo else null, if (n > 0) p.hi - 1 else null))
      } else (0L until RangeTable.Buckets).flatMap { b =>
        if (p.lo >= p.hi) None
        else {
          // first id >= lo with id % Buckets == b (ids non-negative)
          val first = p.lo + ((b - p.lo) % RangeTable.Buckets + RangeTable.Buckets) % RangeTable.Buckets
          if (first >= p.hi) None
          else {
            val last = first + ((p.hi - 1 - first) / RangeTable.Buckets) * RangeTable.Buckets
            Some((b, (last - first) / RangeTable.Buckets + 1, first, last))
          }
        }
      }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < groups.length }
      override def get(): InternalRow = {
        val (b, n, mn, mx) = groups(i)
        val aggVals = kinds.map {
          case "count" => n
          case "min" => mn
          case "max" => mx
        }
        InternalRow.fromSeq(if (groupByBucket) b +: aggVals else aggVals)
      }
      override def close(): Unit = ()
    }
  }
}

class RangeScan(
    start: Long, end: Long, slices: Int,
    lo: Long, hi: Long, required: StructType,
    pushedLimit: Option[Long] = None, topNDesc: Boolean = false,
    batchRows: Long = 25000L, reportStats: Boolean = false)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics {

  override def readSchema(): StructType = required

  // -- statistics (SupportsReportStatistics, opt-in via reportStats):
  // reported AFTER pushdown, so the planner costs the CLIPPED range —
  // a manifest-bounded scan under the broadcast threshold auto-plans
  // BroadcastHashJoin with no hint, the way parquet footer stats let
  // Catalyst pick sides at 100 TB. Off by default: the statistics-less
  // default (defaultSizeInBytes = huge) is itself load-bearing for the
  // queries that pin their own sides. 8 bytes per required column per
  // row — exact for this all-long schema.
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    override def numRows(): java.util.OptionalLong =
      if (reportStats) java.util.OptionalLong.of(rows) else java.util.OptionalLong.empty()
    override def sizeInBytes(): java.util.OptionalLong =
      if (reportStats)
        java.util.OptionalLong.of(rows * 8L * math.max(1, required.fields.length))
      else java.util.OptionalLong.empty()
  }
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, slices, batchRows, required.fieldNames)

  private def step: Long = math.max(1L, (end - start + slices - 1) / slices)

  // -- runtime filtering (the DSv2 analogue of dynamic partition
  // pruning): at execution, after the join's build side materializes,
  // Spark hands the scan the build-side join keys as an In(id, …)
  // filter; slices containing none of them are dropped before any
  // reader is created. Sorted + binary-searched so the membership
  // test per slice is O(log n) regardless of key count.
  private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = {
    runtimeIds = filters.collectFirst {
      case org.apache.spark.sql.sources.In("id", vs) if vs != null =>
        vs.filter(_ != null).map(_.asInstanceOf[Number].longValue).sorted
      case EqualTo("id", v: Number) => Array(v.longValue)
    }
  }

  private def anyIdIn(sorted: Array[Long], a: Long, b: Long): Boolean = {
    val i = java.util.Arrays.binarySearch(sorted, a)
    val first = if (i >= 0) i else -i - 1
    first < sorted.length && sorted(first) < b
  }

  /** Slices of the ORIGINAL [start, end) grid clipped to the pushed
    * bounds; fully-clipped slices are pruned (never planned), and a
    * runtime In-filter additionally drops slices holding none of the
    * probe keys. */
  private def planned: Seq[(Long, Long, Long)] =
    (0 until slices).flatMap { k =>
      val ps = start + k * step
      val pe = math.min(end, ps + step)
      val (clo, chi) = (math.max(ps, lo), math.min(pe, hi))
      if (clo < chi && runtimeIds.forall(anyIdIn(_, clo, chi))) Some((clo, chi, k.toLong))
      else None
    }

  override def description(): String =
    s"GraftRangeScan[$lo,$hi) slices=${planned.size}/$slices cols=${required.fieldNames.mkString(",")}" +
      pushedLimit.map(n => s" limit=$n${if (topNDesc) " desc" else ""}").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    if (runtimeIds.isDefined) RangeTable.runtimePlanned.set(planned.size)
    planned.map { case (a, b, k) => RangePartition(a, b, k): InputPartition }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)
}

/** `slice` is the ORIGINAL planning-grid index (stable under filter
  * clipping and runtime pruning) — surfaced as the `_slice` metadata
  * column. -1 for non-grid partitions (aggregate pushdown rows). */
case class RangePartition(lo: Long, hi: Long, slice: Long = -1L) extends InputPartition

class RangeReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var id = p.lo - 1
      override def next(): Boolean = { id += 1; id < p.hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "id" => id
          case "bucket" => RangeTable.bucketOf(id)
          case "val" => RangeTable.valOf(id)
          case "_slice" => p.slice
        })
      override def close(): Unit = ()
    }
  }
}
