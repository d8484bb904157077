package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table-maintenance operators — the ops layer a 100 TB pipeline needs
  * around the query engine. The reference has none of this (its sinks
  * are streams, SURVEY.md §2.2 K1-K4); at scale the dominant ops
  * problem is small files: every incremental load/session write leaves
  * thousands of sub-row-group parquet files, and scan throughput dies
  * on open/footer overhead long before bytes matter.
  *
  * [[qCompact]] demonstrates the compaction pass end-to-end and gates
  * it: fragment a copy of `orders` into [[FragmentFiles]] deliberately
  * tiny files, then rewrite targeting [[TargetFileBytes]] per file —
  * the standard bin-pack maintenance job (Delta OPTIMIZE / Iceberg
  * rewrite_data_files do exactly this). File-count math comes from the
  * real listed sizes, the rewrite is a plain `repartition(target)`
  * (round-robin: compaction must balance bytes, not cluster keys),
  * and the gate checks rows survived and the file count collapsed.
  */
object Maintenance {

  private val FragmentFiles = 64
  private val TargetFileBytes = 32L * 1024 * 1024

  def qCompact(s: SparkSession, dir: String): DataFrame = {
    val base = "/tmp/graft_warehouse/compact"
    val fragPath = s"$base/orders_frag"
    val outPath = s"$base/orders_compacted"
    val fs = new Path(base).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(base), true)

    // 1. simulate the small-files problem: 64 tiny parquet files.
    Tables.orders(s, dir).repartition(FragmentFiles)
      .write.mode("overwrite").parquet(fragPath)

    // 2. plan the compaction from listed file metadata (driver-side
    //    listing of file STATUS, not data): total bytes / target.
    def dataFiles(p: String) =
      fs.listStatus(new Path(p)).filter(f => f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(fragPath)
    val nTarget = math.max(1, math.ceil(before.map(_.getLen).sum.toDouble / TargetFileBytes).toInt)

    // 3. rewrite: round-robin repartition to the target file count.
    val frag = s.read.parquet(fragPath)
    frag.repartition(nTarget).write.mode("overwrite").parquet(outPath)

    // 4. gate: rows preserved, file count collapsed to the plan.
    val after = dataFiles(outPath)
    val nRows = s.read.parquet(outPath).count()
    import s.implicits._
    Seq((nRows, FragmentFiles, (after.length == nTarget) && (after.length < before.length)))
      .toDF("n_rows", "files_before", "compacted_ok")
  }

  /** Rows must match the source table; the structural facts are stated
    * as invariants (the oracle cannot see the filesystem). */
  val qCompactSql: String =
    s"""SELECT count(*) AS n_rows, $FragmentFiles AS files_before, TRUE AS compacted_ok
       |FROM orders""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "maint_compact" -> (qCompact _))

  val oracles: Map[String, String] = Map(
    "maint_compact" -> qCompactSql)
}
