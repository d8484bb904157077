package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.{SparkEntry, SparkSpec}

/** Board-wide sweep (r15 verdict item 5): every UNPARTITIONED window
  * — `Window.orderBy` with no `partitionBy`, the plan Spark warns
  * about with "No Partition Defined ... moving all data to a single
  * partition" — must consume a PROVEN-BOUNDED frame. The repo rule
  * (CLAUDE.md) requires a value-domain or top-K bound in the
  * operator's Scaladoc; this spec turns the bench tail's warning
  * noise into a checked invariant: the set of queries that plan a
  * global window is enumerated here WITH its justification, and any
  * new query that sneaks a corpus-sized global sort into the board
  * fails the suite instead of scrolling past as one more warning.
  *
  * Mechanics: a QueryExecutionListener records WindowExec nodes with
  * empty partitionSpec from every plan executed while a query is
  * CONSTRUCTED (eager localCheckpoints / collects — where most
  * metadata windows run), and the final lazy plan is swept directly.
  * Streaming queries run their full bounded streams during
  * construction, so their staging windows are captured too.
  */
class WindowBoundsSpec extends SparkSpec {

  /** query -> why its global window is bounded (the Scaladoc bound,
    * compressed). Every entry is |domain|-bounded METADATA, never a
    * frame whose row count grows with the corpus — except the
    * explicitly-flagged streaming STAGING windows, which order the
    * whole (test-scale) events table to cut time-contiguous files
    * for the file-source harness: that sort is gate scaffolding, not
    * the operator's plan (production streams arrive time-ordered
    * from the transport; the operator under test never plans it). */
  private val allowed: Map[String, String] = Map(
    // -- metadata frames: value-domain / top-K / |config| bounded
    //    (each bound is stated and argued in the operator's Scaladoc
    //    at the cited site; this list is the checked index of them) --
    "maint_salted_from_stats" -> "windows over the |hot keys| stats frame (count-of-counts bounded)",
    "maint_skew_report" -> "count-of-counts histogram, bounded by distinct per-key counts",
    "ml_bootstrap_ci" -> "<=32-row resample summary frame (accumulator partials)",
    "ml_gains_table" -> "|deciles| = 10 rows",
    "ml_isotonic_calibration" -> "PAV minimax on value-domain-bounded bin TRIPLES",
    "ml_ks_test" -> "score value domain <= ~49k (clipped to located range)",
    "ml_perceptron_step" -> "64-group global misclassified count (fixed feature groups)",
    "ml_power_iteration" -> "64-row component frame (max-normalization windows)",
    "ml_roc_hull" -> "<=~100-row hull frame (bin-boundary points)",
    "ml_stump_train" -> "|features| = 2 rows (global winner flag)",
    "ml_youden_threshold" -> "score-bin boundary table (value-domain bounded)",
    "pipe_curriculum" -> "length histogram, count-of-counts bounded",
    "pipe_pareto_frontier" -> "|distinct w| rows (max-doc-metric cardinality)",
    "pipe_source_gini" -> "|sources| rows",
    "pipe_waterfill_budget" -> "|sources| boundary-rank frame",
    "pipeline_shuffle" -> "16-row shard-offset table (sharded rank + offset compose)",
    "samp_neyman_alloc" -> "|strata| rows (largest-remainder ranks)",
    "samp_temperature" -> "|sources| weight frame",
    "sim_mrr_at10" -> "<=11-row rank histogram (per-probe ranks are partitioned)",
    "sketch_quantile" -> "exact tier clipped to broadcast hit-bins, window partitioned by bin",
    "temporal_hazard_curve" -> "duration grid <= observation-window hours",
    "text_bpe_merge_step" -> "top-pair argmax over the vocab-bounded pair table",
    "text_zipf_ratio" -> "top-K word types (rank-capped K-row frame)",
    // -- streaming STAGING (harness, not operator plan): orders the
    //    test events table once to cut time-contiguous files for the
    //    file-source schedule; production streams arrive time-ordered
    //    from the transport, the operator under test never plans it --
    "stream_rate_eos" -> "staging ntile over test events (streamProgress harness)"
  )

  test("unpartitioned windows: enumerated, justified, no corpus-sized strays") {
    val hits = mutable.Map[String, mutable.Set[String]]()
    @volatile var current: String = "<none>"
    // detect on the LOGICAL plan: under AQE (on by default in
    // Spark 4) the physical tree hides inside AdaptiveSparkPlanExec,
    // which a plain executedPlan.collect does not descend into (the
    // CLAUDE.md plan-inspection rule); the logical Window node with
    // an empty partitionSpec is exactly what plans the warned-about
    // single-partition WindowExec
    def globalWindows(qe: QueryExecution): Seq[String] =
      try {
        qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.name).mkString("|")
        }
      } catch { case _: Throwable => Seq.empty }
    def record(qe: QueryExecution): Unit = {
      val globals = globalWindows(qe)
      if (globals.nonEmpty)
        hits.synchronized {
          hits.getOrElseUpdate(current, mutable.Set[String]()) ++= globals
        }
    }
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        record(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        record(qe)
    }
    spark.listenerManager.register(listener)
    val failedBuilds = mutable.Map[String, String]()
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        current = name
        try {
          val df = fn(spark, sfDir)
          // the lazy remainder of the plan (never executed here)
          val lazyGlobals = globalWindows(df.queryExecution)
          if (lazyGlobals.nonEmpty)
            hits.synchronized {
              hits.getOrElseUpdate(name, mutable.Set[String]()) ++= lazyGlobals
            }
        } catch {
          case t: Throwable => failedBuilds(name) = t.toString.take(200)
        }
      }
      // the listener posts asynchronously; give the bus time to drain
      // (listenerBus.waitUntilEmpty is private[spark]); the final
      // Thread.sleep is bounded and only risks under-collection,
      // which the stray check would surface as a later flake, not a
      // false pass of a real stray
      Thread.sleep(2000)
    } finally spark.listenerManager.unregister(listener)
    assert(failedBuilds.isEmpty, s"queries failed to build: $failedBuilds")
    val found = hits.keySet.toSet
    info(s"queries planning unpartitioned windows: ${found.toSeq.sorted.mkString(", ")}")
    val strays = found -- allowed.keySet
    assert(strays.isEmpty,
      s"unpartitioned Window in queries with NO documented bound: " +
        strays.toSeq.sorted.mkString(", ") +
        " — add a proven row bound to the operator Scaladoc and list it here, " +
        "or partition the window")
    // two-way: a listed site that stopped planning a global window is
    // stale documentation (logical plan structure is SF-independent,
    // so the sf0.001 sweep is authoritative for the enumeration)
    val stale = allowed.keySet -- found
    assert(stale.isEmpty,
      s"allowlist entries no longer planning an unpartitioned window " +
        s"(remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
