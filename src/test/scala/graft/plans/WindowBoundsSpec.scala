package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.{SparkEntry, SparkSpec}

/** Board-wide plan-governance sweep, two invariants over ONE
  * construction pass of every SparkEntry query (the sweep constructs
  * all ~350 queries, so the two checks share it rather than each
  * paying its own):
  *
  * 1. UNPARTITIONED WINDOWS (r15 verdict item 5): every
  *    `Window.orderBy` with no `partitionBy` — the plan Spark warns
  *    about with "No Partition Defined ... moving all data to a
  *    single partition" — must consume a PROVEN-BOUNDED frame. The
  *    repo rule (CLAUDE.md) requires a value-domain or top-K bound
  *    in the operator's Scaladoc; the [[windowAllowed]] map is the
  *    checked index of those bounds, two-way (new strays AND stale
  *    entries both fail).
  *
  * 2. CROSS JOINS (r16 verdict item 6): every logical cross join
  *    (joinType Cross, or any join with no condition) must have at
  *    least one side Catalyst can PROVE small — `maxRows` ≤
  *    [[CrossJoinMaxRows]], which scalar aggregates (Some(1)), local
  *    relations, ranges, and limits all satisfy. The repo's
  *    crossJoin convention is exactly that shape: a broadcast scalar
  *    aggregate or a K-row grid attached to a big frame. A cross
  *    join where NEITHER side is provably small is either a real
  *    cartesian blowup or a domain-bounded frame the optimizer can't
  *    see through (|sources|, |event types|, vocab tops) — the
  *    latter are enumerated in [[crossAllowed]] with their bound
  *    justifications, two-way like the windows.
  *
  * Mechanics: a QueryExecutionListener records offending nodes from
  * every plan executed while a query is CONSTRUCTED (eager
  * localCheckpoints / collects — where most metadata windows run),
  * and the final lazy plan is swept directly. Attribution is raced
  * by the async listener bus (r16 ADVICE: events can post after
  * `current` moved on, landing on the WRONG query name), so after
  * each query's construction the sweep polls the bus to QUIESCENCE
  * (no new events for [[DrainQuietMs]], bounded by [[DrainMaxMs]])
  * before advancing — construction-time executions drain under the
  * name that ran them, replacing the old fixed end-of-sweep sleep.
  * Detection is on the LOGICAL plan: under AQE (default in Spark 4)
  * the physical tree hides inside AdaptiveSparkPlanExec, which a
  * plain executedPlan.collect does not descend into (the CLAUDE.md
  * plan-inspection rule).
  */
class WindowBoundsSpec extends SparkSpec {

  private val DrainQuietMs = 300L
  private val DrainMaxMs = 5000L
  private val CrossJoinMaxRows = 10000L

  /** query -> why its global window is bounded (the Scaladoc bound,
    * compressed). Every entry is |domain|-bounded METADATA, never a
    * frame whose row count grows with the corpus — except the
    * explicitly-flagged streaming STAGING windows, which order the
    * whole (test-scale) events table to cut time-contiguous files
    * for the file-source harness: that sort is gate scaffolding, not
    * the operator's plan (production streams arrive time-ordered
    * from the transport; the operator under test never plans it). */
  private val windowAllowed: Map[String, String] = Map(
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

  /** query -> why its unproven-side cross join is bounded. Listed
    * only when NEITHER side carries a Catalyst-provable maxRows ≤
    * CrossJoinMaxRows — i.e. a domain-bounded frame the optimizer
    * cannot size (grouped aggregates over a fixed value domain,
    * distinct over an enum column, a filter that selects one
    * accumulator row out of a grouped aggregate). The bound argument
    * lives in the operator's Scaladoc; this is the checked index. */
  private val crossAllowed: Map[String, String] = Map(
    "dedup_embed_cosine" -> "KxK centroid-ball metadata join (codebook K, adaptiveSeedK-clamped); grouped radii agg hides the K bound",
    "dedup_ensemble" -> "inherits dedup_embed_cosine's KxK centroid-ball join (the composite re-runs the cosine tier)",
    "dedup_threshold_sweep" -> "inherits dedup_embed_cosine's KxK centroid-ball join (its pair source)",
    "ml_corr_pairs" -> "scalar n row (da=-1 accumulator partial, 1 row by construction) x d^2-bounded pair-stats frame",
    "ml_rank_corr" -> "scalar n row (da=-1 accumulator partial) x d^2-bounded pair-stats frame",
    "pipe_waterfill_budget" -> "<=1-row water-level boundary row x the |sources| allocation frame",
    "q31_gapfill" -> "observation-window hour grid (sequence lo..hi) x |event types| enum",
    "temporal_ffill" -> "observation-window 6h grid x |event types| enum",
    "sim_ivf_retrain_stats" -> "K-row cell-count frame x its own scalar total (grouped-agg side hides the K bound)",
    "stream_drift" -> "closed-hours grid x |event types| enum (the Laplace densify); both domain-bounded",
    "text_source_divergence" -> "|sources| enum x vocab densify grid — the declared (source,word) metadata matrix; pair join runs on it, never on the corpus"
  )

  // ---- shared sweep ------------------------------------------------

  private case class Sweep(
      windowHits: Map[String, Set[String]],
      crossHits: Map[String, Set[String]],
      failedBuilds: Map[String, String])

  private def globalWindows(qe: QueryExecution): Seq[String] =
    try {
      qe.optimizedPlan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty =>
          w.windowExpressions.map(_.name).mkString("|")
      }
    } catch { case _: Throwable => Seq.empty }

  /** cross joins with NO provably-small side: joinType Cross or a
    * condition-free join, where neither child's `maxRows` proves it
    * ≤ CrossJoinMaxRows (scalar aggregates, local relations, ranges
    * and limits all prove; corpus scans and grouped aggregates
    * don't). */
  private def unprovenCrossJoins(qe: QueryExecution): Seq[String] =
    try {
      qe.optimizedPlan.collect {
        case j: logical.Join
            if (j.joinType == org.apache.spark.sql.catalyst.plans.Cross ||
              j.condition.isEmpty) &&
              !Seq(j.left, j.right).exists(_.maxRows.exists(_ <= CrossJoinMaxRows)) =>
          s"${j.joinType}(${j.left.nodeName} x ${j.right.nodeName})"
      }
    } catch { case _: Throwable => Seq.empty }

  private lazy val sweep: Sweep = {
    val windowHits = mutable.Map[String, mutable.Set[String]]()
    val crossHits = mutable.Map[String, mutable.Set[String]]()
    @volatile var current: String = "<none>"
    @volatile var lastEventNanos: Long = System.nanoTime()
    def record(qe: QueryExecution): Unit = {
      val globals = globalWindows(qe)
      val crosses = unprovenCrossJoins(qe)
      if (globals.nonEmpty || crosses.nonEmpty)
        windowHits.synchronized {
          if (globals.nonEmpty)
            windowHits.getOrElseUpdate(current, mutable.Set[String]()) ++= globals
          if (crosses.nonEmpty)
            crossHits.getOrElseUpdate(current, mutable.Set[String]()) ++= crosses
        }
      lastEventNanos = System.nanoTime()
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
        lastEventNanos = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          // the lazy remainder of the plan (never executed here)
          val qe = df.queryExecution
          val lazyGlobals = globalWindows(qe)
          val lazyCrosses = unprovenCrossJoins(qe)
          windowHits.synchronized {
            if (lazyGlobals.nonEmpty)
              windowHits.getOrElseUpdate(name, mutable.Set[String]()) ++= lazyGlobals
            if (lazyCrosses.nonEmpty)
              crossHits.getOrElseUpdate(name, mutable.Set[String]()) ++= lazyCrosses
          }
        } catch {
          case t: Throwable => failedBuilds(name) = t.toString.take(200)
        }
        // drain the async listener bus to quiescence so construction-
        // time executions are attributed to THIS query, not the next
        // one (r16 ADVICE) — bounded poll instead of a fixed sleep
        val deadline = System.nanoTime() + DrainMaxMs * 1000000L
        while (System.nanoTime() - lastEventNanos < DrainQuietMs * 1000000L &&
          System.nanoTime() < deadline) Thread.sleep(25)
      }
    } finally spark.listenerManager.unregister(listener)
    Sweep(
      windowHits.map { case (k, v) => k -> v.toSet }.toMap,
      crossHits.map { case (k, v) => k -> v.toSet }.toMap,
      failedBuilds.toMap)
  }

  test("unpartitioned windows: enumerated, justified, no corpus-sized strays") {
    assert(sweep.failedBuilds.isEmpty, s"queries failed to build: ${sweep.failedBuilds}")
    val found = sweep.windowHits.keySet
    info(s"queries planning unpartitioned windows: ${found.toSeq.sorted.mkString(", ")}")
    val strays = found -- windowAllowed.keySet
    assert(strays.isEmpty,
      s"unpartitioned Window in queries with NO documented bound: " +
        strays.toSeq.sorted.mkString(", ") +
        " — add a proven row bound to the operator Scaladoc and list it here, " +
        "or partition the window")
    // two-way: a listed site that stopped planning a global window is
    // stale documentation (logical plan structure is SF-independent,
    // so the sf0.001 sweep is authoritative for the enumeration)
    val stale = windowAllowed.keySet -- found
    assert(stale.isEmpty,
      s"allowlist entries no longer planning an unpartitioned window " +
        s"(remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("cross joins: every one has a provably-small side or a documented bound") {
    val found = sweep.crossHits.keySet
    info(s"queries planning unproven-side cross joins: " +
      sweep.crossHits.toSeq.sortBy(_._1)
        .map { case (q, js) => s"$q[${js.mkString("; ")}]" }.mkString(", "))
    val strays = found -- crossAllowed.keySet
    assert(strays.isEmpty,
      s"cross join with NO provably-small side in: " +
        strays.toSeq.sorted.map(q => s"$q ${sweep.crossHits(q).mkString("; ")}")
          .mkString(", ") +
        " — broadcast a provably-bounded side (scalar agg / local / range / limit), " +
        "or document the domain bound in the Scaladoc and list it here")
    val stale = crossAllowed.keySet -- found
    assert(stale.isEmpty,
      s"cross-join allowlist entries no longer planning an unproven cross join " +
        s"(remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
