package graft

import org.apache.spark.sql.SparkSession

/** The library's recommended SparkSession configuration, in one
  * place — what a user of the engine starts from instead of
  * rediscovering the settings the operators assume:
  *
  *  - `spark.sql.shuffle.partitions` sized to the executor-core
  *    count, not the 200 default (on a real cluster: 2-3x total
  *    cores; the 200 default over-partitions small stages and
  *    under-partitions 100 TB ones).
  *  - AQE on: runtime join-strategy changes, skew-join splitting and
  *    post-shuffle coalescing are assumed by the operator plans
  *    (the CPU-heavy kernels pin their own width explicitly where
  *    coalescing would hurt — see CLAUDE.md's measured rules).
  *  - UTC session timezone: the temporal operators and their oracles
  *    render timestamps as civil strings; a non-UTC session would
  *    shift them.
  *
  * The mains ([[Verify]], [[Bench]], [[Profile]], [[Cli]]) all build
  * through this factory so tests, gates and users run the same
  * configuration.
  */
object GraftSession {

  /** RAM-backed scratch root when the platform has one (/dev/shm on
    * Linux), else None. Micro-batch streaming fsyncs its offset log,
    * commit log and state-store deltas once per batch; on a
    * disk-backed /tmp those fsyncs are the dominant FIXED cost of
    * every bounded streaming gate (measured: the 25-query streaming
    * family spent ~98s min-of-2 at sf0.1 with /tmp on ext4). On a
    * real cluster this is the "give the state store and shuffle a
    * fast local NVMe" deployment rule; locally tmpfs is that disk. */
  private lazy val shmRoot: Option[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (!sys.env.get("GRAFT_NO_SHM").contains("1") &&
      java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      Some(shm)
    else None
  }

  /** Per-call scratch dir for streaming checkpoints, staged stream
    * inputs and file-sink outputs — tmpfs-backed when available.
    * Callers sweep it in their finally blocks ([[sweep]]);
    * correctness-neutral either way (paths are fresh temp dirs). */
  def scratchDir(prefix: String): java.nio.file.Path =
    shmRoot match {
      case Some(root) => java.nio.file.Files.createTempDirectory(root, prefix)
      case None       => java.nio.file.Files.createTempDirectory(prefix)
    }

  /** Root for the library's per-application scratch warehouse
    * (DSv2 catalog tables, compaction/vacuum/retention fixtures,
    * quarantine CSVs, the exactly-once sink's versioned targets) —
    * tmpfs-backed when available, /tmp otherwise. Same rationale as
    * [[scratchDir]]: these tables are rewritten from the source
    * parquet on every (session, sfDir) change, so placement is
    * correctness-neutral; on a cluster this is the job's scratch
    * bucket / local SSD staging dir. */
  def warehouseRoot(s: SparkSession): String = {
    val root = shmRoot.fold("/tmp")(_.toString) +
      s"/graft_warehouse_${s.sparkContext.applicationId}"
    // sweep at JVM exit: per-app scratch tables otherwise accumulate
    // across runs (on tmpfs that is held RAM, not just disk clutter)
    registerExitSweep(root)
    root
  }

  private val exitSweeps = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def registerExitSweep(path: String): Unit =
    if (exitSweeps.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try sweep(java.nio.file.Paths.get(path)) catch { case _: Throwable => () }))

  /** Recursive delete of a scratch tree (children before parents). */
  def sweep(base: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(base)) {
      val walked = java.nio.file.Files.walk(base)
      try walked.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walked.close()
    }
  }

  /** Builder preloaded with the recommended configuration; callers
    * override as needed before `getOrCreate()`. */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // GRAFT_AQE=false is a dev-only A/B escape (r17): it measured
      // AQE's per-exchange stage-job overhead on the iterative graph
      // loops (hits/bfs/pagerank ~25% faster without AQE, components
      // ~25% slower — mixed, so the default stays on and the loops
      // cut exchanges structurally instead). Never set by the driver.
      // normalized to a strict boolean (r17 ADVICE: any other value,
      // e.g. GRAFT_AQE=0, failed session construction with an obscure
      // IllegalArgumentException) — only "false"/"0" turn it off
      .config("spark.sql.adaptive.enabled",
        (!sys.env.get("GRAFT_AQE").exists(v => v == "false" || v == "0")).toString)
      // storage-partitioned joins over KGP-reporting DSv2 scans (the
      // bucketed range source; any clustered table a deployment
      // mounts): planning-only, inert for every other source
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
    // shuffle blocks, spills and RocksDB state-store working dirs on
    // the fast local medium (the cluster deployment rule is NVMe
    // spark.local.dir; locally that is tmpfs). Spark sweeps its
    // blockmgr-*/spark-* subdirs on session stop.
    shmRoot.fold(b)(root => b.config("spark.local.dir", root.toString))
  }

  /** Runs `body` with AQE disabled on the session, restoring the
    * prior value after — scoped to the ITERATIVE LOOP BODIES of the
    * graph/CC fixpoint operators (r18).
    *
    * Why this is safe AND right at every scale, not a local-mode
    * tune: inside those loops every join consumes localCheckpoint'ed
    * frames whose partitioning was pinned by an explicit
    * `repartition(p, key)` — no exchange feeds any join, so AQE's
    * skew-join splitting CANNOT apply to them (it only rewrites
    * joins reading shuffle query stages), and the only exchanges in
    * the loop plans are the explicit width pins whose entire purpose
    * is to prevent the coalescing AQE would perform. What AQE still
    * costs there is real: each exchange materializes as a separately
    * scheduled stage-job, and on a slow-dispatch host (both measured
    * boxes run 30-700 ms/job windows) that tax dominates the
    * metadata-sized rounds. Measured job counts at sf0.1 (JobCensus,
    * deterministic): hits_converge 134->32, kcore 88->29,
    * bfs_levels 55->20, pagerank 37->12, path_counts 55->20,
    * sim_graph_components 102->19. The corpus-scale memo builds
    * (edge lists, kNN candidates) stay OUTSIDE the scope — they are
    * single-pass plans where AQE's runtime re-optimization earns its
    * stage jobs (the r17 A/B: components' kNN pipeline was 25%
    * faster WITH AQE).
    *
    * GRAFT_LOOP_AQE=1 keeps AQE on inside the loops (the
    * parameterized escape for deployments that want uniform AQE; the
    * gated values are partitioning-independent integer aggregates,
    * so the setting cannot move any result). The session-conf flip
    * is visible to frames PLANNED concurrently on the same session —
    * the only such window is the bench's composite warmup, where a
    * sibling future may plan one build with AQE off: correctness-
    * neutral (both settings are correct plans), bounded to warmup.
    */
  def withLoopAqeOff[T](s: SparkSession)(body: => T): T =
    if (sys.env.get("GRAFT_LOOP_AQE").contains("1")) body
    else {
      val key = "spark.sql.adaptive.enabled"
      val prev = s.conf.get(key)
      s.conf.set(key, "false")
      try body finally s.conf.set(key, prev)
    }

  /** Local session on `cpus` threads with matching shuffle width. */
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).appName(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
