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

  /** Local session on `cpus` threads with matching shuffle width. */
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).appName(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
