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

  /** Builder preloaded with the recommended configuration; callers
    * override as needed before `getOrCreate()`. */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // storage-partitioned joins over KGP-reporting DSv2 scans (the
      // bucketed range source; any clustered table a deployment
      // mounts): planning-only, inert for every other source
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session on `cpus` threads with matching shuffle width. */
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).appName(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
