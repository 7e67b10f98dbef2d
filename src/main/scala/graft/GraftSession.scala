package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every entry point (Verify, Bench, tests)
  * builds its session here so engine-required configs are applied uniformly.
  *
  * Settings are chosen for a multi-executor deployment and merely sized down
  * for local runs: shuffle partitions follow the core count (AQE coalesces
  * further at runtime), and adaptive execution handles skew/broadcast
  * re-planning the same way it would on a 1000-executor cluster.
  */
object GraftSession {

  /** Ephemeral-scratch directory for shuffle blocks and spills: prefer RAM-
    * backed /dev/shm when present and writable (shuffle blocks are ephemeral
    * by contract — executor loss already invalidates them, so tmpfs loses
    * nothing), else fall back to the JVM temp dir. `SPARK_LOCAL_DIRS` (the
    * cluster-operator knob) overrides the conf this feeds, per Spark's
    * documented precedence. */
  private def scratchDir(): String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-scratch"
    else sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-scratch"
  }

  def build(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // The generated-code cache defaults to 100 entries; a corpus of ~60
      // queries compiles several hundred codegen units, so consecutive runs
      // of the same query would otherwise re-run janino on every unit.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // SQL names for the custom expression library (GraftExtensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as raw long (see Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed (bucketed) tables land outside the repo
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      // Shuffle/spill scratch on the fastest local storage available: a
      // cluster provisions NVMe for exactly this (and SPARK_LOCAL_DIRS,
      // which takes precedence, is how it says so); a local run should not
      // bottleneck ephemeral shuffle blocks on a throttled root disk.
      .config("spark.local.dir", scratchDir())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
