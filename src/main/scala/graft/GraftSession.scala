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
  def build(cpus: Int, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // SQL names for the custom expression library (GraftExtensions)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as raw long (see Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed (bucketed) tables land outside the repo
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
