package graft

import graft.dsl.DefaultMapping
import graft.sources.BrowserSource
import org.apache.spark.sql.functions._

/** Per-core decode+map throughput vs the reference's
  * 15k events/s/thread (`docs/introduction.rst:111-113`). */
object Throughput {
  def main(args: Array[String]): Unit = {
    val cores = 32
    val spark = GraftSession.build(cores, "throughput")
    val d = "/root/testdata/sf0.1"
    // materialize 1M wire-format rows first so we time ONLY decode+map
    val ev = Tables.events(spark, d)
      .withColumn("ts_ms", unix_millis(col("ts").cast("timestamp")))
    val b36ts = lower(conv(col("ts_ms").cast("string"), 10, 36))
    val qs = concat_ws("&",
      concat(lit("p=0%3A"), b36ts, lit("%3Auser"), col("user_id")),
      concat(lit("s=0%3A"), b36ts, lit("%3Asess"), col("user_id")),
      concat(lit("v=pv"), col("event_id")),
      concat(lit("e=pv"), col("event_id"), lit("%3A0")),
      concat(lit("c="), b36ts),
      lit("n=f"), lit("f=t"),
      concat(lit("l=http%3A%2F%2Fshop.example%2Fp%2F"), col("user_id")),
      concat(lit("w="), lower(conv(floor(col("value")).cast("long").cast("string"), 10, 36))),
      concat(lit("t="), col("event_type")),
      concat(lit("u=(dk!"), lower(conv(get_json_object(col("props"), "$.k").cast("long").cast("string"), 10, 36)), lit("!)")))
    val wire = (1 to 10).map(_ => ev.withColumn("qs", qs)
        .withColumn("userAgentString", lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"))
        .withColumn("remoteHost", lit("10.0.0.1"))
        .withColumn("requestTimestamp", col("ts_ms"))
        .withColumn("duplicate", lit(false))
        .select("qs", "userAgentString", "remoteHost", "requestTimestamp", "duplicate"))
      .reduce(_ union _).repartition(cores).cache()
    val n = wire.count()
    // timed: full browser decode + default mapping (26 fields, UA enrich).
    // Two runs each — run1 pays the one-time whole-stage codegen + JIT (a
    // single cold run under-reported the sustained rate ~10x); run2 is the
    // steady state a long-lived collector job sees.
    // toRdd.count() materializes every mapped column (plain count() would
    // let Catalyst prune the entire mapping and time an empty scan).
    // Same per-sample quality evidence as Bench: the throughput figure is
    // the headline baseline comparison, so each sample carries the
    // (selfCpu/wall, taskCpuFrac, ext) fields that prove (or disprove) it
    // was measured on an uncontended JVM.
    BenchSampler.install(spark)
    val hostCores = Runtime.getRuntime.availableProcessors
    val out = DefaultMapping(BrowserSource.decode(wire, "qs"))
    (1 to 2).foreach { run =>
      var cnt = 0L
      val s = BenchSampler.sample(hostCores) { cnt = out.queryExecution.toRdd.count() }
      println(f"[thpt] map run$run rows=$cnt sec=${s.wall}%.2f " +
        f"total=${cnt / s.wall}%.0f/s percore=${cnt / s.wall / cores}%.0f/s " +
        f"self=${s.selfRatio}%.1f tcpu=${s.taskCpuFrac}%.2f ext=${s.ext}%.2f gc=${s.gcMs}ms" +
        (if (BenchSampler.dirtyReasons(s, 0.15, 0.3).isEmpty) ""
         else s" DIRTY=${BenchSampler.dirtyReasons(s, 0.15, 0.3).mkString("+")}"))
    }
    val dec = BrowserSource.decode(wire, "qs")
    (1 to 2).foreach { run =>
      var c2 = 0L
      val s = BenchSampler.sample(hostCores) { c2 = dec.queryExecution.toRdd.count() }
      println(f"[thpt] decode-only run$run ${c2 / s.wall / cores}%.0f/s/core " +
        f"self=${s.selfRatio}%.1f ext=${s.ext}%.2f")
    }
    spark.stop()
  }
}
