package graft.storage

import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // clear any orphaned location from a previously failed run
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-warehouse", t)
      if (java.nio.file.Files.exists(p))
        org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    }
    Bucketing.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(Tables.lineitem(spark, sf), "b_lineitem", "l_orderkey", 8)
    // force the sort-merge path (tiny test tables would broadcast, hiding
    // the bucketing effect this test is about)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders",
      "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and it is still a correct join
    val li = Tables.lineitem(spark, sf)
    val or = Tables.orders(spark, sf)
    val expected = li.join(or, li("l_orderkey") === or("o_orderkey")).count()
    assert(joined.count() === expected)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("compact merges a small-files directory, preserving every row") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // 16 tiny files (repartition by a spread key forces one file per task)
    spark.range(0, 10000).withColumn("v", col("id") * 3)
      .repartition(16).write.parquet(tmp)
    val before = spark.read.parquet(tmp)
      .select(sum(col("id")), sum(col("v")), count(lit(1))).collect().head
    val (nBefore, nAfter) = Bucketing.compact(spark, tmp)
    assert(nBefore === 16)
    assert(nAfter === 1, s"10k tiny rows must compact to one file, got $nAfter")
    val after = spark.read.parquet(tmp)
      .select(sum(col("id")), sum(col("v")), count(lit(1))).collect().head
    assert(after === before, "compaction must preserve every row exactly")
  }

  test("day-partitioned layout prunes partitions at planning time") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    val events = Tables.events(spark, sf)
      .withColumn("day", date_format(col("ts").cast("timestamp"), "yyyy-MM-dd"))
    Bucketing.writePartitioned(events, dir, "day")
    val days = events.select("day").distinct().count()
    assert(days > 1, "fixture must span multiple days")

    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    val scan = read.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the day predicate became a PARTITION filter (directory pruning), not
    // a data filter evaluated per row group
    assert(scan.partitionFilters.map(_.toString).mkString.contains("day"),
      s"day filter must prune partitions: ${scan.partitionFilters}")
    // only the one matching directory's files are selected for the scan
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).nonEmpty)
    assert(scan.metadata("Location").nonEmpty)
    val selectedParts =
      scan.relation.location.listFiles(scan.partitionFilters, Nil).length
    assert(selectedParts === 1, s"expected 1 pruned partition, got $selectedParts")
    // correctness: pruned read equals a post-hoc filter of the full table
    assert(read.count() ===
      events.filter(col("day") === "2024-01-02").count())
    assert(read.count() > 0)
  }
}
