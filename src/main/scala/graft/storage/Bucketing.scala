package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: the storage-side answer to repeated large-scale
  * joins/aggregations on the same key. Writing both sides of a recurring
  * join bucketed (and sorted) by the join key makes the join a zero-shuffle
  * sort-merge over co-located buckets — at 100 TB this converts the
  * dominant exchange of every run into a one-time layout cost.
  *
  * (The reference's analog is Kafka partition-by-partyId affinity,
  * `processing/Item.java:33-46` — key co-location decided at write time.)
  */
object Bucketing {

  /** Persist a frame as a bucketed, sorted table in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: no exchange. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    // name-based condition: Dataset-apply column refs lose their plan-id
    // binding through saveAsTable-backed relations in Spark 4
    l.join(r, org.apache.spark.sql.functions.expr(s"$leftKey = $rightKey"))
  }

  /** Persist a frame hive-partitioned by a (low-cardinality) column — the
    * time/tenant layout of a 100 TB event store: a reader filtering on the
    * partition column prunes whole directories at PLANNING time
    * (`PartitionFilters` in the scan, zero data files touched for excluded
    * partitions), which predicate pushdown alone cannot do — row-group
    * stats still require opening every file's footer. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .partitionBy(partitionCol)
      .format("parquet")
      .mode("overwrite")
      .save(path)
}
