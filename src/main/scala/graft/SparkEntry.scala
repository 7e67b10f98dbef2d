package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is an operator/query from the SURVEY.md §2
  * inventory (or the training-data-pipeline extensions); [[oracleSql]] holds
  * the DuckDB-checkable equivalent where the op is SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++ SourceQueries.queries ++ DslQueries.queries ++ DocQueries.queries ++ EmbeddingQueries.queries ++ EnrichQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ EventQueries.oracles ++ SourceQueries.oracles ++ DslQueries.oracles ++ DocQueries.oracles ++ EmbeddingQueries.oracles ++ EnrichQueries.oracles
}
