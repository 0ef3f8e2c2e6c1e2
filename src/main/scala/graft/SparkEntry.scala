package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query keys are SURVEY.md §2's operator inventory; each has a DuckDB
  * oracle in [[oracleSql]] unless sanctioned no-oracle (rule D5). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.joinBroadcast(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Windows.queries ++ ops.Scalars.queries ++
      ops.Etl.queries ++ ops.Text.queries ++ ops.Dedup.queries ++
      ops.Vectors.queries ++ ops.Extensions.queries ++ ops.Multimodal.queries ++
      ops.Streaming.queries ++ ops.Sql.queries ++ ops.Pipeline.queries ++
      ops.Scale.queries ++ ops.Geo.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Windows.oracle ++ ops.Scalars.oracle ++
      ops.Etl.oracle ++ ops.Text.oracle ++ ops.Dedup.oracle ++
      ops.Vectors.oracle ++ ops.Extensions.oracle ++ ops.Multimodal.oracle ++
      ops.Streaming.oracle ++ ops.Sql.oracle ++ ops.Pipeline.oracle ++
      ops.Scale.oracle ++ ops.Geo.oracle
}
