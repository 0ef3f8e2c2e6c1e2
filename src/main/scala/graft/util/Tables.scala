package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pinned parquet readers for the driver fixtures (see FIXTURES.md).
  *
  * The reference repo (/root/reference/README.md:1) declares a telecom
  * ETL-pipeline domain but ships no code or data; the capability surface we
  * implement is SURVEY.md §2 over the driver-provided TPC-H-ish star schema
  * plus `events` / `documents` / `embeddings`.
  *
  * Scale posture: every reader is a plain parquet scan — Catalyst pushes
  * filters/column pruning into the vectorized reader, so callers should
  * `.select`/`.where` on the returned frame rather than materialize it.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
    * read as a timestamp. Read it as raw nanos (legacy conf) and floor-divide
    * to microseconds — exactly DuckDB's ns→µs truncation, so oracle parity
    * holds. Integer `div` (not `/`) because ns-since-epoch exceeds 2^53. */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
