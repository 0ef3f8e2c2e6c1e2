package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Helpers enforcing SURVEY.md §2.0 determinism rules D1–D4 so every query
  * output hash-matches the DuckDB oracle bit-for-bit.
  *
  * D1: never aggregate raw doubles — cast to DECIMAL first (decimal addition
  *     is exact and order-independent, so Spark's partial aggregation over any
  *     partitioning agrees with DuckDB's single-threaded sum). Verified this
  *     session: `CAST(x AS DECIMAL(18,2))` produces identical values on both
  *     engines for every money column at sf0.01 and sf0.1.
  * D2: total output order over a unique key set (callers' responsibility;
  *     helpers here only make the aggregates order-independent).
  * D3: no raw doubles in output unless the IEEE expression tree is identical
  *     on both engines (per-row scalar arithmetic only).
  * D4: timestamps leave the plan as DATE or epoch-seconds BIGINT.
  */
object Determinism {
  val Dec18_2: DecimalType = DecimalType(18, 2)
  val Out38_2: DecimalType = DecimalType(38, 2)
  val Out38_4: DecimalType = DecimalType(38, 4)

  /** D1 pre-aggregation cast for money/measure doubles. */
  def dec2(c: Column): Column = c.cast(Dec18_2)

  /** D1 cast with explicit precision/scale (mirrored exactly in oracle SQL
    * so intermediate decimal widths stay under both engines' 38-digit cap). */
  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** D1 exact decimal SUM. The aggregation runs in the decimal domain
    * (order-independent), but the OUTPUT is cast to DOUBLE: the driver's
    * hash stringifies both sides, and a Spark DECIMAL column ('123.40')
    * never matches the oracle DECIMAL materialized as float64 ('123.4').
    * Decimal→double is correctly rounded on both engines, so the final
    * cast is deterministic. Mirror with CAST(SUM(...) AS DOUBLE) in
    * oracle SQL. (Round-2 rule D1b: NO DECIMAL COLUMN EVER LEAVES A
    * QUERY — final outputs are DOUBLE/BIGINT/DATE/VARCHAR only.) */
  def sum2(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Final-output cast for any decimal expression (rule D1b above). */
  def outD(c: Column): Column = c.cast(DoubleType)

  /** Revenue-style product kept entirely in the decimal domain:
    * dec(price) * (1 - dec(discount)) — exact on both engines. */
  def revenue(price: Column, discount: Column): Column =
    dec2(price) * (lit(1) - dec2(discount))

  def sumRevenue(price: Column, discount: Column): Column =
    sum(revenue(price, discount)).cast(DoubleType)

  /** D4: timestamp column → epoch seconds BIGINT (session TZ is UTC on both
    * engines). Spark's timestamp→long FLOORS sub-second fractions; DuckDB's
    * `epoch(ts)::BIGINT` ROUNDS (double→int cast) — oracles must therefore
    * spell it `CAST(floor(epoch(ts)) AS BIGINT)`. */
  def epochS(c: Column): Column = c.cast(TimestampType).cast(LongType)

  /** D4: NTZ timestamp → DATE. */
  def asDate(c: Column): Column = c.cast(DateType)
}
