package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Output-shape guard for oracle-compared results.
  *
  * The driver's compare loads each result with pandas, sorts rows by value
  * (`sort_values`), stringifies, and hashes. Two column shapes break that
  * pipeline and so are banned from any oracled key's FINAL output:
  *   - nested types (array/map/struct): pandas cannot sort them
  *     (`TypeError: unhashable type: numpy.ndarray` — the exact
  *     text_inverted_index round-3 failure). Stringify with
  *     `concat_ws(",", ...)` on the Spark side and
  *     `array_to_string(..., ',')` in the DuckDB oracle instead.
  *   - DECIMAL: pandas keeps Spark decimals as `Decimal('123.40')` while
  *     DuckDB's `.df()` gives float64 `123.4` — trailing-zero hash skew.
  *     Cast to DOUBLE or BIGINT on both sides.
  */
object Shapes {

  private def banned(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | _: DecimalType => true
    case _ => false
  }

  /** Names of columns the driver compare cannot handle (empty = safe). */
  def unsafeColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if banned(f.dataType) => s"${f.name}: ${f.dataType.simpleString}" }.toSeq

  /** Throws if `df` (the output of oracled key `name`) has a banned column. */
  def assertComparable(name: String, df: DataFrame): Unit = {
    val bad = unsafeColumns(df)
    require(bad.isEmpty,
      s"oracled key '$name' emits driver-incomparable columns [${bad.mkString(", ")}] — " +
        "stringify arrays/maps/structs and cast decimals to double/bigint on BOTH sides")
  }
}
