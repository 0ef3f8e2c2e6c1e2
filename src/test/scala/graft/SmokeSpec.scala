package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs end-to-end at sf0.001 (the t1 tier) and the
  * flagship returns rows. Oracle keys must be a subset of query keys. */
class SmokeSpec extends AnyFunSuite {
  import TestSpark._

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty)
      // driver-compare shape gate: oracled outputs must be atomic,
      // non-decimal columns (pandas sort_values chokes on arrays; decimal
      // stringification skews vs duckdb float64).
      if (SparkEntry.oracleSql.contains(name))
        graft.util.Shapes.assertComparable(name, df)
      assert(df.count() >= 0)
    }
  }

  test("shape guard rejects a planted array column") {
    import org.apache.spark.sql.functions._
    val planted = spark.range(3).withColumn("arr", array(col("id"), col("id")))
    val bad = graft.util.Shapes.unsafeColumns(planted)
    assert(bad.exists(_.startsWith("arr")), bad.toString)
    intercept[IllegalArgumentException] {
      graft.util.Shapes.assertComparable("planted", planted)
    }
  }

  test("shape guard rejects a planted decimal column") {
    import org.apache.spark.sql.functions._
    val planted = spark.range(3).select(col("id").cast("decimal(10,2)").as("d"))
    assert(graft.util.Shapes.unsafeColumns(planted).nonEmpty)
  }
}
