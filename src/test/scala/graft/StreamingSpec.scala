package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5 layer 4 — streaming semantics: the late-data harness drops
  * exactly the planted late row, and AvailableNow streaming keys equal
  * their batch formulations. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("stream_late_data drops exactly the planted late row") {
    val rows = SparkEntry.queries("stream_late_data")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 08:00 window: rows 1,2 (the 07:30 late row never lands — no 07:00
    // window exists at all); 10:00 window: rows 3,5.
    assert(rows == Seq((1704096000L, 2L), (1704103200L, 2L)), rows.toString)
  }

  test("stream_tumbling equals the batch formulation") {
    val streamed = SparkEntry.queries("stream_tumbling")(spark, sf001).collect().toSeq
    val ev = graft.util.Tables.events(spark, sf001)
    val batch = ev
      .groupBy((floor(col("ts").cast("timestamp").cast("long") / 3600) * 3600)
          .cast("long").as("ws_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_val"))
      .orderBy(col("ws_epoch"), col("event_type"))
      .collect().toSeq
    assert(streamed == batch)
  }

  test("stream_dedup equals batch distinct") {
    val streamed = SparkEntry.queries("stream_dedup")(spark, sf001).count()
    val batch = graft.util.Tables.events(spark, sf001).select("event_id").distinct().count()
    assert(streamed == batch)
  }

  test("transformWithState and mapGroupsWithState stateful counts agree") {
    val tws = SparkEntry.queries("stream_stateful_count")(spark, sf001).collect()
    val mgs = SparkEntry.queries("stream_stateful_count_mgs")(spark, sf001).collect()
    assert(tws.nonEmpty)
    assert(tws.map(_.toSeq).toSeq == mgs.map(_.toSeq).toSeq)
  }
}
