package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan shape for the round-2 ETL additions: gap fill,
  * stratified sampling, quarantine routing, and the bucketed range join. */
class EtlRound2Spec extends AnyFunSuite {
  import TestSpark._

  test("join_range_bucketed plans a hash join, not a nested loop") {
    val df = SparkEntry.queries("join_range_bucketed")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n${plan.take(900)}")
  }

  test("join_range_bucketed equals the naive range predicate") {
    val bucketed = SparkEntry.queries("join_range_bucketed")(spark, sf001)
    val ev = graft.util.Tables.events(spark, sf001)
    val s = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("s_event_id"), col("ts").as("s_ts"))
    val e = ev.select(col("ts").as("e_ts"))
    val naive = s.join(e, col("e_ts") >= col("s_ts") &&
        col("e_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("s_event_id")).agg(count(lit(1)).as("n_in_window"))
    assert(bucketed.except(naive).count() == 0 &&
      naive.except(bucketed).count() == 0)
  }

  test("etl_gap_fill forward-fills gaps with the last observed count") {
    val rows = SparkEntry.queries("etl_gap_fill")(spark, sf001)
      .orderBy(col("c_custkey"), col("month")).collect()
    assert(rows.exists(_.getInt(2) == 1), "no gaps in the grid?")
    var lastByCust = Map.empty[Long, Long]
    rows.foreach { r =>
      val (cust, isGap, filled) = (r.getLong(0), r.getInt(2), r.getLong(3))
      if (isGap == 1)
        assert(filled == lastByCust.getOrElse(cust, 0L),
          s"cust $cust month ${r.get(1)}: gap filled $filled != last ${lastByCust.get(cust)}")
      lastByCust += cust -> filled
    }
  }

  test("etl_sample_stratified keeps at most 50 docs per language, deterministically") {
    val df = SparkEntry.queries("etl_sample_stratified")(spark, sf001)
    val per = df.groupBy(col("lang")).agg(count(lit(1)).as("n"),
      max(col("rn")).as("mx")).collect()
    per.foreach { r =>
      assert(r.getLong(1) <= 50 && r.getInt(2) <= 50)
    }
    // deterministic: two evaluations agree row-for-row
    val again = SparkEntry.queries("etl_sample_stratified")(spark, sf001)
    assert(df.except(again).count() == 0)
  }

  test("etl_quarantine_split only emits violating rows with composed reasons") {
    val rows = SparkEntry.queries("etl_quarantine_split")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val reasons = r.getAs[String]("reasons")
      val n = r.getAs[Int]("n_viol")
      assert(n >= 1 && reasons.nonEmpty)
      assert(reasons.split(",").length == n, s"$reasons vs n_viol=$n")
    }
  }
}
