package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-16b analytics families (ts_*, graph_*)
  * beyond the DuckDB value oracle: grid completeness, carry-forward and
  * interpolation bracketing, PageRank invariants, triangle symmetry,
  * and the broadcast shape of the iterative join. */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._
  private val sf = "/root/testdata/sf0.001"

  test("ts_gapfill covers the full hour grid with zero-count carry rows") {
    val out = ops.Analytics.tsGapfill(spark, sf).cache()
    val types = out.select("event_type").distinct().count()
    val hours = out.select("h").distinct().count()
    assert(out.count() == types * hours,
      "the grid must be the full cross of types × hours, no holes")
    // gaps exist at this sf and carry the previous observation: a
    // zero-count row's filled equals the previous row's filled
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
    val gaps = out.withColumn("prev", lag(col("filled"), 1).over(w))
      .where(col("n") === 0L && col("prev").isNotNull)
    assert(gaps.count() > 0, "fixture must contain empty hours")
    assert(gaps.where(col("filled") =!= col("prev")).count() == 0,
      "an empty hour must carry the previous filled value")
    // counts reconcile with the raw table
    val total = out.agg(sum(col("n"))).head().getLong(0)
    assert(total == graft.util.Tables.events(spark, sf).count(),
      "grid counts must reconcile to the event count")
  }

  test("ts_interpolate brackets every gap between its neighbors") {
    val out = ops.Analytics.tsInterpolate(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
    // every grid row lands a value (endpoints carry nearest observation)
    assert(out.where(col("cents").isNull).count() == 0)
    // an interpolated run is monotone between its endpoints: each value
    // lies within [min(prev obs, next obs), max(...)] — linearity's
    // coarse invariant that needs no float recomputation
    val agg = graft.util.Tables.events(spark, sf).select(col("event_type"),
        date_trunc("hour", col("ts")).as("h"),
        floor(col("value") * 100).cast("long").as("c"))
      .groupBy("event_type", "h").agg(sum("c").as("obs"))
    val j = out.join(agg, Seq("event_type", "h"), "left")
      .withColumn("pc", last(col("obs"), ignoreNulls = true).over(
        w.rowsBetween(Long.MinValue, 0)))
      .withColumn("nc", first(col("obs"), ignoreNulls = true).over(
        w.rowsBetween(0, Long.MaxValue)))
      .where(col("obs").isNull && col("pc").isNotNull && col("nc").isNotNull)
    assert(j.count() > 0, "fixture must contain interior gaps")
    assert(j.where(col("cents") < least(col("pc"), col("nc")) ||
        col("cents") > greatest(col("pc"), col("nc"))).count() == 0,
      "interpolated values must lie between their bracketing observations")
  }

  test("graph_pagerank: millionths-exact ranks with the teleport floor") {
    val out = ops.Analytics.graphPagerank(spark, sf).cache()
    assert(out.count() == 25, "one rank per nation")
    val ranks = out.select("rank_millionths").collect().map(_.getLong(0))
    assert(ranks.forall(_ >= 150000L),
      "no node ranks below the teleport floor (damping 0.85 of mass 1e6)")
    assert(ranks.exists(_ > 150000L), "connected nodes accumulate mass")
    // deterministic repeat — integer arithmetic leaves nothing to drift
    val again = ops.Analytics.graphPagerank(spark, sf)
      .select("rank_millionths").collect().map(_.getLong(0))
    assert(ranks.sameElements(again))
    // the iterative join must broadcast the O(nodes) rank side
    val plan = ops.Analytics.graphPagerank(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "rank × edges joins must broadcast the small side")
  }

  test("graph_triangles: symmetric, loop-free, and present at this sf") {
    val n = ops.Analytics.graphTriangles(spark, sf).head().getLong(0)
    assert(n > 0, "the sf0.001 trade graph is dense enough for triangles")
    // independent check: brute-force count over the collected edge set
    // (25 nodes — the toy size makes an exact cross-check affordable)
    val e = graft.util.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(graft.util.Tables.orders(spark, sf)
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"))
      .join(graft.util.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(graft.util.Tables.supplier(spark, sf)
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("int"), col("s_nationkey").cast("int"))
      .distinct().collect().map(r => (r.getInt(0), r.getInt(1)))
    val und = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a < b }.toSet
    val nodes = und.flatMap(t => Seq(t._1, t._2)).toSeq.sorted
    var brute = 0L
    for (a <- nodes; b <- nodes if a < b && und((a, b));
         c <- nodes if b < c && und((b, c)) && und((a, c))) brute += 1
    assert(n == brute, s"join count $n must equal brute-force $brute")
  }
}
