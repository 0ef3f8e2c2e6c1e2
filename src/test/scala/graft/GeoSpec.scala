package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and invariant pins for the round-16b geo family beyond
  * the DuckDB value oracle: map-side-combinable single-shuffle grid
  * aggregation, broadcast bbox join, bounded-panel KNN with monotone
  * ranked distances, and integer-exact determinism. */
class GeoSpec extends AnyFunSuite {
  import TestSpark._
  private val sf = "/root/testdata/sf0.001"

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  test("geo_grid_agg: one shuffle, exact cents, full-cover cells") {
    val out = ops.Geo.geoGridAgg(spark, sf)
    // grid agg is ONE hash shuffle on the cell key (partial aggregation
    // upstream); the ordered limit is TakeOrdered, not a range exchange
    assert(exchanges(out) == 1,
      s"grid agg must shuffle once:\n${out.queryExecution.executedPlan}")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "aggregation must be map-side combinable")
    val rows = out.collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    // cells are within the shifted non-negative 1-degree domain
    assert(rows.forall { r =>
      val (glat, glon) = (r.getLong(0), r.getLong(1))
      glat >= 81 && glat <= 98 && glon >= 162 && glon <= 198 })
  }

  test("geo_knn_prefiltered: cell equi-join, no all-pairs, brute parity") {
    val pre = ops.Geo.geoKnnPrefiltered(spark, sf)
    // assert on the UNCHECKPOINTED candidate-join plan (the key returns
    // a checkpoint-backed frame whose plan is a sort over an RDD scan —
    // checking that would be vacuous; round 17 second-pass review)
    val plan = ops.Geo.geoKnnPrefilteredPlan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"prefiltered KNN must plan no all-pairs node:\n$plan")
    // brute-panel control: identical rows (exactness certificate holds)
    val brute = ops.Geo.geoKnnPoints(spark, sf).collect().map(_.toSeq)
    val got = pre.collect().map(_.toSeq)
    assert(got.length == brute.length && got.sameElements(brute),
      "prefiltered answer must equal the brute panel's exactly")
  }

  test("geo_bbox_join broadcasts the box dim and counts containment exactly") {
    val out = ops.Geo.geoBboxJoin(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"),
      s"the O(regions) box dim must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "a 25-box range join must not sort-merge")
    val rows = out.collect()
    assert(rows.length == 25, "one row per nation box, empties included")
    // independent containment recount for one non-empty box
    val nonEmpty = rows.find(_.getLong(1) > 0).get
    val (name, n) = (nonEmpty.getString(0), nonEmpty.getLong(1))
    val box = graft.util.Tables.nation(spark, sf)
      .where(col("n_name") === name).select(
        (((col("n_nationkey") * 701) % 24 - 12) * 1000000L).as("latlo"),
        (((col("n_nationkey") * 907) % 56 - 28) * 1000000L).as("lonlo"))
      .head()
    val recount = graft.util.Tables.customer(spark, sf)
      .select(col("c_custkey"),
        (((col("c_custkey") % 1000003L) * 2654435761L) % 17000000L - 8500000L).as("lat"),
        (((col("c_custkey") % 999983L) * 2654435761L) % 36000000L - 18000000L).as("lon"))
      .where(col("lat").between(box.getLong(0), box.getLong(0) + 8000000L) &&
        col("lon").between(box.getLong(1), box.getLong(1) + 12000000L))
      .count()
    assert(recount == n, s"$name: join count $n != filter recount $recount")
  }

  test("geo_knn_points: ranked monotone distances under a bounded panel") {
    val out = ops.Geo.geoKnnPoints(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), "the probe panel must broadcast")
    val rows = out.collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.forall(_._2.length == 5), "exactly k=5 per probe")
    byProbe.foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(1 to 5),
        s"probe $p ranks must be 1..5")
      val ds = sorted.map(_.getLong(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        s"probe $p distances must be nondecreasing: ${ds.mkString(",")}")
    }
    // determinism: integer geometry leaves nothing to drift
    val again = ops.Geo.geoKnnPoints(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }
}
