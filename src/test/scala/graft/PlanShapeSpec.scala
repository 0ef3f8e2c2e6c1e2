package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan obligations from SURVEY §4.1: pushdown, pruning, broadcast
  * joins, top-k. These guard the 100 TB posture — a regression here is a
  * performance bug even while results stay correct. */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  test("scan_filter_pushdown pushes predicates into the parquet scan") {
    val p = planOf("scan_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_returnflag"), p)
  }

  test("scan_project prunes columns at the reader") {
    val p = planOf("scan_project")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("l_discount"), "unprojected column leaked into scan")
  }

  test("join_broadcast plans BroadcastHashJoin for the dims") {
    assert(planOf("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("sort_multi_nulls plans TakeOrderedAndProject (no full sort)") {
    assert(planOf("sort_multi_nulls").contains("TakeOrderedAndProject"))
  }

  test("join_semi and join_anti stay semi/anti joins") {
    assert(planOf("join_semi").contains("LeftSemi"))
    assert(planOf("join_anti").contains("LeftAnti"))
  }

  test("vec_knn_cosine broadcasts the probe side") {
    assert(planOf("vec_knn_cosine").contains("Broadcast"))
  }

  test("whole-stage codegen covers the pricing summary") {
    // AQE hides codegen wrappers in the plan string; the codegen explain
    // mode reports the fused subtrees directly.
    val df = SparkEntry.queries("agg_pricing_summary")(spark, sf001)
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(s.contains("WholeStageCodegen"), s.take(500))
  }
}
