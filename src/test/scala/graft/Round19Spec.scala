package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 gates.
  *
  * BFS plan-depth bound (VERDICT r18 next #10): graph_bfs_hops accumulates
  * its visited set LAZILY over per-hop checkpoints (r18) — O(hops) plan
  * depth is fine at the registered key's maxHops=4, but a deeper fixture
  * must not grow an analyzer-busting union chain. r19 added a barrier:
  * every [[graft.ops.Pipeline.BfsRecheckpointEvery]] hops the union is
  * collapsed into a fresh localCheckpoint. This spec drives the shared
  * loop ([[graft.ops.Pipeline.bfsHopsOf]]) 20 hops down a path graph and
  * asserts (a) exact hop counts — the barrier changes no row — and (b)
  * the returned plan's Union depth stays under the cadence bound instead
  * of growing with the diameter. */
class Round19Spec extends AnyFunSuite {
  import TestSpark._

  test("bfsHopsOf re-checkpoints past the depth threshold: 20-hop path " +
      "graph yields exact hops with a bounded union chain") {
    import spark.implicits._
    val n = 20
    val edges = (0 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("src", "dst").localCheckpoint()
    val seeds = Seq((0L, 0)).toDF("node", "hop")
    val out = graft.ops.Pipeline.bfsHopsOf(seeds, edges, maxHops = n)
    val got = out.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(got.toSeq == (0 to n).map(i => (i.toLong, i)),
      s"path-graph BFS must assign hop=i to node i, got ${got.toSeq}")
    val unions = out.queryExecution.logical.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.size
    assert(unions <= graft.ops.Pipeline.BfsRecheckpointEvery,
      s"visited union chain must be re-checkpointed past " +
        s"${graft.ops.Pipeline.BfsRecheckpointEvery} hops; " +
        s"plan still stacks $unions unions after $n hops")
  }
}
