package graft

import graft.ops.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape obligations for the round-2 similarity additions:
  * IVF ANN, the MinHash estimate-vs-exact surface, and the hash/encoding
  * function family. */
class AnnDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("vec_ann_ivf assigns cells without shuffling the candidate side") {
    val df = SparkEntry.queries("vec_ann_ivf")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    // cell assignment is a projection (greatest over centroid literals) and
    // candidates reach the probe join via broadcast — the only hash-exchanges
    // allowed are the tiny probe-side window and the final orderBy.
    assert(plan.contains("greatest"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("vec_ann_ivf returns contiguous ranks per probe, never the probe itself") {
    val rows = SparkEntry.queries("vec_ann_ivf")(spark, sf001).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (probe, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to rs.length), s"probe $probe ranks $ranks")
      assert(rs.forall(_.getLong(2) != probe))
    }
  }

  test("dedup_minhash_estimate covers exactly the LSH candidate pairs") {
    val est = SparkEntry.queries("dedup_minhash_estimate")(spark, sf001)
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf001)
    val ep = est.select(col("doc_a"), col("doc_b"))
    val lp = lsh.select(col("doc_a"), col("doc_b"))
    assert(ep.except(lp).count() == 0 && lp.except(ep).count() == 0)
    val bad = est.where(col("est8") < 0 || col("est8") > 8 ||
      col("i") > col("u") || col("i") < 0).count()
    assert(bad == 0)
  }

  test("dedup_minhash_estimate tracks exact jaccard on planted near-dups") {
    // Near-identical docs (exact jaccard >= 0.5) must score a higher mean
    // estimate than background candidates — the property band tuning uses.
    val est = SparkEntry.queries("dedup_minhash_estimate")(spark, sf001)
      .withColumn("exact_hi", col("i") * 2 >= col("u"))
    val hi = est.where(col("exact_hi")).agg(avg(col("est8"))).head.getDouble(0)
    assert(hi >= 4.0, s"mean est8 on near-dups = $hi")
  }

  test("vec_pq_codes emits 8 subspace codes per vector, no join in the plan") {
    val df = SparkEntry.queries("vec_pq_codes")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"PQ coding must be a pure projection:\n${plan.take(800)}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (vid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (0 until 8), s"vec $vid subs")
      assert(rs.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 4))
    }
    // a codebook seed vector must code to itself in every subspace
    val seed = Vectors.seedIds.take(4).sorted
    seed.zipWithIndex.foreach { case (vid, ord) =>
      val codes = rows.filter(_.getLong(0) == vid).map(_.getInt(2)).toSet
      assert(codes == Set(ord), s"seed $vid coded $codes, expected {$ord}")
    }
  }

  test("agg_hll_merge: sketch-merge invariant and 2% bound hold per language") {
    val rows = SparkEntry.queries("agg_hll_merge")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("merge_consistent") == 1, r.toString)
      assert(r.getAs[Int]("within_2pct") == 1, r.toString)
      assert(r.getAs[Long]("n_exact") > 0)
    }
  }

  test("fn_hash_encode digests have canonical shapes and base64 round-trips") {
    val rows = SparkEntry.queries("fn_hash_encode")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("md5_hex").matches("[0-9a-f]{32}"))
      assert(r.getAs[String]("sha256_hex").matches("[0-9a-f]{64}"))
      assert(!r.getAs[String]("b64_long").contains("\r"))
      assert(r.getAs[Int]("rt_ok") == 1)
    }
  }
}
