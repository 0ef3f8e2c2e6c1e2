package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 additions: span-level segment dedup, the Lloyd k-means step,
  * and the corpus-balance Gini rational. DuckDB parity is the driver's
  * job; these assert the internal invariants the oracle can't see. */
class SegmentKmeansSpec extends AnyFunSuite {
  import TestSpark._

  test("text_segment_dedup: kept == corpus-distinct segments; n_seg == ceil(words/10)") {
    val rows = SparkEntry.queries("text_segment_dedup")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_seg") ==
        r.getAs[Long]("n_kept") + r.getAs[Long]("n_dup"))
      assert(r.getAs[Long]("n_kept") >= 0) // 0 = fully-duplicated doc
    }
    // every distinct segment string is kept exactly once corpus-wide
    val d = spark.read.parquet(s"$sf001/documents.parquet")
    val distinctSegs = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0),
          floor((size(col("ws")) - 1) / 10).cast("int"))).as("k"))
      .select(concat_ws(" ",
        slice(col("ws"), col("k") * 10 + 1, lit(10))).as("seg"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_kept")).sum == distinctSegs)
    // per-doc segment count is ceil(words/10)
    val expected = d.select(col("doc_id"),
        ceil(size(split(col("text"), " ")) / 10.0).cast("long").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getAs[Long]("n_seg") == expected(r.getAs[Long]("doc_id"))))
    // the fixtures genuinely contain cross-doc duplicated spans
    assert(rows.map(_.getAs[Long]("n_dup")).sum > 0)
  }

  test("vec_kmeans_iter: full 16x64 grid, members partition the corpus, means in range") {
    val rows = SparkEntry.queries("vec_kmeans_iter")(spark, sf001).collect()
    val nVecs = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.length == 16 * 64)
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    assert(byCell.size == 16)
    byCell.foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to 64))
      // the member count is a cell property — identical across dimensions
      assert(g.map(_.getAs[Long]("n")).distinct.length == 1)
    }
    // cells partition the corpus: counts at pos=1 sum to the vector count
    assert(rows.filter(_.getAs[Int]("pos") == 1).map(_.getAs[Long]("n")).sum
      == nVecs)
    // updated centroid coordinates stay inside the data range [-1, 1]
    rows.foreach { r =>
      val mean = r.getAs[Long]("sum_e6").toDouble / (r.getAs[Long]("n") * 1e6)
      assert(math.abs(mean) <= 1.0, s"mean $mean out of range")
    }
  }

  test("window_gaps_islands: islands tile each user's active days without overlap") {
    val rows = SparkEntry.queries("window_gaps_islands")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val activeDays = graft.util.Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, g) =>
      val sorted = g.sortBy(_.getAs[Int]("island"))
      // island length is end - start + 1 and islands never touch or overlap
      sorted.foreach { r =>
        val len = r.getAs[java.sql.Date]("end_d").toLocalDate.toEpochDay -
          r.getAs[java.sql.Date]("start_d").toLocalDate.toEpochDay + 1
        assert(r.getAs[Long]("len_days") == len)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[java.sql.Date]("start_d").toLocalDate.toEpochDay >
            a.getAs[java.sql.Date]("end_d").toLocalDate.toEpochDay + 1)
        case _ =>
      }
      // islands cover exactly the user's distinct active days
      assert(sorted.map(_.getAs[Long]("len_days")).sum == activeDays(uid))
    }
    // gaps genuinely exist in the fixtures (otherwise one island per user)
    assert(rows.length > activeDays.size)
  }

  test("vec_ivf_recall: k=3 panel, hits bounded, percent consistent") {
    val rows = SparkEntry.queries("vec_ivf_recall")(spark, sf001).collect()
    assert(rows.length == graft.ops.Vectors.probeIds.length)
    rows.foreach { r =>
      val k = r.getAs[Long]("k"); val h = r.getAs[Long]("n_hit")
      assert(k == 3 && h >= 0 && h <= k)
      assert(r.getAs[Long]("recall_pct") == h * 100 / k)
    }
    // the index finds SOMETHING (sanity that the join keys line up)
    assert(rows.map(_.getAs[Long]("n_hit")).sum > 0)
  }

  test("agg_weighted_median: half the weight sits on each side of the answer") {
    val rows = SparkEntry.queries("agg_weighted_median")(spark, sf001).collect()
    assert(rows.length == 3)
    val raw = graft.util.Tables.lineitem(spark, sf001)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        floor(col("l_quantity")).cast("long").as("wt"))
      .collect().groupBy(_.getAs[String]("l_returnflag"))
    rows.foreach { r =>
      val g = raw(r.getAs[String]("l_returnflag"))
      val m = r.getAs[Long]("wmedian_cents")
      val tot = g.map(_.getAs[Long]("wt")).sum
      assert(r.getAs[Long]("total_weight") == tot)
      val below = g.filter(_.getAs[Long]("cents") <= m).map(_.getAs[Long]("wt")).sum
      val above = g.filter(_.getAs[Long]("cents") >= m).map(_.getAs[Long]("wt")).sum
      assert(below * 2 >= tot, s"below $below tot $tot")
      // everything strictly under m must be < half, else m isn't minimal
      val strictlyBelow = below - g.filter(_.getAs[Long]("cents") == m).map(_.getAs[Long]("wt")).sum
      assert(strictlyBelow * 2 < tot)
      assert(above * 2 >= tot || strictlyBelow * 2 < tot)
    }
  }

  test("etl_observe_metrics: observed metrics equal direct aggregates") {
    val r = SparkEntry.queries("etl_observe_metrics")(spark, sf001).collect()
    assert(r.length == 1)
    val ev = graft.util.Tables.events(spark, sf001)
    assert(r(0).getAs[Long]("n_rows") == ev.count())
    assert(r(0).getAs[Long]("neg_value") ==
      ev.filter(col("value") < 0).count())
  }

  test("etl_interpolate_linear: fills lie between neighbors, edges stay null") {
    val rows = SparkEntry.queries("etl_interpolate_linear")(spark, sf001).collect()
    assert(rows.nonEmpty)
    var interpolated = 0
    rows.groupBy(_.getAs[Long]("c_custkey")).foreach { case (_, g) =>
      val s = g.sortBy(_.getAs[java.sql.Date]("month").toLocalDate.toEpochDay)
      val obsIdx = s.zipWithIndex.filter(!_._1.isNullAt(2)).map(_._2)
      s.zipWithIndex.foreach { case (r, i) =>
        if (!r.isNullAt(2)) { // observed: value passes through exactly
          assert(r.getAs[Long]("interp_den") == 1L)
          assert(r.getAs[Long]("interp_num") == r.getAs[Long]("n_obs"))
        } else if (obsIdx.exists(_ < i) && obsIdx.exists(_ > i)) {
          interpolated += 1
          val lo = obsIdx.filter(_ < i).max; val hi = obsIdx.filter(_ > i).min
          val a = s(lo).getAs[Long]("n_obs"); val b = s(hi).getAs[Long]("n_obs")
          val v = r.getAs[Long]("interp_num").toDouble / r.getAs[Long]("interp_den")
          assert(v >= math.min(a, b) - 1e-9 && v <= math.max(a, b) + 1e-9,
            s"interp $v outside [$a,$b]")
          assert(r.getAs[Long]("interp_den") == hi - lo)
        } else { // leading/trailing edge: no extrapolation
          assert(r.isNullAt(3) && r.isNullAt(4))
        }
      }
    }
    assert(interpolated > 0, "fixtures contain no interior gaps?")
  }

  test("agg_corr_spearman matches a driver-side brute force on the panel") {
    val rows = SparkEntry.queries("agg_corr_spearman")(spark, sf001).collect()
    assert(rows.length == 3)
    val base = graft.util.Tables.lineitem(spark, sf001)
      .where(pmod(col("l_orderkey"), lit(100)) === 0)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("x"),
        floor(col("l_discount") * 100).cast("long").as("y"))
      .collect().groupBy(_.getString(0))
    def ranks2(vs: Array[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val minRank = sorted.indexOf(v) + 1L
        val ties = vs.count(_ == v).toLong
        v -> (2 * minRank + ties - 1)
      }.toMap
    }
    rows.foreach { r =>
      val g = base(r.getAs[String]("l_returnflag"))
      val xs = g.map(_.getAs[Long]("x")); val ys = g.map(_.getAs[Long]("y"))
      val rx = { val m = ranks2(xs); xs.map(m) }
      val ry = { val m = ranks2(ys); ys.map(m) }
      val n = BigInt(g.length)
      def s(a: Array[Long]) = a.map(BigInt(_)).sum
      def s2(a: Array[Long], b: Array[Long]) =
        a.zip(b).map { case (p, q) => BigInt(p) * q }.sum
      assert(BigInt(r.getAs[Long]("n")) == n)
      assert(BigInt(r.getAs[Long]("rho_num")) == n * s2(rx, ry) - s(rx) * s(ry))
      assert(BigInt(r.getAs[Long]("den_x")) == n * s2(rx, rx) - s(rx) * s(rx))
      assert(BigInt(r.getAs[Long]("den_y")) == n * s2(ry, ry) - s(ry) * s(ry))
      // Cauchy-Schwarz: rho² ≤ 1 as exact integers
      val num = BigInt(r.getAs[Long]("rho_num"))
      assert(num * num <= BigInt(r.getAs[Long]("den_x")) * BigInt(r.getAs[Long]("den_y")))
    }
  }

  test("etl_mix_sources: curated source kept whole, rates track thresholds") {
    val rows = SparkEntry.queries("etl_mix_sources")(spark, sf001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"), r.getAs[Long]("rate_e4"))).toMap
    assert(rows.nonEmpty)
    val (t0, k0, r0) = rows("src0")
    assert(k0 == t0 && r0 == 10000) // 100% source survives entirely
    rows.foreach { case (_, (t, k, r)) =>
      assert(k <= t && r == k * 10000 / t)
    }
    // md5 buckets are uniform enough that src1 (target 50%) lands within
    // a generous band even on 25-doc groups
    val (_, _, r1) = rows("src1")
    assert(r1 > 2000 && r1 < 8000, s"src1 rate $r1")
  }

  test("set multiset variants: |EXCEPT ALL| - |INTERSECT ALL| arithmetic holds") {
    val o = graft.util.Tables.orders(spark, sf001)
    val nO = o.filter(col("o_orderstatus") === "O").count()
    val exAll = SparkEntry.queries("set_except_all")(spark, sf001).count()
    val inAll = SparkEntry.queries("set_intersect_all")(spark, sf001).count()
    // every 'O' occurrence is either matched (intersect) or surplus (except)
    assert(exAll + inAll == nO)
    // multiset results dominate their distinct counterparts
    assert(exAll >= SparkEntry.queries("set_except")(spark, sf001).count())
    assert(inAll >= SparkEntry.queries("set_intersect")(spark, sf001).count())
  }

  test("stream_static_join equals the batch broadcast join") {
    val got = SparkEntry.queries("stream_static_join")(spark, sf001).collect()
    val dim = graft.util.Tables.customer(spark, sf001)
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = graft.util.Tables.events(spark, sf001)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n") ==
        batch((r.getAs[String]("c_mktsegment"), r.getAs[String]("event_type"))))
    }
    assert(got.length == batch.size)
  }

  test("winnowing guarantee: a shared 8-word run yields a shared fingerprint") {
    import spark.implicits._
    // k=4, w=5 ⇒ any common substring of k+w-1 = 8 words MUST share a
    // fingerprint, at ANY offset (the property fixed-stride segments lack)
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 b2 b3 b4 b5 $shared"), // different offset
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12")).toDF("doc_id", "text")
    val r = graft.ops.Text.winnowOf(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_shared")).toMap
    assert(r(1L) >= 1 && r(2L) >= 1, r.toString)
    assert(r(3L) == 0, "disjoint doc must share nothing")
  }

  test("stats_equi_depth_hist: 16 near-equal buckets tiling the value range") {
    val rows = SparkEntry.queries("stats_equi_depth_hist")(spark, sf001)
      .collect().sortBy(_.getAs[Int]("bucket"))
    assert(rows.map(_.getAs[Int]("bucket")).toSeq == (0 until 16))
    val n = rows.map(_.getAs[Long]("n_rows")).sum
    rows.foreach { r => // equal depth within the integer-division remainder
      assert(math.abs(r.getAs[Long]("n_rows") - n / 16) <= 1)
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
    }
    // boundaries are non-decreasing across buckets (they tile the range)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents") ||
          a.getAs[Long]("hi_cents") == b.getAs[Long]("lo_cents"))
      case _ =>
    }
  }

  test("dedup_band_sweep: candidates and dups are monotone in band count") {
    val rows = SparkEntry.queries("dedup_band_sweep")(spark, sf001)
      .collect().sortBy(_.getAs[Int]("bands"))
    assert(rows.map(r => (r.getAs[Int]("bands"), r.getAs[Int]("band_width")))
      .toSeq == Seq((1, 8), (2, 4), (4, 2), (8, 1)))
    val cands = rows.map(_.getAs[Long]("n_cands"))
    val dups = rows.map(_.getAs[Long]("n_dup"))
    // width-r collisions imply width-1 collisions: both series non-decreasing
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b }, cands.mkString(","))
    assert(dups.zip(dups.tail).forall { case (a, b) => a <= b }, dups.mkString(","))
    rows.foreach(r => assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_cands")))
    // narrow bands pay in candidate volume: the ceiling config is far wider
    assert(cands.last > dups.last * 10, s"fixtures too clean: ${cands.last}")
    // sf0.001 has no over-dense buckets: the hot-bucket cap must be a no-op
    // here (its audit column reads 0), so the sweep is exact at this scale
    rows.foreach(r => assert(r.getAs[Int]("n_hot_buckets") == 0))
  }

  test("vec_ivf_nprobe_sweep: recall is monotone non-decreasing in nprobe") {
    val rows = SparkEntry.queries("vec_ivf_nprobe_sweep")(spark, sf001)
      .collect().sortBy(_.getAs[Int]("nprobe"))
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8))
    rows.foreach(r => assert(r.getAs[Long]("k_total") ==
      3L * graft.ops.Vectors.probeIds.length))
    val recalls = rows.map(_.getAs[Long]("n_hit"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      recalls.mkString(","))
    // widening the search must eventually help on this panel
    assert(recalls.last > recalls.head)
  }

  test("agg_gini_diversity: exact rational in [0,1), recomputable from raw counts") {
    val rows = SparkEntry.queries("agg_gini_diversity")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val raw = spark.read.parquet(s"$sf001/documents.parquet")
      .groupBy(col("source"), col("lang")).count().collect()
      .groupBy(_.getAs[String]("source"))
    rows.foreach { r =>
      val cs = raw(r.getAs[String]("source")).map(_.getAs[Long]("count"))
      val n = cs.sum
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_langs") == cs.length)
      assert(r.getAs[Long]("gini_num") == n * n - cs.map(c => c * c).sum)
      assert(r.getAs[Long]("gini_den") == n * n)
      assert(r.getAs[Long]("gini_num") >= 0 &&
        r.getAs[Long]("gini_num") < r.getAs[Long]("gini_den"))
    }
  }
}
