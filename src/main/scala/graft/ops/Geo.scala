package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** GEOSPATIAL operators (round 16b) — the one capability family the
  * registry had zero coverage of, and a core telecom-estate workload
  * ([R1]: cell sites, fiber nodes and subscribers all carry
  * coordinates): grid-cell density aggregation, point-in-bbox spatial
  * join, and k-nearest-neighbor search over point sets.
  *
  * Coordinates are DERIVED deterministically from the fixture keys as
  * integer MICRODEGREES (the fixtures carry no lat/lon columns; the
  * same multiplicative-hash expression runs on both engines over
  * positive keys, where Spark's `%` and DuckDB's `%` agree), and every
  * distance/bin computation stays in BIGINT — squared equirectangular
  * microdegree distances bound at ~1.6e15, far inside Long — so no
  * transcendental (haversine sin/cos) ever runs: libm-vs-java.lang.Math
  * last-ulp drift is the classic cross-engine geo hash-mismatch, and
  * quantized-integer geometry is also what a 100 TB pipeline wants
  * (grid cells ARE the shuffle key; exact great-circle refinement is a
  * final per-candidate step out of scope of the skip/join shape).
  *
  * Scale shapes: grid aggregation is one map-side-combinable shuffle on
  * the cell key; the bbox join broadcasts the O(regions) box dim; KNN
  * scans linearly under a BOUNDED probe panel (the vec_knn_* pattern)
  * with an exact BIGINT distance, ranked per probe with a deterministic
  * tie-break. */
object Geo {

  // ---- frame-generic kernels (exposed via graft.api.Graft) ----

  /** Snap integer-microdegree coordinates to their square grid cell:
    * shift by the WGS84 domain bound FIRST so the division runs on
    * non-negative values, where truncation and floor agree — the same
    * expression is valid SQL on any engine. `cell` is the cell edge in
    * microdegrees (1000000 = 1°). */
  def withGridCell(points: DataFrame, latCol: String, lonCol: String,
      cell: Long = 1000000L): DataFrame =
    points
      .withColumn("glat", expr(s"($latCol + 90000000) div $cell"))
      .withColumn("glon", expr(s"($lonCol + 180000000) div $cell"))

  /** Assign points to containing boxes (inclusive bounds), LEFT from
    * the broadcast box dim so empty boxes survive. `boxes` carries
    * latlo/lathi/lonlo/lonhi in microdegrees plus any id columns. */
  def bboxAssign(points: DataFrame, boxes: DataFrame,
      latCol: String = "lat", lonCol: String = "lon"): DataFrame =
    broadcast(boxes).join(points,
      col(latCol) >= col("latlo") && col(latCol) <= col("lathi") &&
      col(lonCol) >= col("lonlo") && col(lonCol) <= col("lonhi"), "left")

  /** k nearest points per probe by EXACT squared equirectangular
    * microdegree distance (BIGINT — no transcendental, bit-stable),
    * deterministic (d2, id) tie-break. Probes must be a bounded panel
    * (they broadcast); points stream through the linear scan. */
  def knnPoints(points: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "c_custkey", probeCol: String = "s_suppkey")
      : DataFrame = {
    val d2 = (col("lat") - col("plat")) * (col("lat") - col("plat")) +
      (col("lon") - col("plon")) * (col("lon") - col("plon"))
    val w = Window.partitionBy(col(probeCol))
      .orderBy(col("d2"), col(idCol))
    broadcast(probes).crossJoin(points)
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Derived point: integer microdegrees from a positive key. The key
    * reduces mod a prime BEFORE the Knuth multiplier so (a) the product
    * never overflows BIGINT on any engine (DuckDB errors on overflow
    * rather than wrapping) and (b) the hash wraps — and therefore
    * spreads over the whole domain — even for small consecutive keys
    * (a bare k*small_prime stays in one corner for k <= a few
    * thousand, which left the sf0.001 fixture degenerate). */
  private def latOf(k: Column): Column =
    ((k % 1000003L) * lit(2654435761L)) % 17000000L - 8500000L
  private def lonOf(k: Column): Column =
    ((k % 999983L) * lit(2654435761L)) % 36000000L - 18000000L
  /** The same derivation as oracle SQL text. */
  private def latSql(k: String) =
    s"(($k % 1000003) * 2654435761) % 17000000 - 8500000"
  private def lonSql(k: String) =
    s"(($k % 999983) * 2654435761) % 36000000 - 18000000"

  private def points(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf).select(col("c_custkey"),
      latOf(col("c_custkey")).as("lat"), lonOf(col("c_custkey")).as("lon"),
      floor(col("c_acctbal") * 100).cast("long").as("cents"))

  /** GRID DENSITY (`geo_grid_agg`): snap every point to its 1°×1° cell
    * and aggregate — the standard first pass of any planetary-scale
    * point workload (heat maps, coverage, densification targets). Cells
    * shift to non-negative BEFORE the integer division so truncating
    * `div` (Spark) and floor `//` (DuckDB) agree. Top-20 densest cells,
    * fully ordered for determinism. */
  def geoGridAgg(spark: SparkSession, sf: String): DataFrame =
    withGridCell(points(spark, sf), "lat", "lon")
      .groupBy(col("glat"), col("glon"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("c_custkey")).as("first_cust"))
      .orderBy(col("n").desc, col("glat"), col("glon"))
      .limit(20)

  /** POINT-IN-BBOX JOIN (`geo_bbox_join`): service-area boxes derived
    * per nation, customers assigned by containment — the broadcast
    * range join every coverage/jurisdiction assignment runs. LEFT from
    * the box dim so empty areas report 0. */
  def geoBboxJoin(spark: SparkSession, sf: String): DataFrame = {
    val boxes = nation(spark, sf).select(col("n_name"),
      (((col("n_nationkey") * 701) % 24 - 12) * 1000000L).as("latlo"),
      (((col("n_nationkey") * 907) % 56 - 28) * 1000000L).as("lonlo"))
      .withColumn("lathi", col("latlo") + 8000000L)
      .withColumn("lonhi", col("lonlo") + 12000000L)
    bboxAssign(points(spark, sf), boxes)
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_inside"),
        coalesce(min(col("c_custkey")), lit(-1L)).as("first_cust"))
      .orderBy(col("n_name"))
  }

  /** KNN (`geo_knn_points`): 5 nearest customers to each of a BOUNDED
    * 3-probe panel (supplier sites), by exact squared equirectangular
    * microdegree distance (BIGINT — deltas ≤ 3.6e7, squares ≤ 1.3e15),
    * deterministic (distance, custkey) tie-break. The linear scan under
    * a bounded panel is the vec_knn_* brute baseline shape; the grid
    * cell of `geo_grid_agg` is the bucketing key a prefiltered variant
    * shuffles on at corpus scale. */
  def geoKnnPoints(spark: SparkSession, sf: String): DataFrame = {
    val probes = supplier(spark, sf).where(col("s_suppkey") <= 3)
      .select(col("s_suppkey"),
        latOf(col("s_suppkey") * 37L).as("plat"),
        lonOf(col("s_suppkey") * 37L).as("plon"))
    knnPoints(points(spark, sf), probes, k = 5)
      .select(col("s_suppkey"), col("rank"), col("c_custkey"), col("d2"))
      .orderBy(col("s_suppkey"), col("rank"))
  }

  /** KNN WITH GRID PREFILTER (`geo_knn_prefiltered`, round 17 — VERDICT
    * r16 next #7, the rung 2 this file's own header promised: "the grid
    * cell is the bucketing key a prefiltered variant shuffles on"):
    * the SAME top-5 answer as [[geoKnnPoints]], produced the way a
    * 100 TB point table must — each probe explodes its (2R+1)² grid-cell
    * NEIGHBORHOOD into candidate cell keys that EQUI-JOIN the
    * cell-snapped points on (glat, glon) (the shuffle/bucket key; a
    * Cartesian scan of the corpus never happens), then the exact BIGINT
    * distance refines and ranks.
    *
    * Exactness is PROVED, not hoped: a point outside the block differs
    * from the probe by ≥ R+1 cells on some axis, hence by > R·C µdeg in
    * that coordinate, so its d2 > (R·C)² — the runtime REQUIRE asserts
    * every returned distance is ≤ (R·C)², which makes the block's top-5
    * the global top-5. Plan REQUIREs pin the shape: no Cartesian/BNLJ
    * node anywhere, and the candidate join is keyed on the grid cell. */
  def geoKnnPrefiltered(spark: SparkSession, sf: String): DataFrame =
    geoKnnPrefilteredChecked(spark, sf)

  /** The UNCHECKPOINTED candidate-join plan — exposed for GeoSpec's plan
    * assertions (review round 17 second pass: the key returns a
    * localCheckpoint-backed frame whose plan is a sort over an RDD scan,
    * which would make a spec-side no-all-pairs check vacuous). */
  private[graft] def geoKnnPrefilteredPlan(spark: SparkSession, sf: String)
      : DataFrame = {
    val C = 1000000L; val R = 8
    val pts = withGridCell(points(spark, sf), "lat", "lon", C)
    val offs = (-R to R).map(o => lit(o.toLong))
    val cand = supplier(spark, sf).where(col("s_suppkey") <= 3)
      .select(col("s_suppkey"),
        latOf(col("s_suppkey") * 37L).as("plat"),
        lonOf(col("s_suppkey") * 37L).as("plon"))
      .withColumn("dglat", explode(array(offs: _*)))
      .withColumn("dglon", explode(array(offs: _*)))
      .select(col("s_suppkey"), col("plat"), col("plon"),
        (expr(s"(plat + 90000000) div $C") + col("dglat")).as("glat"),
        (expr(s"(plon + 180000000) div $C") + col("dglon")).as("glon"))
    val d2 = (col("lat") - col("plat")) * (col("lat") - col("plat")) +
      (col("lon") - col("plon")) * (col("lon") - col("plon"))
    val w = Window.partitionBy(col("s_suppkey"))
      .orderBy(col("d2"), col("c_custkey"))
    pts.join(cand, Seq("glat", "glon")) // equi-join on the CELL KEY
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("s_suppkey"), col("rank"), col("c_custkey"), col("d2"))
  }

  /** The exactness bound the plan builder's R and C imply. */
  private[graft] val KnnBlockBound: Long = 8L * 1000000L * 8L * 1000000L

  /** Probe-panel size per (session, sf) — a fixture constant, counted once. */
  private val nProbesMemo = graft.util.Memos.memo[Long]

  private def geoKnnPrefilteredChecked(spark: SparkSession, sf: String)
      : DataFrame = {
    val out = geoKnnPrefilteredPlan(spark, sf)
    // plan shape: candidate generation made this an EQUI join on the
    // grid cell — no all-pairs node may appear anywhere in the plan
    // (unwrap AQE: the adaptive root is a leaf to collect())
    val plan = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    val cart = plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    require(cart.isEmpty, s"prefiltered KNN must never plan an all-pairs join")
    val cellKeyed = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.leftKeys.nonEmpty => j
    }
    require(cellKeyed.nonEmpty, "the candidate join must be keyed (cell equi-join)")
    // exactness certificate: every returned distance sits inside the
    // block's guaranteed radius, so the block top-5 IS the global top-5
    // — PROVIDED the block produced all 5 ranks for every probe (ADVICE
    // r18: a sparse fixture whose (2R+1)² block holds <5 candidates
    // would satisfy the distance bound while silently missing the
    // global ranks 4-5, and a probe with an EMPTY block would vanish
    // from the output entirely). Both halves land in ONE agg action on
    // ONE materialization serving certificate and caller alike.
    val rows = out.localCheckpoint()
    // the probe-panel size is a constant of the fixture — count it once
    // per (session, sf) so the certificate's data path stays the ONE
    // agg action below (round-18 review)
    val nProbes = graft.util.Memos.cached(nProbesMemo, spark, sf)(
      supplier(spark, sf).where(col("s_suppkey") <= 3).count())
    val cert = rows.agg(max(col("d2")), count(lit(1))).head()
    require(!cert.isNullAt(0),
      "fixture: the probe panel found no candidates in the cell block")
    val worst = cert.getLong(0)
    require(worst <= KnnBlockBound,
      s"5th-nearest d2 $worst exceeds the (R*C)^2 block bound $KnnBlockBound " +
        "— widen R (the fixture density made the block too small)")
    require(cert.getLong(1) == nProbes * 5,
      s"block top-5 incomplete: ${cert.getLong(1)} rows for $nProbes probes " +
        "— some probe's cell block holds <5 candidates; widen R")
    rows.orderBy(col("s_suppkey"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_grid_agg" -> geoGridAgg,
    "geo_bbox_join" -> geoBboxJoin,
    "geo_knn_points" -> geoKnnPoints,
    "geo_knn_prefiltered" -> geoKnnPrefiltered)

  private val ptsSql: String =
    s"""SELECT c_custkey, ${latSql("c_custkey")} AS lat,
       |  ${lonSql("c_custkey")} AS lon,
       |  CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
       |FROM customer""".stripMargin

  val oracle: Map[String, String] = Map(
    "geo_grid_agg" ->
      s"""WITH p AS ($ptsSql)
         |SELECT (lat + 90000000) // 1000000 AS glat,
         |  (lon + 180000000) // 1000000 AS glon,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
         |  CAST(MIN(c_custkey) AS BIGINT) AS first_cust
         |FROM p GROUP BY 1, 2
         |ORDER BY n DESC, glat, glon LIMIT 20""".stripMargin,

    "geo_bbox_join" ->
      s"""WITH p AS ($ptsSql),
         |b AS (
         |  SELECT n_name,
         |    ((n_nationkey * 701) % 24 - 12) * 1000000 AS latlo,
         |    ((n_nationkey * 907) % 56 - 28) * 1000000 AS lonlo
         |  FROM nation)
         |SELECT b.n_name,
         |  CAST(COUNT(p.c_custkey) AS BIGINT) AS n_inside,
         |  CAST(COALESCE(MIN(p.c_custkey), -1) AS BIGINT) AS first_cust
         |FROM b LEFT JOIN p
         |  ON p.lat BETWEEN b.latlo AND b.latlo + 8000000
         | AND p.lon BETWEEN b.lonlo AND b.lonlo + 12000000
         |GROUP BY b.n_name
         |ORDER BY b.n_name""".stripMargin,

    // the prefiltered variant must return EXACTLY the brute answer —
    // one oracle text, two plans (candidate-join vs broadcast scan)
    "geo_knn_prefiltered" ->
      s"""WITH p AS ($ptsSql),
         |pr AS (
         |  SELECT s_suppkey, ${latSql("(s_suppkey * 37)")} AS plat,
         |    ${lonSql("(s_suppkey * 37)")} AS plon
         |  FROM supplier WHERE s_suppkey <= 3),
         |d AS (
         |  SELECT pr.s_suppkey, p.c_custkey,
         |    (p.lat - pr.plat) * (p.lat - pr.plat) +
         |    (p.lon - pr.plon) * (p.lon - pr.plon) AS d2
         |  FROM pr, p),
         |r AS (
         |  SELECT s_suppkey, c_custkey, d2,
         |    ROW_NUMBER() OVER (PARTITION BY s_suppkey
         |      ORDER BY d2, c_custkey) AS rank
         |  FROM d)
         |SELECT s_suppkey, CAST(rank AS INT) AS rank, c_custkey,
         |  CAST(d2 AS BIGINT) AS d2
         |FROM r WHERE rank <= 5
         |ORDER BY s_suppkey, rank""".stripMargin,

    "geo_knn_points" ->
      s"""WITH p AS ($ptsSql),
         |pr AS (
         |  SELECT s_suppkey, ${latSql("(s_suppkey * 37)")} AS plat,
         |    ${lonSql("(s_suppkey * 37)")} AS plon
         |  FROM supplier WHERE s_suppkey <= 3),
         |d AS (
         |  SELECT pr.s_suppkey, p.c_custkey,
         |    (p.lat - pr.plat) * (p.lat - pr.plat) +
         |    (p.lon - pr.plon) * (p.lon - pr.plon) AS d2
         |  FROM pr, p),
         |r AS (
         |  SELECT s_suppkey, c_custkey, d2,
         |    ROW_NUMBER() OVER (PARTITION BY s_suppkey
         |      ORDER BY d2, c_custkey) AS rank
         |  FROM d)
         |SELECT s_suppkey, CAST(rank AS INT) AS rank, c_custkey,
         |  CAST(d2 AS BIGINT) AS d2
         |FROM r WHERE rank <= 5
         |ORDER BY s_suppkey, rank""".stripMargin)
}
