package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Time-series and graph analytics (round 16b) — two capability
  * families a telecom ETL estate ([R1]) runs daily that the registry
  * did not yet cover as first-class keys: regular-grid RESAMPLING of an
  * irregular event stream (gap-fill + carry-forward, linear
  * interpolation) and ITERATIVE GRAPH analytics over a derived
  * relationship graph (PageRank, triangle counting).
  *
  * Oracle discipline (SURVEY §2.0 D-rules): every output column is
  * BIGINT/string/timestamp — money lands as `floor(value*100)` cents
  * and PageRank mass as integer MILLIONTHS with truncating division on
  * both engines (positive operands, so Spark's `div` and DuckDB's `//`
  * agree), keeping the driver's string-compare bit-exact with no
  * float-summation-order exposure.
  *
  * Scale shape: the resample grid is O(time range × types), not
  * O(events) — the heavy side aggregates BEFORE joining the grid, and
  * the forward-fill window partitions by type over the bounded grid.
  * PageRank is the standard per-iteration message-pass (contrib join +
  * groupBy(dst) shuffle); the rank side of each join is O(nodes) and
  * broadcasts, so at 10⁹ edges the shuffle carries contributions only.
  */
object Analytics {

  /** Event measures in exact cents on an hour grid: one deterministic
    * double op (`value*100` then floor) per row — no float aggregation
    * ever happens; all sums are over BIGINTs. */
  private def hourlyCents(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf).select(
      col("event_type"),
      date_trunc("hour", col("ts")).as("h"),
      floor(col("value") * 100).cast("long").as("c"))

  /** GAP-FILL / RESAMPLE (`ts_gapfill`): aggregate an irregular event
    * stream onto the full hour grid spanning the table, with missing
    * hours carried forward (last-observation-carried-forward on the
    * hourly cents total, 0 before the first observation). The grid
    * derives from the GLOBAL min/max hour crossed with the distinct
    * types, so both engines build the identical frame. */
  def tsGapfill(spark: SparkSession, sf: String): DataFrame = {
    val e = hourlyCents(spark, sf)
    val agg = e.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("cents"))
    val grid = e.select(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("h"))
      .crossJoin(e.select(col("event_type")).distinct())
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(last(col("cents"), ignoreNulls = true).over(w), lit(0L))
          .as("filled"))
      .orderBy(col("event_type"), col("h"))
  }

  /** LINEAR INTERPOLATION (`ts_interpolate`): hours with no
    * observations take the straight line between the PREVIOUS and NEXT
    * observed hourly totals (endpoints beyond the observed range carry
    * the nearest observation). The interpolation itself is ONE double
    * expression of identical shape on both engines — IEEE ops on
    * identical operands are exactly rounded, so `floor` of it is
    * bit-stable — and every output is BIGINT. */
  def tsInterpolate(spark: SparkSession, sf: String): DataFrame = {
    val e = hourlyCents(spark, sf)
    val agg = e.groupBy(col("event_type"), col("h"))
      .agg(sum(col("c")).as("cents"))
    val grid = e.select(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("h"))
      .crossJoin(e.select(col("event_type")).distinct())
    val joined = grid.join(agg, Seq("event_type", "h"), "left")
      .withColumn("eh", unix_timestamp(col("h")))
    val back = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    joined
      .withColumn("pc", last(col("cents"), ignoreNulls = true).over(back))
      .withColumn("ph", last(when(col("cents").isNotNull, col("eh")),
        ignoreNulls = true).over(back))
      .withColumn("nc", first(col("cents"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(when(col("cents").isNotNull, col("eh")),
        ignoreNulls = true).over(fwd))
      .select(col("event_type"), col("h"),
        when(col("cents").isNotNull, col("cents"))
          .when(col("pc").isNull, col("nc"))
          .when(col("nc").isNull, col("pc"))
          .otherwise(floor(col("pc") +
            (col("nc") - col("pc")) * ((col("eh") - col("ph")) /
              (col("nh") - col("ph")))).cast("long"))
          .as("cents"))
      .orderBy(col("event_type"), col("h"))
  }

  /** The derived relationship graph both graph keys run on: nation →
    * nation "trades with" edges from customer ⋈ orders ⋈ lineitem ⋈
    * supplier, deduplicated — a deterministic O(25²)-node graph whose
    * EDGE DERIVATION is the data-scale part (the joins prune to the two
    * key columns before the distinct). */
  private def tradeEdges(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
      .join(orders(spark, sf).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(supplier(spark, sf)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .distinct()

  /** PAGERANK (`graph_pagerank`): 3 synchronous iterations over the
    * trade graph, damping 0.85, in integer MILLIONTHS — contributions
    * are `rank div outdeg` (truncating; positive, so both engines
    * agree) and sums are BIGINT-exact, so the result is bit-stable
    * with no float order-dependence. Dangling mass is dropped (the
    * standard simplified formulation); isolated nodes settle at the
    * teleport floor 150000. Per-iteration shape: edges join an
    * O(nodes) broadcast rank table, shuffle once on dst. */
  def graphPagerank(spark: SparkSession, sf: String): DataFrame = {
    val edges = tradeEdges(spark, sf).cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val nodes = nation(spark, sf)
      .select(col("n_nationkey").as("id"), col("n_name"))
    var r = nodes.select(col("id"), lit(1000000L).as("r"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(broadcast(r), col("id") === col("src"))
        .join(broadcast(deg), "src")
        .select(col("dst"), expr("r div d").as("m"))
        .groupBy(col("dst")).agg(sum(col("m")).as("s"))
      r = nodes.select(col("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(850 * coalesce(s, 0)) div 1000")).as("r"))
    }
    nodes.join(r, "id")
      .select(col("n_name"), col("r").as("rank_millionths"))
      .orderBy(col("rank_millionths").desc, col("n_name"))
  }

  /** TRIANGLE COUNT (`graph_triangles`): undirected triangles in the
    * symmetrized self-loop-free trade graph, counted once each via the
    * canonical a < b < c ordered two-hop join — the shape that scales
    * (each join leg is the ordered edge list, no row explosion beyond
    * the wedge set). Output: one BIGINT. */
  def graphTriangles(spark: SparkSession, sf: String): DataFrame = {
    val e0 = tradeEdges(spark, sf)
    val und = e0.select(col("src").as("a"), col("dst").as("b"))
      .union(e0.select(col("dst").as("a"), col("src").as("b")))
      .where(col("a") < col("b")).distinct()
    val ab = und.select(col("a"), col("b"))
    val bc = und.select(col("a").as("b2"), col("b").as("c"))
    val ac = und.select(col("a").as("a3"), col("b").as("c3"))
    ab.join(bc, col("b") === col("b2"))
      .join(ac, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_gapfill" -> tsGapfill,
    "ts_interpolate" -> tsInterpolate,
    "graph_pagerank" -> graphPagerank,
    "graph_triangles" -> graphTriangles)

  val oracle: Map[String, String] = Map(
    "ts_gapfill" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(floor(value * 100) AS BIGINT) AS c
        |  FROM events),
        |a AS (
        |  SELECT event_type, h, COUNT(*) AS n, SUM(c) AS cents
        |  FROM e GROUP BY 1, 2),
        |b AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
        |g AS (
        |  SELECT t.event_type, gs.h
        |  FROM (SELECT DISTINCT event_type FROM e) t,
        |    (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |     FROM b) gs)
        |SELECT g.event_type, g.h,
        |  CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
        |  CAST(COALESCE(LAST_VALUE(a.cents IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |    AS BIGINT) AS filled
        |FROM g LEFT JOIN a ON a.event_type = g.event_type AND a.h = g.h
        |ORDER BY g.event_type, g.h""".stripMargin,

    "ts_interpolate" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(floor(value * 100) AS BIGINT) AS c
        |  FROM events),
        |a AS (SELECT event_type, h, SUM(c) AS cents FROM e GROUP BY 1, 2),
        |b AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
        |g AS (
        |  SELECT t.event_type, gs.h
        |  FROM (SELECT DISTINCT event_type FROM e) t,
        |    (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |     FROM b) gs),
        |j AS (
        |  SELECT g.event_type, g.h, a.cents,
        |    CAST(epoch(g.h) AS BIGINT) AS eh
        |  FROM g LEFT JOIN a ON a.event_type = g.event_type AND a.h = g.h),
        |w AS (
        |  SELECT event_type, h, cents, eh,
        |    LAST_VALUE(cents IGNORE NULLS) OVER bk AS pc,
        |    LAST_VALUE(CASE WHEN cents IS NOT NULL THEN eh END IGNORE NULLS)
        |      OVER bk AS ph,
        |    FIRST_VALUE(cents IGNORE NULLS) OVER fw AS nc,
        |    FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN eh END IGNORE NULLS)
        |      OVER fw AS nh
        |  FROM j
        |  WINDOW bk AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  fw AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, h,
        |  CAST(CASE
        |    WHEN cents IS NOT NULL THEN cents
        |    WHEN pc IS NULL THEN nc
        |    WHEN nc IS NULL THEN pc
        |    ELSE CAST(floor(pc + (nc - pc) * ((eh - ph) / (nh - ph)))
        |      AS BIGINT)
        |  END AS BIGINT) AS cents
        |FROM w
        |ORDER BY event_type, h""".stripMargin,

    "graph_pagerank" ->
      """WITH edges AS (
        |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        |  FROM customer c
        |  JOIN orders o ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey),
        |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
        |r0 AS (SELECT n_nationkey AS id, CAST(1000000 AS BIGINT) AS r
        |  FROM nation),
        |r1 AS (
        |  SELECT n.id,
        |    150000 + (850 * COALESCE(SUM(p.r // deg.d), 0)) // 1000 AS r
        |  FROM r0 n
        |  LEFT JOIN edges e ON e.dst = n.id
        |  LEFT JOIN r0 p ON p.id = e.src
        |  LEFT JOIN deg ON deg.src = e.src
        |  GROUP BY n.id),
        |r2 AS (
        |  SELECT n.id,
        |    150000 + (850 * COALESCE(SUM(p.r // deg.d), 0)) // 1000 AS r
        |  FROM r0 n
        |  LEFT JOIN edges e ON e.dst = n.id
        |  LEFT JOIN r1 p ON p.id = e.src
        |  LEFT JOIN deg ON deg.src = e.src
        |  GROUP BY n.id),
        |r3 AS (
        |  SELECT n.id,
        |    150000 + (850 * COALESCE(SUM(p.r // deg.d), 0)) // 1000 AS r
        |  FROM r0 n
        |  LEFT JOIN edges e ON e.dst = n.id
        |  LEFT JOIN r2 p ON p.id = e.src
        |  LEFT JOIN deg ON deg.src = e.src
        |  GROUP BY n.id)
        |SELECT nation.n_name, CAST(r3.r AS BIGINT) AS rank_millionths
        |FROM nation JOIN r3 ON r3.id = nation.n_nationkey
        |ORDER BY rank_millionths DESC, n_name""".stripMargin,

    "graph_triangles" ->
      """WITH e0 AS (
        |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
        |  FROM customer c
        |  JOIN orders o ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey),
        |und AS (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT src AS a, dst AS b FROM e0
        |    UNION ALL
        |    SELECT dst AS a, src AS b FROM e0)
        |  WHERE a < b)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM und ab
        |JOIN und bc ON bc.a = ab.b
        |JOIN und ac ON ac.a = ab.a AND ac.b = bc.b""".stripMargin)
}
