package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Tables._
import graft.util.Determinism._

/** SURVEY.md §2 categories A–G: scans, filters, joins, aggregation, sort,
  * set ops. Spark-first: declarative DataFrame plans, Catalyst picks the
  * physical strategy; explicit `broadcast()` only on the tiny dimensions.
  *
  * The reference (/root/reference/README.md:1) is an AWS ETL pipeline with no
  * code in its tree; semantics here follow SURVEY.md §2's declared contract.
  *
  * Determinism: every output obeys SURVEY §2.0 rules D1–D4 (decimal aggs,
  * total order on unique keys, no raw post-aggregation doubles, DATE/epoch
  * timestamps) so the DuckDB oracle hash-matches bit-for-bit.
  */
object Relational {

  private def ntz(y: Int, m: Int, d: Int): Column =
    lit(LocalDateTime.of(y, m, d, 0, 0))

  // ---------------------------------------------------------------- A. scans

  /** Column-pruned scan: the parquet reader must only materialize the four
    * projected columns (ReadSchema assertion lives in the test suite). */
  def scanProject(spark: SparkSession, sf: String): DataFrame =
    lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        asDate(col("l_shipdate")).as("ship_date"))
      // (l_orderkey, l_linenumber) is NOT unique in the fixtures; price+date
      // complete the total order so the LIMIT boundary is deterministic (D2).
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("ship_date"))
      .limit(100)

  /** Selective predicate that must reach the parquet scan as PushedFilters
    * (row-group min/max skipping at scale). */
  def scanFilterPushdown(spark: SparkSession, sf: String): DataFrame =
    lineitem(spark, sf)
      .where(col("l_shipdate") >= ntz(1996, 1, 1) &&
        col("l_shipdate") < ntz(1996, 7, 1) && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** Load-side of ETL: write a conformed projection to parquet, read it back,
    * aggregate. Roundtrip is identity so the oracle runs on the source. */
  def sinkParquetRoundtrip(spark: SparkSession, sf: String): DataFrame = {
    val path = s"${graft.util.Scratch.dir("rt", sf)}/lineitem_rt"
    lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), sum2(col("l_quantity")).as("sum_qty"),
        sum2(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------- B. projection / predicates

  def filterCompound(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .where((col("o_orderstatus") === "O" || col("o_totalprice") > 400000.0) &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        !(col("o_orderkey") % 10 === 0) &&
        col("o_orderpriority").like("%H%") &&
        col("o_custkey").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  def projectExpr(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(
        col("o_orderkey"),
        outD(dec2(col("o_totalprice")) * 2).as("double_price"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
          .as("status_pri"),
        when(col("o_totalprice") > 250000.0, "big").otherwise("small")
          .as("size_band"),
        length(col("o_orderpriority")).as("pri_len"))
      .orderBy(col("o_orderkey"))

  def distinctSelect(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  // ---------------------------------------------------------------- C. joins

  def joinInnerEqui(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .join(customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), sum2(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_mktsegment"))

  def joinLeftOuter(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .join(orders(spark, sf), col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        outD(coalesce(sum(dec2(col("o_totalprice"))), lit(0))).as("sum_price"))
      .orderBy(col("c_custkey"))

  def joinRightOuter(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .join(customer(spark, sf), col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        outD(coalesce(sum(dec2(col("o_totalprice"))), lit(0))).as("sum_price"))
      .orderBy(col("c_custkey"))

  /** Odd/even per-customer order counts FULL OUTER rejoined — exercises
    * null-filling on both sides (customers present in only one half). */
  def joinFullOuter(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    val odd = o.where(col("o_orderkey") % 2 === 1)
      .groupBy(col("o_custkey").as("k1")).agg(count(lit(1)).as("n_odd"))
    val even = o.where(col("o_orderkey") % 2 === 0)
      .groupBy(col("o_custkey").as("k2")).agg(count(lit(1)).as("n_even"))
    odd.join(even, col("k1") === col("k2"), "full")
      .select(coalesce(col("k1"), col("k2")).as("custkey"), col("n_odd"),
        col("n_even"))
      .orderBy(col("custkey"))
  }

  def joinSemi(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .join(orders(spark, sf).where(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** NOT EXISTS as anti join: customers with no 'P'-status order (every
    * customer has *some* order in the fixtures, so the filterless variant
    * would be vacuously empty). */
  def joinAnti(spark: SparkSession, sf: String): DataFrame =
    customer(spark, sf)
      .join(orders(spark, sf).where(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Flagship (§7.1): 4-way star join lineitem⋈orders⋈customer⋈nation⋈region
    * with broadcast hints on the ≤25-row dims → decimal revenue by nation.
    * At 100 TB the fact tables shuffle on their join keys while the dims ship
    * to every executor once — the canonical star-schema plan. */
  def joinBroadcast(spark: SparkSession, sf: String): DataFrame = {
    val li = lineitem(spark, sf)
    val o  = orders(spark, sf)
    val c  = customer(spark, sf)
    val n  = nation(spark, sf)
    val r  = region(spark, sf)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .where(o("o_orderdate") >= ntz(1996, 1, 1) && o("o_orderdate") < ntz(1998, 1, 1))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Non-equi theta join: equi part keeps it hash-joinable, inequality stays
    * a residual filter (never a cartesian at scale). */
  /** NULL-SAFE equi join (`<=>` / IS NOT DISTINCT FROM): null keys MATCH
    * null keys instead of silently dropping — the semantics conforming
    * pipelines need when "unknown" is a real dimension value. Spark still
    * plans this as a hash/sort-merge equi join (EqualNullSafe is a
    * sargable join key, unlike an OR-of-IS-NULLs rewrite, which would
    * degrade to a nested loop). */
  def joinNullSafe(spark: SparkSession, sf: String): DataFrame = {
    val np = when(col("o_orderkey") % 7 === 0, lit(null))
      .otherwise(col("o_orderpriority"))
    val l = orders(spark, sf).select(np.as("np"))
    val d = l.distinct().select(col("np").as("p"),
      coalesce(col("np"), lit("NONE")).as("label"))
    l.join(d, col("np") <=> col("p"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"))
  }

  def joinThetaRange(spark: SparkSession, sf: String): DataFrame = {
    val li = lineitem(spark, sf)
    val p  = part(spark, sf)
    li.join(p, li("l_partkey") === p("p_partkey") &&
        li("l_extendedprice") > p("p_retailprice") * 25)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"), sum2(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("p_brand"))
  }

  def joinCross(spark: SparkSession, sf: String): DataFrame =
    region(spark, sf).crossJoin(nation(spark, sf))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))

  /** As-of join: for each purchase event, the latest strictly-earlier event
    * of the same user. Formulated as equi-join + window top-1 with a full
    * tie-break — identical semantics on both engines (SURVEY §2.C). At scale
    * the shuffle is by user_id; a range-bucketed sort-merge would avoid the
    * window materialization, noted as the 100 TB path. */
  def joinAsof(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val e = ev.select(col("event_id").as("e_event_id"),
      col("user_id").as("e_user"), col("ts").as("e_ts"),
      col("event_type").as("e_type"))
    val w = Window.partitionBy(col("p_event_id"))
      .orderBy(col("e_ts").desc, col("e_event_id").desc)
    p.join(e, col("p_user") === col("e_user") && col("e_ts") < col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("p_event_id"), col("p_user").as("user_id"),
        col("e_event_id").as("prior_event_id"), col("e_type").as("prior_type"),
        epochS(col("e_ts")).as("prior_epoch"))
      .orderBy(col("p_event_id"))
  }

  /** FORWARD as-of join — [[joinAsof]]'s mirror: the first event strictly
    * AFTER each purchase (per user). Backward as-of enriches with causes;
    * forward as-of builds labels ("what did the user do next") — the
    * feature/label-engineering pair. Same shape: equi key + range
    * residual hash join, rank-1 window, never a cartesian. */
  def joinAsofForward(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val e = ev.select(col("event_id").as("e_event_id"),
      col("user_id").as("e_user"), col("ts").as("e_ts"),
      col("event_type").as("e_type"))
    val w = Window.partitionBy(col("p_event_id"))
      .orderBy(col("e_ts").asc, col("e_event_id").asc)
    p.join(e, col("p_user") === col("e_user") && col("e_ts") > col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("p_event_id"), col("p_user").as("user_id"),
        col("e_event_id").as("next_event_id"), col("e_type").as("next_type"),
        epochS(col("e_ts")).as("next_epoch"))
      .orderBy(col("p_event_id"))
  }

  /** TOLERANCE as-of join (round 13 — the staleness-bounded variant every
    * feature-enrichment pipeline actually runs): the latest
    * strictly-earlier same-user event, but only if it is AT MOST ONE HOUR
    * old; a purchase with nothing fresh enough keeps NULL enrich columns
    * (LEFT semantics) instead of silently joining a stale row. Same
    * scale shape as [[joinAsof]] — equi key + range residual hash join,
    * rank-1 window — with the tolerance predicate tightening the join's
    * candidate set (at 100 TB the bound is also what keeps the per-key
    * match list small: only one hour of history per probe shuffles). */
  def joinAsofTolerance(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val e = ev.select(col("event_id").as("e_event_id"),
      col("user_id").as("e_user"), col("ts").as("e_ts"),
      col("event_type").as("e_type"))
    val w = Window.partitionBy(col("p_event_id"))
      .orderBy(col("e_ts").desc, col("e_event_id").desc)
    p.join(e, col("p_user") === col("e_user") && col("e_ts") < col("p_ts") &&
        col("e_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("p_event_id"), col("p_user").as("user_id"),
        col("e_event_id").as("prior_event_id"), col("e_type").as("prior_type"),
        epochS(col("e_ts")).as("prior_epoch"))
      .orderBy(col("p_event_id"))
  }

  /** Multiway STAR-SCHEMA join (the TPC-H Q5 shape): five tables chained
    * region→nation→customer→orders→lineitem plus a supplier edge back to
    * the customer's nation. The declarative form hands Catalyst the whole
    * join graph at once — the dims (region/nation/customer/supplier at
    * fixture ratios) broadcast, the two fact tables hash-join on
    * orderkey, and the optimizer is free to reorder — exactly the query a
    * hand-scheduled engine must plan carefully and a 100 TB Spark job
    * writes in six lines. Revenue stays DECIMAL-exact until the final
    * double cast ([[aggPricingSummary]] discipline). */
  def joinStarMultiway(spark: SparkSession, sf: String): DataFrame = {
    val one = lit(new java.math.BigDecimal("1.00"))
    val rev = dec(col("l_extendedprice"), 12, 2) *
      (one - dec(col("l_discount"), 4, 2))
    region(spark, sf)
      .join(nation(spark, sf), col("r_regionkey") === col("n_regionkey"))
      .join(customer(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(orders(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(lineitem(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(supplier(spark, sf), col("s_suppkey") === col("l_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("r_name"),
        year(col("o_orderdate").cast("date")).as("oyear"))
      .agg(count(lit(1)).as("n"), outD(sum(rev)).as("revenue"))
      .orderBy(col("r_name"), col("oyear"))
  }

  /** Interval-containment join: events of the same user within 24h of each
    * signup. Equi key + range residual → hash join, no cartesian. */
  def joinInterval(spark: SparkSession, sf: String): DataFrame = {
    val ev = events(spark, sf)
    val s = ev.where(col("event_type") === "signup")
      .select(col("event_id").as("s_event_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
    val e = ev.select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    s.join(e, col("s_user") === col("e_user") && col("e_ts") >= col("s_ts") &&
        col("e_ts") < col("s_ts") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("s_event_id"), col("s_user"))
      .agg(count(lit(1)).as("n_following"))
      .orderBy(col("s_event_id"))
  }

  // ---------------------------------------------------------- D. aggregation

  /** TPC-H-Q1-shaped pricing summary. All measures pre-cast to decimal so the
    * partial/final aggregation is exact and order-independent (rule D1);
    * averages are deliberately left as sum+count pairs. */
  def aggPricingSummary(spark: SparkSession, sf: String): DataFrame = {
    val one = lit(new java.math.BigDecimal("1.00"))
    lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        outD(sum(dec(col("l_quantity"), 12, 2))).as("sum_qty"),
        outD(sum(dec(col("l_extendedprice"), 12, 2))).as("sum_base"),
        // scale-6 decimal sums ROUND to 2 dp BEFORE the double cast
        // (round-18 sf1 gate): a scale-6 decimal near 5.2e10 converts to
        // double differently across engines (DuckDB divides an int128 by
        // 10^6 — two roundings; BigDecimal.doubleValue rounds once), a
        // 1-ulp drift invisible below ~1e10. A 2-dp decimal's conversion
        // is exact-integer/100 on both engines, hence identical.
        outD(round(sum(dec(col("l_extendedprice"), 12, 2) *
          (one - dec(col("l_discount"), 4, 2))), 2)).as("sum_disc_price"),
        outD(round(sum(dec(col("l_extendedprice"), 12, 2) *
          (one - dec(col("l_discount"), 4, 2)) *
          (one + dec(col("l_tax"), 4, 2))), 2)).as("sum_charge"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  def aggMultiStat(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(asDate(col("o_orderdate"))).as("min_date"),
        max(asDate(col("o_orderdate"))).as("max_date"))
      .orderBy(col("o_orderpriority"))

  def aggHaving(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum2(col("o_totalprice")).as("sum_price"))
      .where(col("n_orders") > 15)
      .orderBy(col("o_custkey"))

  /** Exact multi-column COUNT(DISTINCT) — Catalyst's expand+two-phase
    * rewrite; stays scalable because each distinct agg is shuffled on
    * (group key, value), never collected. */
  def aggDistinctExact(spark: SparkSession, sf: String): DataFrame =
    lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))

  /** GROUPING SETS through the SQL surface (Catalyst Expand). */
  def aggGroupingSets(spark: SparkSession, sf: String): DataFrame = {
    val base = orders(spark, sf)
      .join(customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, sf)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("o_totalprice"))
    val v = s"gs_base_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    base.createOrReplaceTempView(v)
    spark.sql(
      s"""SELECT CAST(grouping(n_name) AS INT) AS gn,
         |       CAST(grouping(c_mktsegment) AS INT) AS gm,
         |       COALESCE(n_name, 'ALL') AS nation_g,
         |       COALESCE(c_mktsegment, 'ALL') AS segment_g,
         |       count(*) AS n_orders,
         |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM $v
         |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
         |ORDER BY gn, gm, nation_g, segment_g""".stripMargin)
  }

  def aggRollup(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .join(customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, sf)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, sf)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("gr"),
        grouping(col("n_name")).cast("int").as("gn"),
        count(lit(1)).as("n_orders"),
        sum2(col("o_totalprice")).as("sum_price"))
      .select(col("gr"), col("gn"), coalesce(col("r_name"), lit("ALL")).as("region_g"),
        coalesce(col("n_name"), lit("ALL")).as("nation_g"), col("n_orders"),
        col("sum_price"))
      .orderBy(col("gr"), col("gn"), col("region_g"), col("nation_g"))

  def aggCube(spark: SparkSession, sf: String): DataFrame =
    lineitem(spark, sf)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("gf"),
        grouping(col("l_linestatus")).cast("int").as("gs"),
        count(lit(1)).as("n_rows"),
        sum2(col("l_quantity")).as("sum_qty"))
      .select(col("gf"), col("gs"), coalesce(col("l_returnflag"), lit("ALL")).as("flag_g"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status_g"), col("n_rows"),
        col("sum_qty"))
      .orderBy(col("gf"), col("gs"), col("flag_g"), col("status_g"))

  /** Exact discrete percentiles (p50/p90 of order price per priority) via
    * the explicit row_number formulation — engines disagree on native
    * percentile_disc index conventions, so the definition is spelled out
    * identically on both sides: value at row ceil(p·n) in (price, key)
    * order. One window pass, shuffle on the group key. */
  def aggPercentileDisc(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
      .withColumn("k50", expr("(n + 1) div 2"))
      .withColumn("k90", expr("(9 * n + 9) div 10"))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("rn") === col("k50"), col("o_totalprice"))).as("p50"),
        max(when(col("rn") === col("k90"), col("o_totalprice"))).as("p90"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Fixed-bin histogram: integer bin ids from floor(x/width) — the one-pass
    * distribution profile (IEEE-identical floor on both engines). */
  def aggHistFixed(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .groupBy(floor(col("o_totalprice") / 50000.0).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"), sum2(col("o_totalprice")).as("sum_price"))
      .orderBy(col("bin"))

  /** collect_set→sort_array→concat: grouping values into a deterministic
    * array/string — the only hash-safe way to emit collected groups (bare
    * collect_list order is partitioning-dependent). */
  def aggCollectSorted(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
          .as("statuses"),
        concat_ws(",", sort_array(collect_set(col("o_orderpriority"))))
          .as("priorities"))
      .orderBy(col("o_custkey"))

  /** Per-group mode (most frequent value) with a total tie-break — the
    * count+window-survivor formulation, one shuffle on the group key. */
  def aggMode(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
    orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderpriority").as("mode_priority"), col("cnt"))
      .orderBy(col("o_custkey"))
  }

  /** Approximate percentiles (GK/quantile-sketch family), ORACLE-CHECKED via
    * the sketch's own rank guarantee (the agg_hll_merge pattern): the approx
    * values are implementation-specific (D5) and never leave the plan; the
    * output carries the exact row count plus flags asserting
    * |rank(approx_pX) − X·n| ≤ 0.004·n + 1 (accuracy 1000 guarantees
    * 0.001·n; the slack covers ties and the ±1-rank discretization of
    * returning an actual element), which the oracle pins to 1 — a violated
    * bound now hash-mismatches instead of going untested. Flag arithmetic
    * is all integer, scaled ×1000. */
  def aggApproxPercentile(spark: SparkSession, sf: String): DataFrame = {
    val e = events(spark, sf)
    val appr = e.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("p50"),
        expr("approx_percentile(value, 0.9, 1000)").as("p90"))
    e.join(appr, "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") <= col("p50")).cast("long")).as("le50"),
        sum((col("value") <= col("p90")).cast("long")).as("le90"))
      .select(col("event_type"), col("n"),
        (abs(col("le50") * 1000 - col("n") * 500) <= col("n") * 4 + 1000)
          .cast("int").as("p50_rank_ok"),
        (abs(col("le90") * 1000 - col("n") * 900) <= col("n") * 4 + 1000)
          .cast("int").as("p90_rank_ok"))
      .orderBy(col("event_type"))
  }

  /** HLL++ approximate distinct, ORACLE-CHECKED via an error-bound flag
    * (same pattern as [[aggApproxPercentile]]): rsd 0.05 ⇒ the 2σ bound
    * |approx − exact| ≤ 10% · exact must hold, and the oracle pins the flag
    * to 1 alongside the exact count. */
  def aggApproxDistinct(spark: SparkSession, sf: String): DataFrame =
    events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("approx_users"),
        countDistinct(col("user_id")).as("n_exact"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("approx_users") - col("n_exact")) * 10 <= col("n_exact"))
          .cast("int").as("within_10pct"))
      .orderBy(col("event_type"))

  /** PER-GROUP OLS REGRESSION (stats family, round 18): slope and
    * intercept of l_extendedprice on l_quantity per return flag,
    * computed ENTIRELY in integer arithmetic. Both measures are scaled
    * to exact cents (decimal(12,2)·100 → integral), the five sufficient
    * statistics (n, Σx, Σy, Σxy, Σx²) accumulate as exact decimals in
    * ONE map-side-combinable shuffle (rule D1 — order-independent), and
    * slope/intercept come out of the closed form as ROUNDED integers:
    * sign·((|num|·10⁶ + den div 2) div den), all operands non-negative
    * so Spark's truncating `div` equals DuckDB's flooring `//`
    * (rule D3 — the same discipline as the geo and pagerank kernels;
    * a float regr_slope would drift by summation order on both
    * engines). The intercept reuses the ALREADY-ROUNDED slope_e6 so its
    * definition is exactly reproducible: icept = (Σy·10⁶ − slope_e6·Σx)
    * / (n·10⁶), in cents. Scale shape: a 5-statistic partial aggregate
    * is the canonical distributed-regression plan — no second pass, no
    * collect, merges associatively at any parallelism. */
  def statsLinregGroup(spark: SparkSession, sf: String): DataFrame = {
    val xc = (dec(col("l_quantity"), 12, 2) * 100).cast(DecimalType(20, 0))
    val yc = (dec(col("l_extendedprice"), 12, 2) * 100).cast(DecimalType(20, 0))
    lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(xc).as("sx"), sum(yc).as("sy"),
        sum(xc * yc).as("sxy"), sum(xc * xc).as("sxx"))
      .withColumn("num", expr("n_rows * sxy - sx * sy"))
      .withColumn("den", expr("n_rows * sxx - sx * sx"))
      .withColumn("slope_e6", expr(
        "IF(num < 0, -1L, 1L) * ((abs(num) * 1000000 + den div 2) div den)"))
      .withColumn("t", expr("sy * 1000000 - slope_e6 * sx"))
      .withColumn("icept_cents", expr(
        "IF(t < 0, -1L, 1L) * " +
          "((abs(t) + (n_rows * 1000000L) div 2) div (n_rows * 1000000L))"))
      .select(col("l_returnflag"), col("n_rows"), col("slope_e6"),
        col("icept_cents"))
      .orderBy(col("l_returnflag"))
  }

  // --------------------------------------------------- F. sort/limit/top-k

  /** Multi-key sort with explicit null placement + LIMIT → Spark plans
    * TakeOrderedAndProject (no full sort materialization at scale). */
  def sortMultiNulls(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderpriority"))
          .as("npri"),
        col("o_totalprice").as("price"))
      .orderBy(col("npri").asc_nulls_first, col("price").desc, col("o_orderkey").asc)
      .limit(100)

  def topkPerGroup(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice").as("price"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  def limitOffset(spark: SparkSession, sf: String): DataFrame =
    orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
      .offset(20).limit(10)

  // ------------------------------------------------------------ G. set ops

  def setUnionAll(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    o.where(col("o_orderkey") % 3 === 0)
      .unionByName(o.where(col("o_orderkey") % 2 === 0))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderstatus"))
  }

  def setUnionDistinct(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .union(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
      .distinct()
      .orderBy(col("o_custkey"))
  }

  def setIntersect(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  def setExcept(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .except(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** MULTISET difference (EXCEPT ALL): occurrence counts subtract instead
    * of collapsing — a customer with 3 'O' orders and 1 'F' order survives
    * twice. Spark plans both ALL variants as one aggregation over tagged
    * counts (no join), the same single-shuffle shape as the distinct
    * versions. */
  def setExceptAll(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .exceptAll(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** MULTISET intersection (INTERSECT ALL): min of the two occurrence
    * counts per value. */
  def setIntersectAll(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf)
    o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersectAll(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  // ---------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_project" -> scanProject,
    "scan_filter_pushdown" -> scanFilterPushdown,
    "sink_parquet_roundtrip" -> sinkParquetRoundtrip,
    "filter_compound" -> filterCompound,
    "project_expr" -> projectExpr,
    "distinct_select" -> distinctSelect,
    "join_inner_equi" -> joinInnerEqui,
    "join_left_outer" -> joinLeftOuter,
    "join_right_outer" -> joinRightOuter,
    "join_full_outer" -> joinFullOuter,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_broadcast" -> joinBroadcast,
    "join_theta_range" -> joinThetaRange,
    "join_null_safe" -> joinNullSafe,
    "join_cross" -> joinCross,
    "join_asof" -> joinAsof,
    "join_interval" -> joinInterval,
    "join_star_multiway" -> joinStarMultiway,
    "join_asof_forward" -> joinAsofForward,
    "join_asof_tolerance" -> joinAsofTolerance,
    "agg_pricing_summary" -> aggPricingSummary,
    "agg_multi_stat" -> aggMultiStat,
    "agg_having" -> aggHaving,
    "agg_distinct_exact" -> aggDistinctExact,
    "agg_hist_fixed" -> aggHistFixed,
    "agg_collect_sorted" -> aggCollectSorted,
    "agg_mode" -> aggMode,
    "agg_percentile_disc" -> aggPercentileDisc,
    "agg_grouping_sets" -> aggGroupingSets,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_approx_percentile" -> aggApproxPercentile,
    "stats_linreg_group" -> statsLinregGroup,
    "sort_multi_nulls" -> sortMultiNulls,
    "topk_per_group" -> topkPerGroup,
    "limit_offset" -> limitOffset,
    "set_union_all" -> setUnionAll,
    "set_union_distinct" -> setUnionDistinct,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_except_all" -> setExceptAll,
    "set_intersect_all" -> setIntersectAll
  )

  def oracle: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice, ship_date
        |LIMIT 100""".stripMargin,

    "scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "sink_parquet_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "filter_compound" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE (o_orderstatus = 'O' OR o_totalprice > 400000.0)
        |  AND o_orderpriority IN ('1-URGENT','2-HIGH')
        |  AND NOT (o_orderkey % 10 = 0)
        |  AND o_orderpriority LIKE '%H%'
        |  AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "project_expr" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price,
        |  o_orderstatus || '-' || o_orderpriority AS status_pri,
        |  CASE WHEN o_totalprice > 250000.0 THEN 'big' ELSE 'small' END AS size_band,
        |  CAST(length(o_orderpriority) AS INT) AS pri_len
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "distinct_select" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "join_inner_equi" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_price
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_right_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_price
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT COALESCE(k1, k2) AS custkey, n_odd, n_even
        |FROM (SELECT o_custkey AS k1, count(*) AS n_odd FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_custkey) a
        |FULL JOIN (SELECT o_custkey AS k2, count(*) AS n_even FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_custkey) b
        |ON k1 = k2
        |ORDER BY custkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "join_theta_range" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_extendedprice > p_retailprice * 25
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "join_null_safe" ->
      """WITH l AS (
        |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |              ELSE o_orderpriority END AS np FROM orders),
        |d AS (SELECT DISTINCT np AS p, coalesce(np, 'NONE') AS label FROM l)
        |SELECT label, CAST(count(*) AS BIGINT) AS n
        |FROM l JOIN d ON l.np IS NOT DISTINCT FROM d.p
        |GROUP BY label ORDER BY label""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "join_asof" ->
      """SELECT p_event_id, user_id, prior_event_id, prior_type, prior_epoch FROM (
        |  SELECT p.event_id AS p_event_id, p.user_id AS user_id,
        |         e.event_id AS prior_event_id, e.event_type AS prior_type,
        |         CAST(floor(epoch(e.ts)) AS BIGINT) AS prior_epoch,
        |         row_number() OVER (PARTITION BY p.event_id ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM events p JOIN events e ON p.user_id = e.user_id AND e.ts < p.ts
        |  WHERE p.event_type = 'purchase')
        |WHERE rn = 1 ORDER BY p_event_id""".stripMargin,

    "join_asof_tolerance" ->
      """SELECT p_event_id, user_id, prior_event_id, prior_type, prior_epoch FROM (
        |  SELECT p.event_id AS p_event_id, p.user_id AS user_id,
        |         e.event_id AS prior_event_id, e.event_type AS prior_type,
        |         CAST(floor(epoch(e.ts)) AS BIGINT) AS prior_epoch,
        |         row_number() OVER (PARTITION BY p.event_id ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM events p LEFT JOIN events e ON p.user_id = e.user_id
        |    AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 1 HOUR
        |  WHERE p.event_type = 'purchase')
        |WHERE rn = 1 ORDER BY p_event_id""".stripMargin,

    "join_asof_forward" ->
      """SELECT p_event_id, user_id, next_event_id, next_type, next_epoch FROM (
        |  SELECT p.event_id AS p_event_id, p.user_id AS user_id,
        |         e.event_id AS next_event_id, e.event_type AS next_type,
        |         CAST(floor(epoch(e.ts)) AS BIGINT) AS next_epoch,
        |         row_number() OVER (PARTITION BY p.event_id
        |                            ORDER BY e.ts ASC, e.event_id ASC) AS rn
        |  FROM events p JOIN events e ON p.user_id = e.user_id AND e.ts > p.ts
        |  WHERE p.event_type = 'purchase')
        |WHERE rn = 1 ORDER BY p_event_id""".stripMargin,

    "join_star_multiway" ->
      """SELECT r_name, CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS oyear,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |GROUP BY r_name, oyear ORDER BY r_name, oyear""".stripMargin,

    "join_interval" ->
      """SELECT s.event_id AS s_event_id, s.user_id AS s_user, count(*) AS n_following
        |FROM events s JOIN events e
        |  ON s.user_id = e.user_id AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 24 HOUR
        |WHERE s.event_type = 'signup'
        |GROUP BY s.event_id, s.user_id ORDER BY s_event_id""".stripMargin,

    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_multi_stat" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price,
        |  MIN(CAST(o_orderdate AS DATE)) AS min_date,
        |  MAX(CAST(o_orderdate AS DATE)) AS max_date
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_custkey HAVING count(*) > 15
        |ORDER BY o_custkey""".stripMargin,

    "agg_distinct_exact" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_hist_fixed" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS INT) AS bin, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY bin ORDER BY bin""".stripMargin,

    "agg_collect_sorted" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "agg_mode" ->
      """SELECT o_custkey, mode_priority, cnt FROM (
        |  SELECT o_custkey, o_orderpriority AS mode_priority, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
        |  FROM orders GROUP BY o_custkey, o_orderpriority)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "agg_percentile_disc" ->
      """SELECT o_orderpriority,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50,
        |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN o_totalprice END) AS p90,
        |  count(*) AS n_orders
        |FROM (
        |  SELECT o_orderpriority, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT CAST(GROUPING(n_name) AS INT) AS gn,
        |       CAST(GROUPING(c_mktsegment) AS INT) AS gm,
        |       COALESCE(n_name, 'ALL') AS nation_g,
        |       COALESCE(c_mktsegment, 'ALL') AS segment_g,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        |ORDER BY gn, gm, nation_g, segment_g""".stripMargin,

    "agg_rollup" ->
      """SELECT CAST(GROUPING(r_name) AS INT) AS gr, CAST(GROUPING(n_name) AS INT) AS gn,
        |       COALESCE(r_name, 'ALL') AS region_g, COALESCE(n_name, 'ALL') AS nation_g,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gr, gn, region_g, nation_g""".stripMargin,

    "agg_cube" ->
      """SELECT CAST(GROUPING(l_returnflag) AS INT) AS gf, CAST(GROUPING(l_linestatus) AS INT) AS gs,
        |       COALESCE(l_returnflag, 'ALL') AS flag_g, COALESCE(l_linestatus, 'ALL') AS status_g,
        |       count(*) AS n_rows,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gf, gs, flag_g, status_g""".stripMargin,

    // Sketch values never leave the plan (D5) — the outputs carry the
    // exact anchors + error-bound flags, which the oracle pins to 1.
    "agg_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  CAST(1 AS INT) AS within_10pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_approx_percentile" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(1 AS INT) AS p50_rank_ok, CAST(1 AS INT) AS p90_rank_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Integer OLS: HUGEINT sufficient statistics mirror Spark's exact
    // decimal sums; all divisions have non-negative operands so DuckDB's
    // flooring // equals Spark's truncating div (rule D3).
    "stats_linreg_group" ->
      """WITH s AS (
        |  SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS sx,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS sy,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS HUGEINT) *
        |        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS sxy,
        |    sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS HUGEINT) *
        |        CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS sxx
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (SELECT l_returnflag, n, sx, sy,
        |        n * sxy - sx * sy AS num, n * sxx - sx * sx AS den FROM s),
        |sl AS (SELECT *, (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
        |         ((abs(num) * 1000000 + den // 2) // den) AS slope_e6 FROM d),
        |ic AS (SELECT *, sy * 1000000 - slope_e6 * sx AS t FROM sl)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  CAST(slope_e6 AS BIGINT) AS slope_e6,
        |  CAST((CASE WHEN t < 0 THEN -1 ELSE 1 END) *
        |       ((abs(t) + (n * 1000000) // 2) // (n * 1000000)) AS BIGINT)
        |    AS icept_cents
        |FROM ic ORDER BY l_returnflag""".stripMargin,

    "sort_multi_nulls" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS npri,
        |  o_totalprice AS price
        |FROM orders
        |ORDER BY npri ASC NULLS FIRST, price DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice AS price,
        |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "limit_offset" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 10 OFFSET 20""".stripMargin,

    "set_union_all" ->
      """SELECT o_orderstatus, count(*) AS n_rows FROM (
        |  SELECT * FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderkey % 2 = 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "set_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "set_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "set_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin
  )
}
