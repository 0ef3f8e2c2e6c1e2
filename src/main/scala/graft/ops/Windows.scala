package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._
import graft.util.Determinism._

/** SURVEY.md §2.E — window functions. All six queries keep the window frame
  * semantics deterministic: ranking windows either order on a unique key
  * combination (D2) or compute functions that depend only on the order-key
  * values (rank/dense_rank over ties); fractional analytics leave the plan as
  * `floor(x*1e9+0.5)` BIGINTs so both engines evaluate the identical IEEE
  * expression tree (D3).
  *
  * Scale: every window partitions by a high-cardinality key (custkey /
  * user_id) except `window_ntile_pct`, which is a deliberate global-order
  * demonstration — at 100 TB that one becomes a range-partitioned sort
  * (Spark plans a single-partition window; the test suite documents it).
  */
object Windows {

  def windowRank(spark: SparkSession, sf: String): DataFrame = {
    val oyear = year(col("o_orderdate").cast("date"))
    val wTies = Window.partitionBy(col("o_custkey")).orderBy(oyear.desc)
    val wUniq = Window.partitionBy(col("o_custkey"))
      .orderBy(oyear.desc, col("o_orderkey").asc)
    orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), oyear.as("oyear"),
        rank().over(wTies).as("rnk"),
        dense_rank().over(wTies).as("drnk"),
        row_number().over(wUniq).as("rn"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def windowRunningSum(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def windowLagLead(spark: SparkSession, sf: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    val w = Window.partitionBy(col("o_custkey")).orderBy(d.asc, col("o_orderkey").asc)
    orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(d, lag(d, 1).over(w)).as("prev_gap"),
        datediff(lead(d, 1).over(w), d).as("next_gap"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Global-order analytics (single-partition window by design). Fractions
    * leave the plan as floor(x*1e9+0.5) BIGINT — IEEE-identical both sides. */
  def windowNtilePct(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.orderBy(col("p_retailprice").asc, col("p_partkey").asc)
    def e9(c: org.apache.spark.sql.Column) =
      floor(c * lit(1.0e9) + lit(0.5)).cast("long")
    part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice").as("price"),
        ntile(4).over(w).as("nt"),
        e9(percent_rank().over(w)).as("pr_e9"),
        e9(cume_dist().over(w)).as("cd_e9"))
      .orderBy(col("p_partkey"))
  }

  /** RANGE frame over integer epoch-days: same-customer orders within ±30
    * days of each order. */
  def windowRangeFrame(spark: SparkSession, sf: String): DataFrame = {
    val days = datediff(col("o_orderdate").cast("date"), lit("1990-01-01"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("days"))
      .rangeBetween(-30, 30)
    orders(spark, sf)
      .withColumn("days", days)
      .select(col("o_custkey"), col("o_orderkey"), col("days"),
        count(lit(1)).over(w).as("n_near"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** TIME-INTERVAL RANGE frame — the rolling-feature window every
    * interaction pipeline derives ("events by this user in the last
    * hour"): a true `RANGE BETWEEN INTERVAL 1 HOUR PRECEDING` over raw
    * timestamps, which the DataFrame API cannot express (rangeBetween
    * takes longs only) — this is the SQL-surface twin of
    * [[windowRangeFrame]]'s numeric frame. Range frames depend only on
    * ORDER-key VALUES, so tied timestamps cannot perturb the counts
    * (deterministic without a unique tie-break, unlike ROWS frames).
    * Integer cents inside the frame sum (D3). */
  def windowTimeRange(spark: SparkSession, sf: String): DataFrame = {
    events(spark, sf).createOrReplaceTempView("ev_time_range")
    spark.sql(
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS cents_1h
        |FROM ev_time_range
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  def windowFirstLast(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(spark, sf)
      .select(col("user_id"),
        first(col("event_type")).over(w).as("first_et"),
        last(col("event_type")).over(w).as("last_et"))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** GAPS-AND-ISLANDS: contiguous runs of daily user activity, the classic
    * retention/streak pattern (also the engagement-streak feature a
    * training-data pipeline derives from interaction logs). The
    * date-minus-row_number trick maps every run of consecutive active days
    * to one constant group key — two user-partitioned windows plus one
    * groupBy, all keyed by the high-cardinality user_id, so the plan is a
    * single hash-partition by user reused across all three steps at scale
    * (Catalyst collapses the exchanges; no global sort anywhere). */
  def windowGapsIslands(spark: SparkSession, sf: String): DataFrame = {
    val days = events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d").asc)
    val isl = days
      .withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("d")).as("start_d"), max(col("d")).as("end_d"),
        count(lit(1)).as("len_days"))
    val wi = Window.partitionBy(col("user_id")).orderBy(col("start_d").asc)
    isl.select(col("user_id"),
        row_number().over(wi).cast("int").as("island"),
        col("start_d"), col("end_d"), col("len_days"))
      .orderBy(col("user_id"), col("island"))
  }

  /** nth_value over the full partition frame — "the customer's 2nd/3rd
    * order ever" (onboarding-funnel features). Unique (date, key) ordering
    * makes every nth deterministic; NULL where the customer never got
    * that far. */
  def windowNthValue(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
        nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_nth_value" -> windowNthValue,
    "window_gaps_islands" -> windowGapsIslands,
    "window_time_range" -> windowTimeRange,
    "window_rank" -> windowRank,
    "window_running_sum" -> windowRunningSum,
    "window_lag_lead" -> windowLagLead,
    "window_ntile_pct" -> windowNtilePct,
    "window_range_frame" -> windowRangeFrame,
    "window_first_last" -> windowFirstLast
  )

  def oracle: Map[String, String] = Map(
    "window_nth_value" ->
      """SELECT o_custkey, o_orderkey,
        |  nth_value(o_orderkey, 2) OVER w AS second_key,
        |  nth_value(o_orderkey, 3) OVER w AS third_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_time_range" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "window_gaps_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |g AS (
        |  SELECT user_id, d,
        |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
        |             AS INT) AS grp
        |  FROM days),
        |isl AS (
        |  SELECT user_id, grp, min(d) AS start_d, max(d) AS end_d,
        |         count(*) AS len_days
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY start_d)
        |       AS INT) AS island,
        |  start_d, end_d, len_days
        |FROM isl ORDER BY user_id, island""".stripMargin,

    "window_rank" ->
      """SELECT o_custkey, o_orderkey, CAST(year(o_orderdate) AS INT) AS oyear,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC) AS INT) AS rnk,
        |  CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC) AS INT) AS drnk,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC, o_orderkey ASC) AS INT) AS rn
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(datediff('day', lag(CAST(o_orderdate AS DATE), 1) OVER w, CAST(o_orderdate AS DATE)) AS INT) AS prev_gap,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), lead(CAST(o_orderdate AS DATE), 1) OVER w) AS INT) AS next_gap
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_ntile_pct" ->
      """SELECT p_partkey, p_retailprice AS price,
        |  CAST(ntile(4) OVER w AS INT) AS nt,
        |  CAST(floor(percent_rank() OVER w * 1e9 + 0.5) AS BIGINT) AS pr_e9,
        |  CAST(floor(cume_dist() OVER w * 1e9 + 0.5) AS BIGINT) AS cd_e9
        |FROM part
        |WINDOW w AS (ORDER BY p_retailprice ASC, p_partkey ASC)
        |ORDER BY p_partkey""".stripMargin,

    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days,
        |  count(*) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |    RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING) AS n_near
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_first_last" ->
      """SELECT DISTINCT user_id,
        |  first_value(event_type) OVER w AS first_et,
        |  last_value(event_type) OVER w AS last_et
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin
  )
}
