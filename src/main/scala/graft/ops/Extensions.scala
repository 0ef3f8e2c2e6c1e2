package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Tables._
import graft.util.Determinism._

/** SURVEY.md §2.M — the explicit user-extension surfaces: a scalar Scala UDF
  * and a typed Aggregator UDAF. (The custom Catalyst Expression surface is
  * `expr_custom_catalyst` in ops/Vectors.scala; the Generator/UDTF surface
  * is `fn_explode`/`etl_unpivot`.)
  *
  * UDFs are a last resort by policy (they fence off codegen and pushdown) —
  * these two exist to prove the surface, with built-in-function oracles.
  */
object Extensions {

  /** Telecom-flavored MSISDN normalizer ([R1] domain): strip non-digits,
    * keep the last 9, left-pad to 11 with zeros. */
  private val normMsisdn: String => String = { s =>
    val d = s.replaceAll("[^0-9]", "")
    val t = if (d.length > 9) d.substring(d.length - 9) else d
    ("0" * (11 - t.length)) + t
  }

  def udfScalarMsisdn(spark: SparkSession, sf: String): DataFrame = {
    val f = udf(normMsisdn)
    spark.udf.register("norm_msisdn", f) // SQL-callable registration surface
    customer(spark, sf)
      .select(col("c_custkey"), f(col("c_name")).as("msisdn"))
      .orderBy(col("c_custkey"))
  }

  /** Typed Aggregator[IN,BUF,OUT] with an exact scala BigDecimal buffer:
    * quantity-weighted price sums per brand. Outputs numerator+denominator
    * (never a division — rule D1). */
  object WeightedSumAgg extends Aggregator[(BigDecimal, BigDecimal),
      (BigDecimal, BigDecimal), (BigDecimal, BigDecimal)] {
    def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    def reduce(b: (BigDecimal, BigDecimal), in: (BigDecimal, BigDecimal)):
        (BigDecimal, BigDecimal) =
      (b._1 + in._1 * in._2, b._2 + in._1)
    def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)):
        (BigDecimal, BigDecimal) = (x._1 + y._1, x._2 + y._2)
    def finish(b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) = b
    def bufferEncoder = ExpressionEncoder[(BigDecimal, BigDecimal)]()
    def outputEncoder = ExpressionEncoder[(BigDecimal, BigDecimal)]()
  }

  def aggUdafWeightedAvg(spark: SparkSession, sf: String): DataFrame = {
    val wsum = udaf(WeightedSumAgg, ExpressionEncoder[(BigDecimal, BigDecimal)]())
    lineitem(spark, sf)
      .join(part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(wsum(dec2(col("l_quantity")), dec2(col("l_extendedprice"))).as("w"),
        count(lit(1)).as("n_items"))
      .select(col("p_brand"),
        col("w._1").cast("double").as("wsum"),
        col("w._2").cast("double").as("wqty"),
        col("n_items"))
      .orderBy(col("p_brand"))
  }

  /** The whole-operator extension surface (ladder rung (c) after the
    * Expression rung `expr_custom_catalyst`): exact top-3 orders per
    * customer through the custom TopKPerKey LogicalPlan → Strategy →
    * physical exec (graft.plans.TopKPerKey). Same semantics as
    * `topk_per_group`'s row_number window — the oracle is that exact SQL
    * minus the rank column — but planned as a declared-property streaming
    * scan (PlanShapeSpec asserts TopKPerKeyExec + no Window in the plan).
    * `price` is double on both sides (DECIMAL output ban, parity.py:16). */
  def topkPerGroupExec(spark: SparkSession, sf: String): DataFrame = {
    val o = orders(spark, sf).select(col("o_custkey"), col("o_orderkey"),
      col("o_totalprice").as("price"))
    graft.api.Graft.topKPerKey(o, Seq("o_custkey"),
        Seq(("price", true), ("o_orderkey", false)), 3)
      .orderBy(col("o_custkey"), col("price").desc, col("o_orderkey"))
  }

  /** The TYPED Dataset surface: `groupByKey.mapGroups` with tuple
    * Encoders running genuinely imperative per-group logic — the longest
    * strictly-increasing consecutive price run per customer, something a
    * user would reach for the typed API to write. This is the documented
    * escape hatch BELOW declarative DataFrames and ABOVE raw
    * mapPartitions: one shuffle on the group key, then arbitrary Scala
    * per group; the oracle replays the same semantics as a window
    * break/run SQL, proving the imperative and declarative forms agree.
    * Sorting inside the group is on (date, orderkey) — unique, so the
    * imperative scan is deterministic. */
  def typedMapGroups(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("string").as("d"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .mapGroups { (cust, it) =>
        val rows = it.toArray.sortBy(r => (r._3, r._2))
        var run = 1; var best = 1
        for (i <- 1 until rows.length) {
          if (rows(i)._4 > rows(i - 1)._4) { run += 1; if (run > best) best = run }
          else run = 1
        }
        (cust, rows.length.toLong, best.toLong)
      }
      .toDF("o_custkey", "n_orders", "max_up_run")
      .orderBy(col("o_custkey"))
  }

  /** The typed COGROUP surface — two datasets merged per key with
    * arbitrary Scala ([[typedMapGroups]]'s two-sided sibling): purchases
    * and clicks of each user walked as two sorted sequences to find the
    * densest burst of clicks between consecutive purchases. The bucket
    * walk (advance the purchase pointer, count clicks per gap) is
    * genuinely imperative; the oracle reproduces it declaratively with a
    * correlated prior-purchase subquery, proving the two agree. Strict
    * `<` on microsecond timestamps on both sides (DuckDB TIMESTAMP is
    * micros; Spark's reader truncates the nanos column identically). */
  def typedCogroup(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    val base = events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
    def side(t: String) = base.where(col("event_type") === t)
      .select(col("user_id"), col("tsu")).as[(Long, Long)]
      .groupByKey(_._1)
    side("purchase").cogroup(side("click")) { (uid, pit, cit) =>
      val ps = pit.map(_._2).toArray.sorted
      val cs = cit.map(_._2).toArray.sorted
      val counts = new Array[Long](ps.length + 1)
      var pi = 0
      cs.foreach { ct =>
        while (pi < ps.length && ps(pi) < ct) pi += 1
        counts(pi) += 1
      }
      Iterator.single((uid, ps.length.toLong, cs.length.toLong, counts.max))
    }.toDF("user_id", "n_purchases", "n_clicks", "max_gap_clicks")
      .orderBy(col("user_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "typed_cogroup" -> typedCogroup,
    "typed_map_groups" -> typedMapGroups,
    "udf_scalar_msisdn" -> udfScalarMsisdn,
    "agg_udaf_weighted_avg" -> aggUdafWeightedAvg,
    "topk_per_group_exec" -> topkPerGroupExec
  )

  def oracle: Map[String, String] = Map(
    "typed_cogroup" ->
      """WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |b AS (SELECT c.user_id, c.event_id,
        |        (SELECT count(*) FROM p
        |         WHERE p.user_id = c.user_id AND p.ts < c.ts) AS bucket
        |      FROM c),
        |g AS (SELECT user_id, bucket, count(*) AS n FROM b GROUP BY user_id, bucket),
        |m AS (SELECT user_id, max(n) AS max_gap FROM g GROUP BY user_id),
        |u AS (SELECT user_id,
        |        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_purchases,
        |        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_clicks
        |      FROM events WHERE event_type IN ('purchase', 'click')
        |      GROUP BY user_id)
        |SELECT u.user_id, n_purchases, n_clicks,
        |  COALESCE(CAST(m.max_gap AS BIGINT), 0) AS max_gap_clicks
        |FROM u LEFT JOIN m USING (user_id) ORDER BY u.user_id""".stripMargin,

    "typed_map_groups" ->
      """WITH x AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(floor(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders),
        |m AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, cents,
        |    CASE WHEN lag(cents) OVER w IS NULL OR cents <= lag(cents) OVER w
        |         THEN 1 ELSE 0 END AS brk
        |  FROM x WINDOW w AS (PARTITION BY o_custkey
        |                      ORDER BY o_orderdate, o_orderkey)),
        |g AS (
        |  SELECT o_custkey,
        |    sum(brk) OVER (PARTITION BY o_custkey
        |                   ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM m),
        |r AS (SELECT o_custkey, grp, count(*) AS len
        |      FROM g GROUP BY o_custkey, grp)
        |SELECT o_custkey, CAST(sum(len) AS BIGINT) AS n_orders,
        |  CAST(max(len) AS BIGINT) AS max_up_run
        |FROM r GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "topk_per_group_exec" ->
      """SELECT o_custkey, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice AS price,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, price DESC, o_orderkey""".stripMargin,

    "udf_scalar_msisdn" ->
      """SELECT c_custkey,
        |  lpad(right(regexp_replace(c_name, '[^0-9]', '', 'g'), 9), 11, '0') AS msisdn
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "agg_udaf_weighted_avg" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS wsum,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wqty,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  )
}
