package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._
import graft.util.Determinism._

/** SURVEY.md §2 categories A–G: scans, filters, joins, aggregation, sort,
  * set ops. Spark-first: declarative DataFrame plans, Catalyst picks the
  * physical strategy; explicit `broadcast()` only on the tiny dimensions.
  *
  * The reference (/root/reference/README.md:1) is an AWS ETL pipeline with no
  * code in its tree; semantics here follow SURVEY.md §2's declared contract.
  */
object Relational {

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
      .where(o("o_orderdate") >= lit("1996-01-01") && o("o_orderdate") < lit("1998-01-01"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_broadcast" -> joinBroadcast
  )

  def oracle: Map[String, String] = Map(
    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin
  )
}
