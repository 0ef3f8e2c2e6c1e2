package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.Tables

/** SQL-surface operators: correlated subqueries (EXISTS / IN / scalar →
  * Catalyst's decorrelation rewrites), LATERAL joins, and recursive CTEs
  * (Spark 4 supports WITH RECURSIVE). Each query here is ONE SQL string
  * executed verbatim by both Spark and the DuckDB oracle — the strongest
  * cross-engine statement the harness can make: not merely equal results,
  * but the same declarative text.
  *
  * Scalar subqueries use MAX (exact on both engines), never AVG of doubles
  * (whose summation order is partitioning-dependent — rule D1).
  */
object Sql {

  private def run(spark: SparkSession, sf: String, sql: String): DataFrame = {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      Tables.table(spark, sf, t).createOrReplaceTempView(t)
    spark.sql(sql)
  }

  private val subqueriesSql =
    """SELECT o_orderkey, o_custkey
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o.o_orderkey AND l_quantity >= 45)
      |  AND o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'BUILDING')
      |  AND o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.5
      |ORDER BY o_orderkey""".stripMargin

  private val lateralSql =
    """SELECT c_custkey, t.o_orderkey, t.price
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice AS price
      |  FROM orders WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c_custkey, t.o_orderkey""".stripMargin

  private val recursiveSql =
    """WITH RECURSIVE m(mo) AS (
      |  SELECT 1 UNION ALL SELECT mo + 1 FROM m WHERE mo < 12)
      |SELECT mo,
      |  (SELECT count(*) FROM orders
      |   WHERE CAST(month(o_orderdate) AS INT) = mo) AS n_orders
      |FROM m ORDER BY mo""".stripMargin

  /** A real per-row TRAVERSAL (not a fixed-length series): every sampled
    * order key walks its decimal-ancestor chain (parent = ⌊key/10⌋ — a
    * deterministic tree over the key space) to the root, with per-row
    * divergent recursion depths — the hierarchy/BOM query shape. Integer
    * division is spelled CAST(floor(a / 10) AS BIGINT) because that is
    * the one form both engines parse AND evaluate identically. */
  private val recursiveHierSql =
    """WITH RECURSIVE chain(node, anc, depth) AS (
      |  SELECT o_orderkey, o_orderkey, 0 FROM orders WHERE o_orderkey % 97 = 0
      |  UNION ALL
      |  SELECT node, CAST(floor(anc / 10) AS BIGINT), depth + 1
      |  FROM chain WHERE anc > 0)
      |SELECT node, CAST(max(depth) AS INT) AS n_digits,
      |  CAST(sum(anc) AS BIGINT) AS anc_sum
      |FROM chain GROUP BY node ORDER BY node""".stripMargin

  /** SQL PIPE SYNTAX (round 17 — the Spark 4 operator-pipeline surface,
    * SPARK-49555): the query is authored as `FROM … |> WHERE … |>
    * AGGREGATE … |> ORDER BY`, the linear dataflow form. Spark-side
    * text only — the ORACLE is the equivalent classic SELECT (below),
    * proving the pipe form plans to the same answer. */
  private val pipeSql =
    """FROM orders
      ||> WHERE o_orderpriority = '1-URGENT'
      ||> AGGREGATE CAST(count(*) AS BIGINT) AS n,
      |     CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS price_sum
      |   GROUP BY o_orderstatus
      ||> ORDER BY o_orderstatus""".stripMargin

  private val pipeOracleSql =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS price_sum
      |FROM orders
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** GROUP BY ALL + ORDER BY ALL — one text, both engines (the
    * "aggregate by every non-aggregate output column" shorthand both
    * Spark 4 and DuckDB resolve identically). */
  private val groupByAllSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS price_sum
      |FROM orders
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  /** LATERAL COLUMN ALIAS — a SELECT item referencing an alias defined
    * earlier in the SAME select list; one text, both engines. */
  private val lateralAliasSql =
    """SELECT c_custkey,
      |  CAST(floor(c_acctbal) AS BIGINT) AS bal,
      |  bal * 2 AS bal2,
      |  bal2 - bal AS bal_again
      |FROM customer
      |WHERE c_custkey <= 500
      |ORDER BY c_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_subqueries" -> ((s, sf) => run(s, sf, subqueriesSql)),
    "sql_lateral_topk" -> ((s, sf) => run(s, sf, lateralSql)),
    "sql_recursive_series" -> ((s, sf) => run(s, sf, recursiveSql)),
    "sql_recursive_hierarchy" -> ((s, sf) => run(s, sf, recursiveHierSql)),
    "sql_pipe_syntax" -> ((s, sf) => run(s, sf, pipeSql)),
    "sql_group_by_all" -> ((s, sf) => run(s, sf, groupByAllSql)),
    "sql_lateral_alias" -> ((s, sf) => run(s, sf, lateralAliasSql))
  )

  def oracle: Map[String, String] = Map(
    "sql_subqueries" -> subqueriesSql,
    "sql_lateral_topk" -> lateralSql,
    "sql_recursive_series" -> recursiveSql,
    "sql_recursive_hierarchy" -> recursiveHierSql,
    "sql_pipe_syntax" -> pipeOracleSql,
    "sql_group_by_all" -> groupByAllSql,
    "sql_lateral_alias" -> lateralAliasSql
  )
}
