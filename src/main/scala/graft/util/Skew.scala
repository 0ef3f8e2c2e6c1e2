package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY §7.3 #6: "salting for skew").
  *
  * AQE's skew-join split handles sort-merge skew automatically in Spark 4,
  * but it cannot help when a single hot key must meet a non-broadcastable
  * right side. `saltedJoin` is the manual mitigation: replicate each right
  * row into `salts` copies tagged 0..salts-1, tag each left row with a
  * per-row salt, and join on (key, salt) — the hot key's rows spread over
  * `salts` shuffle partitions instead of one straggler task.
  *
  * The left salt is derived from a hash of the whole row (not rand()), so
  * the join result is exactly the plain inner equi-join's — only the
  * physical distribution changes. Correctness equivalence is asserted in
  * EngineSpec.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(struct(left.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
