package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the round-3 star-contraction rewrite (DECISIONS.md):
  * connected components over a planted 1M-node CHAIN — the adversarial
  * diameter-bound case. One-hop min-label propagation (the round-2 loop)
  * needs `diameter` rounds (≈1M here, infeasible); alternating
  * large-star/small-star must close it in O(log n). Prints rounds + wall
  * seconds + correctness (single component labeled 0).
  *
  *   sbt "runMain graft.tools.CcScaleDemo [nNodes]"
  */
object CcScaleDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(n - 1).select(col("id").as("s"), (col("id") + 1).as("t"))
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.ops.Pipeline.starContract(edges, maxIter = 60)
    val distinctComps = labels.select("component").distinct().count()
    val nLabeled = labels.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[cc-demo] n=$n%d chain: rounds=$rounds%d wall=$sec%.1fs " +
      f"components=$distinctComps%d labeled=$nLabeled%d " +
      s"(one-hop propagation would need ${n - 1} rounds)")
    spark.stop()
  }
}
