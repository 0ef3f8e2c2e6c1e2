package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DEDUP-AT-SCALE measurement — the third leg of the scale-demo triad
  * (CcScaleDemo: contraction rounds; AnnScaleDemo: IVF recall/cost;
  * here: the flagship MinHash→LSH→verify→CC pipeline as corpus size
  * grows). The fixture corpus is replicated K× with per-replica id
  * offsets and a one-token text mutation (a replica is a NEAR-duplicate
  * of its original — changed tail bigram, identical elsewhere), so the
  * planted truth is known: every original should collapse into one
  * component of size K.
  *
  * What the numbers must show for the 100 TB claim to hold:
  *  - work tracks CANDIDATE MASS, not corpus² — the banded candidate
  *    count grows ~K² per original bucket (replicas share buckets; that
  *    is the candidates' job) while the all-pairs count grows (K·N)²;
  *    wall time must follow the former;
  *  - the verify+CC stages stay shuffle-bounded: no stage materializes
  *    anything all-pairs-shaped at any K.
  * Numbers recorded in DECISIONS.md.
  * Usage: runMain graft.tools.DedupScaleDemo [maxReplicas] [sfDir] */
object DedupScaleDemo {
  def main(args: Array[String]): Unit = {
    val maxR = args.headOption.map(_.toInt).getOrElse(10)
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
    def corpus(r: Int): DataFrame =
      (0 until r).map { k =>
        base.select((col("doc_id") + lit(k.toLong * 1000000000L)).as("doc_id"),
          col("lang"),
          // one-token tail mutation: replicas are near-dups, not clones
          concat(col("text"), lit(s" rep$k")).as("text"))
      }.reduce(_.unionByName(_))

    val nBase = base.count()
    for (r <- Seq(1, math.max(2, maxR / 2), maxR).distinct) {
      val c = corpus(r).localCheckpoint() // input cost out of the timing
      val t0 = System.nanoTime()
      val pairs = graft.api.Graft.minhashDedupPairs(c, "doc_id", "text")
        .where(col("is_dup") === 1)
        .select(col("doc_a").as("s"), col("doc_b").as("t"))
      val (labels, rounds) = graft.ops.Pipeline.starContract(pairs)
      val comps = labels.groupBy("component").count()
      val nComps = comps.count()
      val fullK = comps.where(col("count") >= r).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"replicas":$r,"docs":${nBase * r},"components":$nComps,""" +
        f""""components_ge_k":$fullK,"cc_rounds":$rounds,"sec":$sec%.1f}""")
    }
    spark.stop()
  }
}
