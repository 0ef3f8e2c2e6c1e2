package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale evidence for the full dedup composition (DECISIONS.md):
  * synthesizes a 50 000-doc corpus of 5 000 near-dup clusters (10
  * replicas each, one perturbed word per replica — deterministic md5
  * pseudo-words, no RNG), then runs the PUBLIC API path
  * `Graft.dedupClusters` (MinHash-LSH banding → exact verify →
  * star-contraction) end to end and reports pairs, components, component
  * sizes, and wall time. The exact all-pairs alternative at this scale is
  * 1.25×10⁹ comparisons — the round-2 measurement put it beyond 10 min;
  * the banded path is seconds.
  *
  *   sbt "runMain graft.tools.DedupScaleDemo [nBase] [nReplicas]"
  */
object DedupScaleDemo {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toInt else 5000
    val nRep = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nWords = 40
    // word i of doc (base b, replica r): perturbed at position r-1 (r>0)
    val docs = spark.range(nBase.toLong * nRep)
      .select(col("id").as("doc_id"),
        (col("id") % nBase).as("b"), (col("id") / nBase).cast("long").as("r"))
      .withColumn("text", concat_ws(" ",
        expr(s"""transform(sequence(0, ${nWords - 1}), i ->
                 |  CASE WHEN r > 0 AND i = (r - 1) % $nWords
                 |    THEN substring(md5(concat(b, ':', r, ':', i)), 1, 6)
                 |    ELSE substring(md5(concat(b, ':', i)), 1, 6) END)""".stripMargin)))
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    val clusters = graft.api.Graft.dedupClusters(docs, "doc_id", "text")
      .localCheckpoint()
    val nDocs = clusters.count()
    val nComp = clusters.select("component").distinct().count()
    val sizes = clusters.groupBy("comp_size").count()
      .orderBy(col("comp_size")).collect()
      .map(r => s"${r.getInt(0)}×${r.getLong(1)}").mkString(", ")
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[dedup-demo] corpus=${nBase * nRep}%d docs ($nBase%d clusters × $nRep%d replicas): " +
      f"clustered_docs=$nDocs%d components=$nComp%d sizes={$sizes} wall=$sec%.1fs " +
      s"(exact all-pairs would be ${(nBase.toLong * nRep) * (nBase.toLong * nRep - 1) / 2} comparisons)")
    // phase 2: duplicated-SPAN detection on the same corpus — replicas
    // differ by one word, so every replica pair shares long verbatim runs;
    // windows are md5-derived per cluster, so cross-cluster silence is the
    // correctness signal and Σ per-window |docs|² the cost driver.
    val t1 = System.nanoTime()
    val spans = graft.api.Graft.substringDupPairs(docs, "doc_id", "text")
      .localCheckpoint()
    val nPairs = spans.count()
    val crossCluster = spans
      .where(col("a_id") % nBase =!= col("b_id") % nBase).count()
    val sec1 = (System.nanoTime() - t1) / 1e9
    println(f"[substring-demo] span_pairs=$nPairs%d cross_cluster=$crossCluster%d " +
      f"wall=$sec1%.1fs")
    // phase 3: span-level SEGMENT dedup on the same corpus — each base's
    // replicas share all 10-word segments not touching the perturbed word,
    // so the expected duplicated-segment mass is ~(nRep−1)/nRep of the
    // corpus; one segment-keyed shuffle regardless of corpus size.
    val t2 = System.nanoTime()
    val segs = graft.api.Graft.segmentDedup(docs, "doc_id", "text")
      .agg(sum(col("n_seg")).as("n_seg"), sum(col("n_dup")).as("n_dup"))
      .collect()(0)
    val sec2 = (System.nanoTime() - t2) / 1e9
    val rate = segs.getAs[Long]("n_dup").toDouble / segs.getAs[Long]("n_seg")
    println(f"[segment-demo] segments=${segs.getAs[Long]("n_seg")}%d " +
      f"duplicated=${segs.getAs[Long]("n_dup")}%d (rate=$rate%.3f) wall=$sec2%.1fs")
    // phase 3b: the 100 TB variant — shuffle a 64-bit xxhash of the segment
    // instead of the raw string (the claim in Text.segmentDedupOf's doc).
    // Must find the identical duplicate mass (collisions only over-remove,
    // and at 2^64 none occur at this scale) while moving ~10× fewer bytes.
    val t3 = System.nanoTime()
    val ws = split(col("text"), " ")
    val hashed = docs
      .select(col("doc_id"), ws.as("ws"), size(ws).as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("ws"),
        explode(expr("sequence(0, cast(floor((n - 1) / 10) as int))")).as("k"))
      .select(col("doc_id"), col("k"),
        xxhash64(concat_ws(" ", slice(col("ws"), col("k") * 10 + 1, lit(10))))
          .as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("k"))
    val dupH = hashed
      .withColumn("kept", (row_number().over(w) === 1).cast("long"))
      .agg(sum(lit(1) - col("kept")).as("n_dup")).collect()(0).getAs[Long]("n_dup")
    val sec3 = (System.nanoTime() - t3) / 1e9
    println(f"[segment-demo-hashed] duplicated=$dupH%d wall=$sec3%.1fs " +
      s"(match=${dupH == segs.getAs[Long]("n_dup")})")
    spark.stop()
  }
}
